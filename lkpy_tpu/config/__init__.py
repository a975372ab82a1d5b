"""
Global configuration.

Capability parity with the reference config system
(reference: src/lenskit/config/__init__.py:55,79 ``lenskit_config`` /
``configure`` and src/lenskit/schemas/settings.py:218 ``LenskitSettings``):
layered settings from ``lkpy-tpu.toml`` + ``lkpy-tpu.local.toml`` + ``LKT_*``
environment variables + context-local overrides.  Implemented with plain
pydantic + tomllib (pydantic-settings is not in the image).
"""

from __future__ import annotations

import os
import tomllib
from contextlib import contextmanager
from contextvars import ContextVar
from pathlib import Path
from typing import Any, Literal

from pydantic import BaseModel, Field, model_validator

__all__ = [
    "Settings",
    "ParallelSettings",
    "MachineSettings",
    "CompileCacheSettings",
    "ServingSettings",
    "lkpy_tpu_config",
    "locate_configuration_root",
    "configure",
    "ensure_compile_cache",
    "EmbeddingSizeMixin",
]

CONFIG_FILES = ["lkpy-tpu.toml", "lkpy-tpu.local.toml"]
ENV_PREFIX = "LKT_"


class ParallelSettings(BaseModel):
    """Parallelism knobs (reference: schemas/settings.py:104 ``ParallelSettings``)."""

    processes: int | None = None
    threads: int | None = None
    backend_threads: int | None = None
    data_axis: int = -1
    "Mesh data-axis size (−1 = all remaining devices)."
    model_axis: int = 1
    "Mesh model-axis size (row-sharded tables)."


class MachineSettings(BaseModel):
    platform: Literal["tpu", "cpu", "default"] = "default"
    "JAX platform preference."


class PrometheusSettings(BaseModel):
    """Prometheus power scrape (reference: schemas/settings.py:68): queries
    return average Watts over the window; ``{elapsed}`` interpolates ms."""

    url: str | None = None
    power_queries: dict[str, str] = Field(default_factory=dict)


class CompileCacheSettings(BaseModel):
    """Persistent XLA compilation cache.

    TPU compiles are expensive (seconds to minutes per program, and the
    bench showed a 107 s cold start dominating a 1.6 s train); caching them
    on disk makes the *second* process start warm.  On by default for every
    entry point (library, CLI, bench) — the reference has no analog because
    its kernels are ahead-of-time compiled Rust.
    """

    enabled: bool = True
    dir: str | None = None
    "Cache directory; default ``~/.cache/lkpy_tpu/xla`` (or $LKT_CACHE_DIR)."
    min_compile_secs: float = 1.0
    "Only persist programs that took at least this long to compile."


class ServingSettings(BaseModel):
    """Batch-serving retrieval policy (``lkpy_tpu.batch.device``).

    The reference's batch recommend is always exact
    (reference: src/lenskit/batch/_runner.py:256); on TPU the hardware TopK
    (``lax.approx_max_k``, recall ≥ ~0.99) is substantially faster for large
    catalogs, so ``device_recommend(exact=None)`` switches to it at
    ``approx_min_items``.  Set ``approx_min_items`` very large (or
    ``exact = true``) to pin exact retrieval globally."""

    exact: bool | None = None
    "Force exact (true) or hardware-TopK (false) retrieval; null = auto."
    approx_min_items: int = 200_000
    "Catalog size at which auto mode switches to the hardware TopK."
    readback_precision: str = "auto"
    """Top-n readback encoding: ``"f16"`` returns float16 scores (+uint16
    indices for catalogs ≤ 65536 items) — 4 bytes per recommendation instead
    of 8, which halves the serving readback on remote (tunneled) devices at
    the cost of ~3 decimal digits of reported score precision (ranking order
    is unaffected; it is computed in f32 on device).  ``"f32"`` keeps exact
    scores; ``"auto"`` (default) uses f16 on TPU backends only."""


class TrainingPerfSettings(BaseModel):
    """Training-performance policy knobs (no reference analog — the
    reference's kernels are ahead-of-time-compiled Rust).

    ``ladder_ratio`` sets the bucket-width ladder for the ALS epoch
    programs: finer ladders pad less (each padded slot costs a factor-row
    gather, the epoch bottleneck) but compile/load more programs — the
    dominant cold-start cost on remote (tunneled) backends where each
    program load costs ~5 s.  Measured on the ML-20M bench shape
    (benchmarks/probe_ladder.py, v5e):

    =======  =========  =========  ==============  ==============
    ratio    programs   occupancy  cold load       throughput
    =======  =========  =========  ==============  ==============
    1.35     25         0.836      ~128 s          175 M ex/s
    2.0      13         0.734      ~63 s           152 M ex/s
    =======  =========  =========  ==============  ==============

    The default keeps steady-state throughput; set 2.0 (or larger) for
    interactive/cold-start-sensitive deployments."""

    ladder_ratio: float = 1.35


class Settings(BaseModel):
    """Root settings (reference: schemas/settings.py:218)."""

    random_seed: int | None = None
    parallel: ParallelSettings = Field(default_factory=ParallelSettings)
    machine: MachineSettings = Field(default_factory=MachineSettings)
    prometheus: PrometheusSettings = Field(default_factory=PrometheusSettings)
    compile_cache: CompileCacheSettings = Field(default_factory=CompileCacheSettings)
    serving: ServingSettings = Field(default_factory=ServingSettings)
    training_perf: TrainingPerfSettings = Field(default_factory=TrainingPerfSettings)
    data_dir: str | None = None


_loaded: Settings | None = None
_overrides: ContextVar[Settings | None] = ContextVar("lkt_config_overrides", default=None)


def _deep_merge(a: dict, b: dict) -> dict:
    out = dict(a)
    for k, v in b.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _env_overrides() -> dict:
    """Parse LKT_SECTION_FIELD=value env vars into nested dicts."""
    out: dict[str, Any] = {}
    fields = Settings.model_fields
    for key, val in os.environ.items():
        if not key.startswith(ENV_PREFIX):
            continue
        path = key[len(ENV_PREFIX):].lower()
        # try to match "section_field" to nested models
        parts = path.split("_")
        node = out
        # greedy: if first token names a nested model, nest
        if parts[0] in fields and len(parts) > 1 and isinstance(fields[parts[0]].default_factory, type):
            node = out.setdefault(parts[0], {})
            path = "_".join(parts[1:])
        try:
            parsed: Any = tomllib.loads(f"v = {val}")["v"]
        except tomllib.TOMLDecodeError:
            parsed = val
        node[path] = parsed
    return out


def locate_configuration_root(
    *,
    cwd: Path | str | None = None,
    abort_at_pyproject: bool = True,
    abort_at_gitroot: bool = True,
) -> Path | None:
    """Search upward from ``cwd`` for a directory containing an
    ``lkpy-tpu.toml`` (reference: config/__init__.py:200
    ``locate_configuration_root``).  The search stops — returning None — at
    the first directory holding a ``pyproject.toml`` or ``.git`` without a
    config file, so a project cannot accidentally inherit configuration
    from outside its own root."""
    cur = Path(cwd) if cwd is not None else Path.cwd()
    cur = cur.resolve()
    while True:
        # ANY config file anchors the root (load_config merges them all) —
        # a directory holding only the gitignored local-override file must
        # still be recognized (round-5 review)
        if any((cur / name).exists() for name in CONFIG_FILES):
            return cur
        if abort_at_pyproject and (cur / "pyproject.toml").exists():
            return None
        if abort_at_gitroot and (cur / ".git").exists():
            return None
        if cur.parent == cur:
            return None
        cur = cur.parent


def load_config(root: Path | str | None = None) -> Settings:
    data: dict = {}
    if root is None:
        root = locate_configuration_root() or Path.cwd()
    root = Path(root)
    for name in CONFIG_FILES:
        f = root / name
        if f.exists():
            with open(f, "rb") as fp:
                data = _deep_merge(data, tomllib.load(fp))
    data = _deep_merge(data, _env_overrides())
    return Settings.model_validate(data)


def lkpy_tpu_config() -> Settings:
    """The active configuration (reference: config/__init__.py:55)."""
    ov = _overrides.get()
    if ov is not None:
        return ov
    global _loaded
    if _loaded is None:
        _loaded = load_config()
    return _loaded


@contextmanager
def configure(**kwargs):
    """Context-local configuration overrides (reference: config/__init__.py:79)."""
    base = lkpy_tpu_config()
    merged = Settings.model_validate(_deep_merge(base.model_dump(), kwargs))
    token = _overrides.set(merged)
    try:
        yield merged
    finally:
        _overrides.reset(token)


_cache_dir_applied: str | None = None


def _cpu_primary_platform() -> bool:
    """True when CPU is the *primary* JAX platform (first in the list).

    ``JAX_PLATFORMS="tpu,cpu"`` keeps TPU primary — the cache must stay on
    for such runs (a bare substring test disabled it; ADVICE r3).  Checks
    the env var AND the jax config value (``jax.config.update``-style CPU
    forcing, e.g. the multichip dryrun, must not pollute the TPU cache with
    machine-feature-sensitive CPU AOT entries)."""
    plats = os.environ.get("JAX_PLATFORMS", "")
    if not plats:
        try:
            import jax

            plats = jax.config.values.get("jax_platforms") or ""
        except Exception:  # pragma: no cover
            plats = ""
    parts = [p.strip() for p in plats.lower().split(",") if p.strip()]
    return bool(parts) and parts[0] == "cpu"


def ensure_compile_cache() -> None:
    """Configure JAX's persistent compilation cache from settings.

    Idempotent and safe to call before or after other jax use; called
    automatically on ``import lkpy_tpu`` and re-checked on every call, so a
    later ``configure(compile_cache=...)`` override takes effect the next
    time a library entry point runs.  Set ``compile_cache.enabled = false``
    (or ``LKT_COMPILE_CACHE_ENABLED=false``) to opt out.
    """
    global _cache_dir_applied
    cc = lkpy_tpu_config().compile_cache
    if not cc.enabled:
        return
    # CPU compiles are fast and CPU AOT cache entries are machine-feature
    # sensitive (cross-machine loads warn about SIGILL risk); the cache
    # exists for the expensive TPU compiles, so skip runs where CPU is the
    # primary platform unless the user configured a cache dir themselves.
    if cc.dir is None and _cpu_primary_platform():
        return
    cache_dir = cc.dir or os.environ.get("LKT_CACHE_DIR")
    if cache_dir is None:
        cache_dir = str(Path.home() / ".cache" / "lkpy_tpu" / "xla")
    if cache_dir == _cache_dir_applied:
        return
    try:
        import jax

        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", cc.min_compile_secs)
        _cache_dir_applied = cache_dir
    except Exception:  # pragma: no cover - cache is best-effort
        pass


class EmbeddingSizeMixin:
    """Power-of-two embedding-size sugar (reference: config/common.py:16
    ``EmbeddingSizeMixin``): configs accept ``embedding_size_exp`` to set
    ``embedding_size = 2**exp`` for hyperparameter sweeps."""

    @model_validator(mode="before")
    @classmethod
    def _apply_embedding_exp(cls, data):
        if isinstance(data, dict) and "embedding_size_exp" in data:
            data = dict(data)
            exp = data.pop("embedding_size_exp")
            data.setdefault("embedding_size", 2 ** int(exp))
        return data
