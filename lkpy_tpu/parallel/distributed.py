"""
Multi-host runtime initialization.

The reference's multi-process coordination is Ray + ZMQ
(reference: src/lenskit/parallel/ray.py:65, logging/multiprocess/_monitor.py);
the TPU-native control plane is ``jax.distributed`` (gRPC coordinator) with
XLA collectives over ICI/DCN for data.  This module wraps initialization and
host-role helpers; on a single host it is a no-op.
"""

from __future__ import annotations

import os

import jax

from lkpy_tpu.logging import get_logger

_log = get_logger(__name__)

__all__ = [
    "init_distributed",
    "setup_log_relay",
    "is_coordinator",
    "host_count",
    "host_index",
    "local_device_count",
]

_initialized = False


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """
    Initialize the multi-host JAX runtime (idempotent).

    With no arguments, reads the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) or TPU pod metadata; on a single host
    with no coordinator configured, this is a no-op returning False.
    """
    global _initialized
    if _initialized:
        return True
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    # TPU_WORKER_HOSTNAMES is set even on a single host; only multi-worker
    # values (comma-separated) indicate a pod slice needing a coordinator.
    multi_worker = "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if addr is None and num_processes is None and not multi_worker:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=num_processes,
            process_id=process_id,
        )
        _initialized = True
        _log.info(
            "distributed runtime initialized",
            process=jax.process_index(),
            n_processes=jax.process_count(),
        )
        setup_log_relay()
        return True
    except (RuntimeError, ValueError) as e:
        _log.warning("distributed init failed; running single-host", error=str(e))
        return False


def setup_log_relay(address: str | None = None, key_hex: str | None = None) -> object | None:
    """
    Hook up the multi-host log relay (reference's ZMQ monitor role,
    src/lenskit/logging/multiprocess/_monitor.py:111): the coordinator binds
    the singleton :class:`~lkpy_tpu.logging.multiprocess.Monitor` on a TCP
    endpoint and worker hosts forward their log records to it, so a pod run
    has one consolidated log stream on host 0.

    Configured by ``LKT_LOG_RELAY=tcp://host:port`` + ``LKT_LOG_RELAY_KEY``
    (hex auth key, shared out-of-band — typically the job launcher exports
    both on every host).  No-op (returns None) when unconfigured or
    single-process.
    """
    address = address or os.environ.get("LKT_LOG_RELAY")
    key_hex = key_hex or os.environ.get("LKT_LOG_RELAY_KEY")
    if not address or not key_hex or jax.process_count() < 2:
        return None
    key = bytes.fromhex(key_hex)
    import lkpy_tpu.logging.multiprocess as mp

    if jax.process_index() == 0:
        with mp._monitor_lock:
            if mp._monitor is None:
                mp._monitor = mp.Monitor(address=address, auth_key=key)
        _log.info("log relay monitor bound", address=address)
        return mp._monitor
    ctx = mp.WorkerContext(address, key)
    ctx.install_handler()
    _log.info("log relay worker attached", address=address)
    return ctx


def is_coordinator() -> bool:
    """True on host 0 (log aggregation / checkpoint writer role)."""
    return jax.process_index() == 0


def host_count() -> int:
    return jax.process_count()


def host_index() -> int:
    return jax.process_index()


def local_device_count() -> int:
    return jax.local_device_count()
