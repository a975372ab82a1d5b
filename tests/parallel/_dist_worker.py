"""
Worker script for the two-process ``jax.distributed`` batch-inference test.

Launched by ``tests/parallel/test_two_process.py`` as 2 separate CPU
processes; each initializes the jax.distributed runtime against a shared
coordinator, recommends for its query shard, and the coordinator writes the
gathered merge for the parent test to check (reference analog: the Ray batch
path is tested by spinning a local cluster,
src/lenskit/testing/_components.py:325).
"""

import json
import os
import sys


def build_dataset():
    import numpy as np
    import pandas as pd

    from lkpy_tpu.data import from_interactions_df

    rng = np.random.default_rng(4242)
    n_users, n_items, n_draw = 120, 80, 3000
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, n_users, n_draw),
            "item_id": rng.integers(0, n_items, n_draw),
            "rating": rng.integers(1, 6, n_draw).astype(np.float32),
        }
    ).drop_duplicates(["user_id", "item_id"])
    return from_interactions_df(df)


def train_scorer(ds):
    from lkpy_tpu.models.als import ImplicitMFScorer
    from lkpy_tpu.training import TrainingOptions

    scorer = ImplicitMFScorer(ImplicitMFScorer.validate_config({"features": 8, "epochs": 2}))
    scorer.train(ds, TrainingOptions(rng=42))
    return scorer


def main():
    proc_id = int(sys.argv[1])
    n_proc = int(sys.argv[2])
    port = sys.argv[3]
    outdir = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=n_proc, process_id=proc_id
    )
    assert jax.process_count() == n_proc

    from lkpy_tpu.batch.distributed import distributed_recommend, local_query_shard
    from lkpy_tpu.parallel.mesh import MeshSpec, make_mesh

    ds = build_dataset()
    scorer = train_scorer(ds)
    matrix = ds.interaction_matrix()

    all_users = ds.users.ids
    local = local_query_shard(all_users)
    # the split must be a real partition: each process gets a non-empty,
    # non-overlapping contiguous shard
    assert 0 < len(local) < len(all_users)

    mesh = make_mesh(MeshSpec(data=2, model=1), devices=jax.local_devices()[:2])
    merged = distributed_recommend(scorer, all_users, 5, matrix, mesh=mesh)

    if jax.process_index() == 0:
        assert merged is not None
        out = {str(key[0]): [int(i) for i in il.ids()] for key, il in merged.items()}
        with open(os.path.join(outdir, "result.json"), "w") as f:
            json.dump(out, f)
    else:
        # the non-coordinator branch must return None (results shipped away)
        assert merged is None
        with open(os.path.join(outdir, f"worker{proc_id}.ok"), "w") as f:
            f.write("ok")


if __name__ == "__main__":
    main()
