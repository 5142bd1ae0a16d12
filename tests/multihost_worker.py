"""Worker process for the real 2-process multihost test.

Launched by tests/test_multihost.py as `python multihost_worker.py <pid>
<nproc> <coordinator> <outdir>`. Each process drives 4 virtual CPU
devices; the pair forms one 8-device global ('data',) mesh. Verifies the
pulpo_tpu.parallel.multihost contract end-to-end:

- jax.distributed.initialize over a local coordinator,
- shard_dataset_indices per-process rows (disjointness / tail-drop are
  asserted host-side by the test),
- local_to_global assembly of per-process batch rows,
- one data-parallel training step over the cross-process mesh (gloo CPU
  collectives), params dumped for equality vs a single-process run.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys

import numpy as np


def main() -> int:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    coord, outdir = sys.argv[3], pathlib.Path(sys.argv[4])

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from pulpo_tpu.parallel import multihost as mh

    assert mh.initialize(coord, nproc, pid) is True
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * nproc

    # deterministic per-process dataset rows (test asserts disjointness
    # and the documented drop of the n_items % global_batch tail)
    idx = mh.shard_dataset_indices(10, seed=3, epoch=1, global_batch=4)

    from pulpo_tpu.config import PULPoConfig
    from pulpo_tpu.models.api import PULPoModel
    from pulpo_tpu.parallel.dp import make_dp_train_step, replicate_state
    from pulpo_tpu.train.step import create_train_state

    gb = 8
    cfg = PULPoConfig(input_size=(8, 8, 8), total_levels=2, latent_levels=1,
                      n0=2, batch_size=gb, dataset="synthetic")
    mesh = mh.make_global_mesh(8)
    model = PULPoModel(cfg, bn_axis_name="data")
    state, tx = create_train_state(model, seed=0)
    state = replicate_state(state, mesh)
    step = make_dp_train_step(model, tx, mesh)

    # every process derives the same global batch, feeds only its rows
    rng = np.random.default_rng(7)
    gx = rng.random((gb, *cfg.input_size, 1), dtype=np.float32)
    gy = rng.random((gb, *cfg.input_size, 1), dtype=np.float32)
    rows = mh.process_shard(gb)
    batch = mh.local_to_global({"x": gx[rows], "y": gy[rows]}, mesh)
    assert batch["x"].shape[0] == gb  # global shape

    state, metrics = step(state, batch)
    leaf = jax.tree.leaves(state.params)[0]
    local = np.asarray(leaf.addressable_shards[0].data)

    np.savez(outdir / f"out_{pid}.npz", idx=np.asarray(idx), leaf=local)
    (outdir / f"done_{pid}.json").write_text(json.dumps({
        "total_loss": float(metrics["total_loss"]),
        "process_count": jax.process_count(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
