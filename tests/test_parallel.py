"""Data-parallel tests on the 8-virtual-CPU-device mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pulpo_tpu.config import PULPoConfig
from pulpo_tpu.models.api import PULPoModel
from pulpo_tpu.parallel.dp import make_dp_train_step, replicate_state
from pulpo_tpu.parallel.mesh import make_mesh, shard_batch_spec
from pulpo_tpu.train.step import create_train_state

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def _setup(n=8):
    cfg = PULPoConfig(input_size=(12, 14, 16), total_levels=3, latent_levels=2,
                      n0=2, batch_size=n, dataset="synthetic")
    mesh = make_mesh(n)
    model = PULPoModel(cfg, bn_axis_name="data")
    state, tx = create_train_state(model, seed=0)
    state = replicate_state(state, mesh)
    step = make_dp_train_step(model, tx, mesh)
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.random((n, *cfg.input_size, 1), dtype=np.float32)),
        "y": jnp.asarray(rng.random((n, *cfg.input_size, 1), dtype=np.float32)),
    }
    batch = jax.device_put(batch, shard_batch_spec(mesh))
    return cfg, mesh, model, state, step, batch


def test_dp_step_runs_and_replicates():
    cfg, mesh, model, state, step, batch = _setup()
    p0 = np.asarray(jax.tree.leaves(state.params)[0])
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))
    p1 = jax.tree.leaves(state.params)[0]
    assert not np.allclose(p0, np.asarray(p1))
    # params must be replicated (identical) across all devices
    assert p1.sharding.is_fully_replicated
    shards = [np.asarray(s.data) for s in p1.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_dp_two_steps_loss_changes():
    cfg, mesh, model, state, step, batch = _setup()
    state, m1 = step(state, batch)
    state, m2 = step(state, batch)
    assert float(m1["total_loss"]) != float(m2["total_loss"])
    # batch_stats stay replicated (synced BN)
    bs_leaf = jax.tree.leaves(state.batch_stats)[0]
    shards = [np.asarray(s.data) for s in bs_leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_trainer_dp_fit(tmp_path):
    """Trainer wires the data mesh end-to-end (8 virtual CPU devices)."""
    from pulpo_tpu.config import PULPoConfig
    from pulpo_tpu.data.loader import DataLoader
    from pulpo_tpu.data.synthetic import SyntheticDataset
    from pulpo_tpu.train.loop import Trainer

    cfg = PULPoConfig(input_size=(12, 14, 16), total_levels=3, latent_levels=2,
                      n0=2, batch_size=8, dataset="synthetic", data_parallel=8,
                      max_epochs=3, val_check_interval=1.0)
    ds = SyntheticDataset(shape=cfg.input_size, n=8, seed=0)
    train_dl = DataLoader(ds, batch_size=8, shuffle=True, seed=0)
    val_dl = DataLoader(ds, batch_size=8, shuffle=False, seed=1)
    trainer = Trainer(cfg, run_dir=str(tmp_path), experiment="dp")
    state = trainer.fit(train_dl, val_dl, max_steps=2)
    assert int(state.step) == 2


def test_per_replica_rng_independence():
    """Each DP replica must draw decorrelated posterior samples
    (fold_in on axis_index)."""
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(8)
    try:
        shard_map = jax.shard_map
    except AttributeError:
        from jax.experimental.shard_map import shard_map

    def f(key):
        sub = jax.random.fold_in(key[0], jax.lax.axis_index("data"))
        return jax.random.normal(sub, (1, 4))

    g = shard_map(f, mesh=mesh, in_specs=(P(),), out_specs=P("data"))
    out = np.asarray(g(jnp.stack([jax.random.key(0)])))
    assert out.shape == (8, 4)
    # all replicas distinct
    for i in range(8):
        for j in range(i + 1, 8):
            assert not np.allclose(out[i], out[j])


def test_checkpoint_under_sharding(tmp_path):
    """Save/restore a replicated sharded train state."""
    from pulpo_tpu.train.checkpoint import CheckpointManager

    cfg = PULPoConfig(input_size=(12, 14, 16), total_levels=3, latent_levels=2,
                      n0=2, batch_size=8, dataset="synthetic")
    mesh = make_mesh(8)
    model = PULPoModel(cfg, bn_axis_name="data")
    state, tx = create_train_state(model, seed=0)
    state = replicate_state(state, mesh)
    ckpt = CheckpointManager(tmp_path, cfg)
    ckpt.save_latest(state, step=0)
    restored = ckpt.restore(jax.device_get(state), name="latest")
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]))


def test_spatial_train_step_matches():
    """Gradient equality: one TRAINING step on the (data=2, space=4)
    mesh == the unsharded step (same state, batch, rng)."""
    from pulpo_tpu.parallel.spatial import (
        make_2d_mesh, make_spatial_train_step, replicated, volume_batch_spec)
    from pulpo_tpu.train.step import make_train_step

    import optax

    cfg = PULPoConfig(input_size=(16, 14, 16), total_levels=3, latent_levels=2,
                      n0=2, batch_size=2, dataset="synthetic")
    model = PULPoModel(cfg)
    state, _ = create_train_state(model, seed=0)
    # SGD isolates the gradient comparison: Adam's first step is
    # lr*sign(g), which amplifies reduction-order noise on near-zero
    # gradient elements into full-size update differences
    tx = optax.sgd(0.1)
    state = state.replace(opt_state=tx.init(state.params))
    rng = np.random.default_rng(1)
    batch = {
        "x": jnp.asarray(rng.random((2, *cfg.input_size, 1), dtype=np.float32)),
        "y": jnp.asarray(rng.random((2, *cfg.input_size, 1), dtype=np.float32)),
    }

    ref_step = jax.jit(make_train_step(model, tx))
    ref_state, ref_metrics = ref_step(state, batch)

    mesh = make_2d_mesh(data=2, space=4)
    state2, _ = create_train_state(model, seed=0)
    state2 = state2.replace(opt_state=tx.init(state2.params))
    state2 = jax.device_put(state2, replicated(mesh))
    sbatch = jax.device_put(batch, volume_batch_spec(mesh))
    step = make_spatial_train_step(model, tx, mesh)
    new_state, metrics = step(state2, sbatch)

    np.testing.assert_allclose(float(metrics["total_loss"]),
                               float(ref_metrics["total_loss"]),
                               rtol=1e-5, atol=1e-6)
    # params moved by -0.1*grad: equality here IS gradient equality
    for a, b in zip(jax.tree.leaves(new_state.params),
                    jax.tree.leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-5)


def test_multihost_helpers_single_process():
    """Multi-host scaffolding degenerates correctly at process_count=1
    and produces globally-sharded arrays on the mesh."""
    from jax.sharding import PartitionSpec as P

    from pulpo_tpu.parallel import multihost as mh

    assert mh.initialize() is False  # no coordinator -> single-host no-op
    mesh = mh.make_global_mesh(8)
    assert mesh.devices.shape == (8,)

    assert mh.process_shard(8) == slice(0, 8)

    idx_a = mh.shard_dataset_indices(32, seed=0, epoch=3, global_batch=8)
    idx_b = mh.shard_dataset_indices(32, seed=0, epoch=3, global_batch=8)
    np.testing.assert_array_equal(idx_a, idx_b)  # deterministic
    assert idx_a.shape == (4, 8)
    assert len(np.unique(idx_a)) == 32  # a permutation, no duplicates

    local = {"x": np.arange(8 * 3, dtype=np.float32).reshape(8, 3)}
    global_batch = mh.local_to_global(local, mesh, P("data"))
    assert global_batch["x"].shape == (8, 3)
    np.testing.assert_array_equal(np.asarray(global_batch["x"]), local["x"])


def test_ingest_golden():
    """On-device ingest == the offline converter normalization."""
    from pulpo_tpu.data.convert import _brats_normalize
    from pulpo_tpu.data.ingest import ingest, znorm_clip_minmax

    rng = np.random.default_rng(2)
    vol = (rng.standard_normal((10, 12, 14)) * 50 + 100).astype(np.float32)
    ref = _brats_normalize(vol)
    got = np.asarray(znorm_clip_minmax(jnp.asarray(vol)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    # batched path: per-volume statistics
    batch = np.stack([vol, vol * 2 + 7])[..., None]
    got_b = np.asarray(ingest(batch, normalize="znorm"))
    np.testing.assert_allclose(got_b[0, ..., 0], ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got_b[1, ..., 0],
                               _brats_normalize(vol * 2 + 7),
                               rtol=1e-5, atol=1e-6)

    # resample stage: target shape honored, values in [0, 1]
    got_r = np.asarray(ingest(batch, target=(8, 8, 8)))
    assert got_r.shape == (2, 8, 8, 8, 1)
    assert got_r.min() >= 0.0 and got_r.max() <= 1.0


def test_spatial_sharding_matches_unsharded():
    """Depth-sharded forward (XLA halo exchange) == single-device forward."""
    from pulpo_tpu.parallel.spatial import (
        make_2d_mesh, make_spatial_forward, volume_batch_spec, replicated)

    cfg = PULPoConfig(input_size=(16, 14, 16), total_levels=3, latent_levels=2,
                      n0=2, dataset="synthetic")
    model = PULPoModel(cfg)
    variables = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, *cfg.input_size, 1), dtype=np.float32))
    y = jnp.asarray(rng.random((2, *cfg.input_size, 1), dtype=np.float32))

    ref_df, ref_out = jax.jit(
        lambda v, a, b: (
            model.module.apply(v, a, b, deterministic=True, train=False)[6][0],
            model.module.apply(v, a, b, deterministic=True, train=False)[7][0],
        ))(variables, x, y)

    mesh = make_2d_mesh(data=2, space=4)
    fwd = make_spatial_forward(model, mesh)
    xs = jax.device_put(x, volume_batch_spec(mesh))
    ys = jax.device_put(y, volume_batch_spec(mesh))
    vs = jax.device_put(variables, replicated(mesh))
    df, out = fwd(vs, xs, ys, jax.random.key(1))

    np.testing.assert_allclose(np.asarray(df), np.asarray(ref_df),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-4, atol=1e-5)


def test_multihost_two_process(tmp_path):
    """REAL 2-process multihost run (VERDICT r2 missing #5): spawn two
    processes that jax.distributed.initialize against a local
    coordinator with 4 virtual CPU devices each, and assert
    (a) shard_dataset_indices is cross-process disjoint and covers
        exactly the tail-truncated permutation (37 items, batch 8:
        32 kept, 5 dropped),
    (b) a DP gradient over the globally-sharded batch equals the
        single-process full-batch gradient on both processes."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = os.path.join(root, "tests", "multihost_child.py")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")

    procs = [subprocess.Popen(
        [sys.executable, child, str(pid), coord, str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {pid} failed:\n{out}"

    idx0 = np.load(tmp_path / "idx0.npy")
    idx1 = np.load(tmp_path / "idx1.npy")
    # per-process shape: 4 global batches x 4 local rows
    assert idx0.shape == idx1.shape == (4, 4)
    flat0, flat1 = idx0.ravel(), idx1.ravel()
    assert not set(flat0) & set(flat1)  # disjoint across processes
    union = np.concatenate([flat0, flat1])
    assert len(np.unique(union)) == 32  # no duplicates anywhere
    # exactly the first 32 entries of the shared permutation (tail of 5
    # dropped), interleaved as contiguous per-batch slices
    rng = np.random.default_rng((11, 2))
    perm = rng.permutation(37)[:32].reshape(4, 8)
    np.testing.assert_array_equal(idx0, perm[:, :4])
    np.testing.assert_array_equal(idx1, perm[:, 4:])

    # DP gradient equality vs the single-process numpy reference
    rng = np.random.default_rng(5)
    full_x = rng.standard_normal((8, 3)).astype(np.float32)
    full_y = rng.standard_normal((8,)).astype(np.float32)
    w = np.linspace(-1.0, 1.0, 3, dtype=np.float32)
    resid = full_x @ w - full_y
    ref_grad = 2.0 * full_x.T @ resid / 8.0
    ref_loss = float(np.mean(resid ** 2))
    for pid in (0, 1):
        g = np.load(tmp_path / f"grad{pid}.npy")
        np.testing.assert_allclose(g, ref_grad, rtol=1e-5, atol=1e-6)
        val = float((tmp_path / f"loss{pid}.txt").read_text())
        np.testing.assert_allclose(val, ref_loss, rtol=1e-5)


def test_param_sharding_rules_forward_matches_replicated():
    """TP hook (parallel/tp.py): a forward with conv kernels sharded
    over a 2-device `model` axis matches the replicated forward."""
    from pulpo_tpu.parallel.tp import (make_model_mesh,
                                       param_sharding_rules, shard_params)

    cfg = PULPoConfig(input_size=(12, 14, 16), total_levels=3,
                      latent_levels=2, n0=4, batch_size=1,
                      dataset="synthetic")
    model = PULPoModel(cfg)
    variables = model.init(jax.random.key(0))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, *cfg.input_size, 1), dtype=np.float32))
    y = jnp.asarray(rng.random((1, *cfg.input_size, 1), dtype=np.float32))

    ref = model.predict_deterministic(variables, x, y)

    mesh = make_model_mesh(2)
    rules = param_sharding_rules(variables, mesh)
    # the rules must actually shard something (n0=4 conv kernels have
    # cout >= 4 = 2 * axis size) and replicate the odd (ndims=3) heads
    specs = jax.tree.leaves(jax.tree.map(lambda s: s.spec, rules,
                                         is_leaf=lambda s: hasattr(s, "spec")))
    assert any(sp != jax.sharding.PartitionSpec() for sp in specs)
    sharded = shard_params(variables, mesh)
    # NamedSharding inputs carry the mesh: jit partitions the convs and
    # inserts the collectives without any model-code change (the hook's
    # whole contract)
    got = model.predict_deterministic(sharded, x, y)

    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-5, atol=2e-5)
