"""Training-step and loop tests on tiny synthetic volumes (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from pulpo_tpu.config import PULPoConfig
from pulpo_tpu.data.loader import DataLoader
from pulpo_tpu.data.synthetic import SyntheticDataset
from pulpo_tpu.models.api import PULPoModel
from pulpo_tpu.train.step import create_train_state, make_train_step


def tiny_cfg(**kw):
    base = dict(
        input_size=(12, 14, 16), total_levels=3, latent_levels=2, n0=2,
        dataset="synthetic", batch_size=2,
    )
    base.update(kw)
    return PULPoConfig(**base)


def make_batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "x": jnp.asarray(rng.random((cfg.batch_size, *cfg.input_size, 1), dtype=np.float32)),
        "y": jnp.asarray(rng.random((cfg.batch_size, *cfg.input_size, 1), dtype=np.float32)),
    }


def test_train_step_updates_params_and_decreases_loss():
    cfg = tiny_cfg()
    model = PULPoModel(cfg)
    state, tx = create_train_state(model, seed=0)
    step = jax.jit(make_train_step(model, tx))
    batch = make_batch(cfg)

    p0 = jax.tree.leaves(state.params)[0].copy()
    losses = []
    for _ in range(25):
        state, metrics = step(state, batch)
        losses.append(float(metrics["total_loss"]))
    assert not np.allclose(p0, jax.tree.leaves(state.params)[0])
    assert np.isfinite(losses).all()
    assert not bool(metrics["nan_flag"])
    # overfit a fixed pair: the loss must come down
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_nan_guard_fires():
    cfg = tiny_cfg()
    model = PULPoModel(cfg)
    state, tx = create_train_state(model, seed=0)
    step = jax.jit(make_train_step(model, tx))
    batch = make_batch(cfg)
    batch["x"] = batch["x"].at[0].set(jnp.nan)
    _, metrics = step(state, batch)
    assert bool(metrics["nan_flag"])


def test_nan_guard_freezes_state():
    """A NaN at step k must leave the dumped/live state equal to the
    state *entering* step k — no poisoned update is ever applied
    (DIVERGENCES.md #16; reference models.py:188-194 saves pre-update
    but still applies the NaN gradients)."""
    cfg = tiny_cfg()
    model = PULPoModel(cfg)
    state, tx = create_train_state(model, seed=0)
    step = jax.jit(make_train_step(model, tx))
    good = make_batch(cfg)
    bad = make_batch(cfg, seed=1)
    bad["x"] = bad["x"].at[0].set(jnp.nan)

    state, _ = step(state, good)  # step 1: clean
    params_entering = jax.device_get(state.params)
    opt_entering = jax.device_get(state.opt_state)

    state, metrics = step(state, bad)  # step 2: NaN
    assert bool(metrics["nan_flag"])
    for a, b in zip(jax.tree.leaves(params_entering),
                    jax.tree.leaves(jax.device_get(state.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(opt_entering),
                    jax.tree.leaves(jax.device_get(state.opt_state))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # step counter still advances (run identity), params do not
    assert int(state.step) == 2

    # the flag is a sticky on-device latch (train/step.py): clean steps
    # dispatched after the NaN are frozen no-ops, so the host may detect
    # the NaN asynchronously (train/loop.py) without a poisoned update
    # ever being applied
    state, metrics = step(state, good)
    assert bool(metrics["nan_flag"])
    for a, b in zip(jax.tree.leaves(params_entering),
                    jax.tree.leaves(jax.device_get(state.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_regularizer_jdet_runs():
    cfg = tiny_cfg(regularizer="jdet")
    model = PULPoModel(cfg)
    state, tx = create_train_state(model, seed=0)
    step = jax.jit(make_train_step(model, tx))
    _, metrics = step(state, make_batch(cfg))
    assert np.isfinite(float(metrics["total_loss"]))


def test_dice_recon_with_segs():
    cfg = tiny_cfg(recon_loss=("ncc", "dice"), segs=True)
    model = PULPoModel(cfg)
    state, tx = create_train_state(model, seed=0)
    step = jax.jit(make_train_step(model, tx))
    batch = make_batch(cfg)
    rng = np.random.default_rng(3)
    labels = rng.integers(0, 4, (cfg.batch_size, *cfg.input_size))
    onehot = np.eye(4, dtype=np.float32)[labels]
    batch["seg_x"] = jnp.asarray(onehot)
    batch["seg_y"] = jnp.asarray(onehot[:, ::-1].copy())
    _, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))


def test_trainer_fit_and_checkpoint(tmp_path):
    from pulpo_tpu.train.loop import Trainer
    from pulpo_tpu.train.checkpoint import CheckpointManager

    cfg = tiny_cfg(max_epochs=2, val_check_interval=0.5, log_every_n_steps=2,
                   image_logging_frequency=1)
    ds = SyntheticDataset(shape=cfg.input_size, n=4, seed=0)
    train_dl = DataLoader(ds, batch_size=2, shuffle=True, seed=0)
    val_dl = DataLoader(ds, batch_size=2, shuffle=False, seed=1)
    trainer = Trainer(cfg, run_dir=str(tmp_path), experiment="t")
    state = trainer.fit(train_dl, val_dl, max_steps=4)

    ckdir = trainer.run_dir / "checkpoints"
    assert (ckdir / "latest").exists()
    assert (ckdir / "best-total-loss").exists()

    # restore roundtrip
    restored = trainer.ckpt.restore(jax.device_get(state), name="latest")
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
    )
    # config roundtrip
    cfg2 = CheckpointManager.load_config(trainer.run_dir)
    assert cfg2 == cfg


def test_bf16_compute_dtype():
    cfg = tiny_cfg(compute_dtype="bfloat16")
    model = PULPoModel(cfg, dtype=jnp.bfloat16)
    state, tx = create_train_state(model, seed=0)
    step = jax.jit(make_train_step(model, tx))
    _, metrics = step(state, make_batch(cfg))
    assert np.isfinite(float(metrics["total_loss"]))
    # params stay f32
    assert jax.tree.leaves(state.params)[0].dtype == jnp.float32


def test_trainer_resume(tmp_path):
    from pulpo_tpu.train.loop import Trainer

    cfg = tiny_cfg(max_epochs=10, val_check_interval=1.0, log_every_n_steps=1)
    ds = SyntheticDataset(shape=cfg.input_size, n=4, seed=0)
    train_dl = DataLoader(ds, batch_size=2, shuffle=True, seed=0)
    val_dl = DataLoader(ds, batch_size=2, shuffle=False, seed=1)
    t1 = Trainer(cfg, run_dir=str(tmp_path), experiment="r")
    s1 = t1.fit(train_dl, val_dl, max_steps=2)

    t2 = Trainer(cfg, run_dir=str(tmp_path), experiment="r")
    # resume reads t1's run dir checkpoints
    t2.ckpt = t1.ckpt
    s2 = t2.fit(train_dl, val_dl, max_steps=4, resume=True)
    assert int(s2.step) == 4  # continued from step 2


def test_remat_train_step():
    cfg = tiny_cfg(remat=True)
    model = PULPoModel(cfg)
    state, tx = create_train_state(model, seed=0)
    step = jax.jit(make_train_step(model, tx))
    _, metrics = step(state, make_batch(cfg))
    assert np.isfinite(float(metrics["total_loss"]))


def test_remat_down_matches_baseline_grads():
    """remat_down recomputes the flagged DownPath block in the backward;
    params, loss AND gradients must be identical to the unrematted step
    (same ops, just re-executed). config.py remat_down."""
    from pulpo_tpu.train.step import compute_losses

    def grads(cfg):
        model = PULPoModel(cfg)
        state, _ = create_train_state(model, seed=0)
        batch = make_batch(cfg)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            outs, _ = model.apply_train(
                variables, batch["x"], batch["y"], jax.random.key(3))
            total, _ = compute_losses(
                cfg, outs, batch["x"], batch["y"], None, None)
            return total

        return jax.jit(jax.value_and_grad(loss_fn))(state.params)

    l0, g0 = grads(tiny_cfg())
    l1, g1 = grads(tiny_cfg(remat_down=(0, 1)))
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_config_remat_down_roundtrip():
    cfg = tiny_cfg(remat_down=[0])
    assert cfg.remat_down == (0,)
    from pulpo_tpu.config import PULPoConfig

    cfg2 = PULPoConfig.from_json(cfg.to_json())
    assert cfg2.remat_down == (0,)
