"""Model-level tests: shapes, determinism, df-composition consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pulpo_tpu.config import PULPoConfig
from pulpo_tpu.models.api import PULPoModel


def tiny_cfg(**kw):
    base = dict(
        input_size=(12, 14, 16), total_levels=3, latent_levels=2, n0=2,
        dataset="synthetic",
    )
    base.update(kw)
    return PULPoConfig(**base)


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = tiny_cfg()
    model = PULPoModel(cfg)
    variables = model.init(jax.random.key(0))
    return model, variables


def _pair(cfg, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.random((1, *cfg.input_size, 1), dtype=np.float32)
    y = rng.random((1, *cfg.input_size, 1), dtype=np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def test_output_shapes(model_and_vars):
    model, variables = model_and_vars
    cfg = model.cfg
    x, y = _pair(cfg)
    outs = model.apply_eval(variables, x, y, rng=jax.random.key(1))
    mus, sigmas, samples, vf, ind, comb, final, transformed = outs
    for l in range(cfg.latent_levels):
        lvl = cfg.level_sizes[l]
        assert mus[l].shape == (1, *lvl, cfg.zdim)
        assert sigmas[l].shape == (1, *lvl, cfg.zdim)
        assert ind[l].shape == (1, *lvl, cfg.ndims)
        assert final[l].shape == (1, *cfg.df_size(l), cfg.ndims)
        assert transformed[l].shape == (1, *cfg.df_size(l), 1)
        assert bool(jnp.all(sigmas[l] > 0))  # softplus head


def test_deterministic_mode_reproducible(model_and_vars):
    model, variables = model_and_vars
    x, y = _pair(model.cfg)
    o1, d1 = model.predict_deterministic(variables, x, y)
    o2, d2 = model.predict_deterministic(variables, x, y)
    for l in o1:
        np.testing.assert_array_equal(np.asarray(o1[l]), np.asarray(o2[l]))


def test_stochastic_draws_differ(model_and_vars):
    model, variables = model_and_vars
    x, y = _pair(model.cfg)
    a = model.forward(variables, x, y, jax.random.key(1))
    b = model.forward(variables, x, y, jax.random.key(2))
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_combine_dfs_matches_internal_composition(model_and_vars):
    """Standalone combine_dfs (models.py:349-368) must reproduce the
    decoder-internal combined/final dfs for the same individual dfs."""
    model, variables = model_and_vars
    x, y = _pair(model.cfg)
    outs = model.apply_eval(variables, x, y, deterministic=True)
    _, _, _, _, ind, comb, final, _ = outs
    comb2, final2 = model.combine_dfs(ind)
    for l in ind:
        np.testing.assert_allclose(
            np.asarray(comb2[l]), np.asarray(comb[l]), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(final2[l]), np.asarray(final[l]), rtol=1e-5, atol=1e-6)


def test_predict_sample_axes(model_and_vars):
    model, variables = model_and_vars
    cfg = model.cfg
    x, y = _pair(cfg)
    outs, dfs = model.predict_output_samples(variables, x, y, 3, jax.random.key(5))
    assert outs[0].shape == (1, 3, *cfg.df_size(0), 1)
    assert dfs[0].shape == (1, 3, *cfg.level_sizes[0], cfg.ndims)


@pytest.mark.parametrize("feedback", [
    ("samples",), ("transformed",), ("velocity_fields", "final_dfs"),
])
def test_feedback_variants_run(feedback):
    cfg = tiny_cfg(feedback=feedback)
    model = PULPoModel(cfg)
    variables = model.init(jax.random.key(0))
    x, y = _pair(cfg)
    out = model.forward(variables, x, y, jax.random.key(1))
    assert bool(jnp.all(jnp.isfinite(out)))


def test_full_res_mode():
    cfg = tiny_cfg(df_resolution="full_res")
    model = PULPoModel(cfg)
    variables = model.init(jax.random.key(0))
    x, y = _pair(cfg)
    outs = model.apply_eval(variables, x, y, rng=jax.random.key(1))
    final, transformed = outs[6], outs[7]
    for l in range(cfg.latent_levels):
        assert final[l].shape == (1, *cfg.input_size, cfg.ndims)
        assert transformed[l].shape == (1, *cfg.input_size, 1)


def test_2d_model():
    cfg = PULPoConfig(input_size=(24, 28), total_levels=3, latent_levels=2,
                      n0=2, dataset="synthetic")
    model = PULPoModel(cfg)
    variables = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 24, 28, 1), dtype=np.float32))
    y = jnp.asarray(rng.random((2, 24, 28, 1), dtype=np.float32))
    out = model.forward(variables, x, y, jax.random.key(1))
    assert out.shape == (2, 24, 28, 1)


def test_fullres_batched_level_warp_matches_per_level():
    """At full_res df_resolution the Autoencoder batches all K levels'
    image warps into ONE call (ops/warp.batched_level_warp). Each
    level's row must equal the plain per-level warp_image result."""
    from pulpo_tpu.ops.warp import warp_image

    # feedback without `transformed` so the warps are deferrable
    cfg = tiny_cfg(df_resolution="full_res",
                   feedback=("samples", "velocity_fields", "combined_dfs"))
    model = PULPoModel(cfg)
    variables = model.init(jax.random.key(0))
    x, y = _pair(cfg)
    outs = model.apply_eval(variables, x, y, rng=jax.random.key(3))
    final, transformed = outs[6], outs[7]
    for l in range(cfg.latent_levels):
        assert transformed[l].shape == (1, *cfg.input_size, 1)
        ref = warp_image(x.astype(jnp.float32), final[l])
        np.testing.assert_array_equal(
            np.asarray(transformed[l]), np.asarray(ref))
