"""UQ prediction tests: shapes, chunking equivalence, mean-SVF semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from pulpo_tpu.config import PULPoConfig
from pulpo_tpu.models.api import PULPoModel
from pulpo_tpu.uq.predict import predict_with_uncertainty


def setup_module(module):
    cfg = PULPoConfig(input_size=(12, 14, 16), total_levels=3, latent_levels=2,
                      n0=2, dataset="synthetic")
    module.model = PULPoModel(cfg)
    module.variables = module.model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    module.x = jnp.asarray(rng.random((1, *cfg.input_size, 1), dtype=np.float32))
    module.y = jnp.asarray(rng.random((1, *cfg.input_size, 1), dtype=np.float32))


def test_uq_shapes():
    cfg = model.cfg
    res = predict_with_uncertainty(model, variables, x, y, 4, jax.random.key(1))
    for l in range(cfg.latent_levels):
        assert res.mean_outputs[l].shape == (1, *cfg.df_size(l), 1)
        assert res.outputs[l].shape == (1, 4, *cfg.df_size(l), 1)
        assert res.output_std[l].shape == (1, *cfg.df_size(l))
        assert res.individual_df_std[l].shape == (1, *cfg.level_sizes[l])
        assert res.final_df_std[l].shape == (1, *cfg.df_size(l))
        assert bool(jnp.all(jnp.isfinite(res.output_std[l])))
        assert bool(jnp.all(res.output_std[l] >= 0))


def test_uq_chunked_equals_unchunked():
    r1 = predict_with_uncertainty(model, variables, x, y, 4, jax.random.key(2))
    r2 = predict_with_uncertainty(model, variables, x, y, 4, jax.random.key(2), chunk=2)
    for l in r1.mean_outputs:
        np.testing.assert_allclose(
            np.asarray(r1.mean_outputs[l]), np.asarray(r2.mean_outputs[l]),
            rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(r1.final_df_std[l]), np.asarray(r2.final_df_std[l]),
            rtol=1e-4, atol=1e-6)


def test_uq_mean_matches_predict_api():
    """UQResult.mean_outputs must equal model.predict's mean-SVF outputs
    for the same rng (both integrate the mean SVF then re-warp)."""
    rng = jax.random.key(3)
    res = predict_with_uncertainty(model, variables, x, y, 4, rng)
    outs, avg_dfs = model.predict(variables, x, y, 4, rng)
    for l in outs:
        np.testing.assert_allclose(
            np.asarray(res.mean_outputs[l]), np.asarray(outs[l]),
            rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(res.avg_dfs[l]), np.asarray(avg_dfs[l]),
            rtol=1e-5, atol=1e-6)


def test_uq_masked_final_df_std():
    mask = jnp.ones_like(x)
    res_m = predict_with_uncertainty(model, variables, x, y, 4, jax.random.key(4), mask=mask)
    res = predict_with_uncertainty(model, variables, x, y, 4, jax.random.key(4))
    # all-ones mask (borders may clamp identically) ~= unmasked
    for l in res.final_df_std:
        np.testing.assert_allclose(
            np.asarray(res_m.final_df_std[l]), np.asarray(res.final_df_std[l]),
            rtol=1e-4, atol=1e-6)
    # zero mask kills the std
    res_z = predict_with_uncertainty(
        model, variables, x, y, 4, jax.random.key(4), mask=jnp.zeros_like(x))
    assert float(jnp.max(jnp.abs(res_z.final_df_std[0]))) == 0.0
