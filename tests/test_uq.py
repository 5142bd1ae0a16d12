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


def test_uq_keep_samples_consistency():
    """Retained per-sample dfs must reproduce the streamed statistics:
    std(sample_final_dfs) == final_df_std, mean(sample_individual_dfs)
    == avg_dfs — and match across chunked/unchunked runs."""
    res = predict_with_uncertainty(
        model, variables, x, y, 4, jax.random.key(5), chunk=2,
        keep_samples=True)
    for l in res.avg_dfs:
        ind = np.asarray(res.sample_individual_dfs[l])  # (N, B, *sp, nd)
        np.testing.assert_allclose(
            ind.mean(axis=0), np.asarray(res.avg_dfs[l]), rtol=1e-4, atol=1e-6)
        fin = np.asarray(res.sample_final_dfs[l]).astype(np.float64)
        std = np.mean(np.std(fin, axis=0, ddof=1), axis=-1)
        np.testing.assert_allclose(
            std, np.asarray(res.final_df_std[l]), rtol=1e-3, atol=1e-5)
        out = np.asarray(res.sample_outputs[l]).astype(np.float64)
        np.testing.assert_allclose(
            np.mean(np.std(out, axis=0, ddof=1), axis=-1),
            np.asarray(res.output_std[l]), rtol=1e-3, atol=1e-5)


def test_uq_same_draw_landmarks():
    """sample_landmarks must equal warping the landmarks with the
    retained per-sample final dfs (same posterior draws)."""
    from pulpo_tpu.ops.warp import warp_landmarks

    lm = jnp.asarray([[[2.0, 3.0, 4.0], [5.0, 6.0, 7.0]]])  # (1, 2, 3)
    res = predict_with_uncertainty(
        model, variables, x, y, 4, jax.random.key(6), chunk=2,
        keep_samples=True, lm=lm)
    assert res.sample_landmarks.shape == (4, 1, 2, 3)
    for i in range(4):
        expect = warp_landmarks(lm, res.sample_final_dfs[0][i])
        np.testing.assert_allclose(
            np.asarray(res.sample_landmarks[i]), np.asarray(expect),
            rtol=1e-5, atol=1e-6)


def test_uq_entropy_map():
    res = predict_with_uncertainty(model, variables, x, y, 4, jax.random.key(7))
    for l in res.output_std:
        ent = np.asarray(res.output_entropy[l])
        assert ent.shape == np.asarray(res.output_std[l]).shape
        assert np.all(np.isfinite(ent))
    # entropy is monotone in the variance
    s = np.asarray(res.output_std[0]).ravel()
    e = np.asarray(res.output_entropy[0]).ravel()
    order = np.argsort(s)
    assert np.all(np.diff(e[order]) >= -1e-6)


def test_auto_chunk_divides_and_scales():
    from pulpo_tpu.uq.predict import auto_chunk

    cfg_full = PULPoConfig(input_size=(160, 192, 224), total_levels=5,
                           latent_levels=4, n0=32, dataset="synthetic")
    # calibration point: full-res N=32 must pick the measured-safe 8 on
    # a 16G-class chip (PERF.md: chunk 16 OOMs by 54M, chunk 8 fits)
    c = auto_chunk(cfg_full, 32, batch=1, dtype_bytes=2, hbm_budget=0.75 * 16e9)
    assert c == 8
    # batch=2 halves the chunk
    assert auto_chunk(cfg_full, 32, batch=2, dtype_bytes=2,
                      hbm_budget=0.75 * 16e9) == 4
    # the chosen chunk always divides N
    for n in (6, 10, 12, 32, 48):
        for budget in (1e8, 1e9, 1e10):
            cc = auto_chunk(cfg_full, n, hbm_budget=budget)
            assert n % cc == 0
    # tiny inputs: no chunking needed
    assert auto_chunk(model.cfg, 8, dtype_bytes=4) == 8


def test_retention_budget_decisions():
    """keep_samples is a budget decision (VERDICT r2 item 6): retention
    must be declined when the all_* buffers would not fit HBM, accepted
    when they do, and auto_chunk must reserve the retained bytes."""
    from pulpo_tpu.uq.predict import (auto_chunk, decide_keep_samples,
                                      retention_bytes)

    cfg_full = PULPoConfig(input_size=(160, 192, 224), total_levels=5,
                           latent_levels=4, n0=32, dataset="synthetic")
    rb = retention_bytes(cfg_full, 32, batch=1)
    # full-res N=32 retained dfs/outputs are multi-GB (the round-2
    # estimate was ~3.5G); sanity-band the model
    assert 2e9 < rb < 8e9
    # too-small budget: retention declined (streamed statistics only)
    assert decide_keep_samples(cfg_full, 32, batch=1,
                               hbm_budget=5e9) is False
    # 16G-class chip: retention + a (shrunken) chunk working set fits
    # post-restructure (split-weight convs removed the 11G concat temp)
    assert decide_keep_samples(cfg_full, 32, batch=1,
                               hbm_budget=0.75 * 16e9) is True
    # tiny configs retain fine
    assert decide_keep_samples(model.cfg, 8, hbm_budget=0.75 * 16e9) is True
    # retained bytes shrink the chunk choice
    c_plain = auto_chunk(cfg_full, 32, batch=1, hbm_budget=0.75 * 16e9)
    c_ret = auto_chunk(cfg_full, 32, batch=1, hbm_budget=0.75 * 16e9,
                       retained_bytes=6 * 10**9)
    assert c_ret < c_plain

    # Evaluate.predict's "auto" default must resolve to the budgeted
    # decision (never the unconditional True of ADVICE r2's OOM trap)
    from pulpo_tpu.eval.evaluator import Evaluate
    from pulpo_tpu.models.api import PULPoModel as _M

    ev = Evaluate()
    ev.segs = False
    ev.mask = False
    ev.model = _M(cfg_full)
    ev.variables = None

    calls = {}

    def fake_uq(model_, variables_, x_, y_, n_, rng_, mask=None,
                keep_samples=None, **kw):
        calls["keep_samples"] = keep_samples
        raise RuntimeError("stop")

    import pulpo_tpu.eval.evaluator as evmod

    orig = evmod.predict_with_uncertainty
    evmod.predict_with_uncertainty = fake_uq
    try:
        batch = {"x": np.zeros((1, 160, 192, 224, 1), np.float32),
                 "y": np.zeros((1, 160, 192, 224, 1), np.float32)}
        try:
            ev.predict(batch, num_samples=32)
        except RuntimeError:
            pass
    finally:
        evmod.predict_with_uncertainty = orig
    assert calls["keep_samples"] == decide_keep_samples(
        cfg_full, 32, batch=1, dtype_bytes=4)


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


def test_uq_encode_chunked_matches_monolithic(monkeypatch):
    """PULPO_UQ_ENCODE_CHUNK streaming encode (ADVICE r4 #2): chunked
    pair-encode matches the monolithic encode within the documented
    fusion-order tolerance, and non-divisible batches fall back to the
    monolithic path (bit-equal)."""
    from pulpo_tpu.uq.predict import _uq_impl

    rng = np.random.default_rng(1)
    cfg = model.cfg
    x2 = jnp.asarray(rng.random((2, *cfg.input_size, 1), dtype=np.float32))
    y2 = jnp.asarray(rng.random((2, *cfg.input_size, 1), dtype=np.float32))
    key = jax.random.key(9)
    base = _uq_impl(model, variables, x2, y2, 4, key, chunk=2)
    monkeypatch.setenv("PULPO_UQ_ENCODE_CHUNK", "1")
    got = _uq_impl(model, variables, x2, y2, 4, key, chunk=2)
    for l in base.mean_outputs:
        np.testing.assert_allclose(
            np.asarray(got.mean_outputs[l]), np.asarray(base.mean_outputs[l]),
            rtol=1e-4, atol=6e-4)
        np.testing.assert_allclose(
            np.asarray(got.output_std[l]), np.asarray(base.output_std[l]),
            rtol=1e-4, atol=6e-4)
    # batch 2 not divisible by 3 -> monolithic fallback, bit-equal
    monkeypatch.setenv("PULPO_UQ_ENCODE_CHUNK", "3")
    fb = _uq_impl(model, variables, x2, y2, 4, key, chunk=2)
    for l in base.mean_outputs:
        np.testing.assert_array_equal(np.asarray(fb.mean_outputs[l]),
                                      np.asarray(base.mean_outputs[l]))
