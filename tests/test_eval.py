"""Evaluation suite tests: metrics, artifact, tables, full pipeline smoke."""

import numpy as np
import pytest

from pulpo_tpu.eval import metrics as M
from pulpo_tpu.eval.artifact import artifact


def test_global_ncc_self_correlation():
    rng = np.random.default_rng(0)
    a = rng.random((8, 9, 10))
    assert M.global_ncc(a, a) == pytest.approx(1.0, abs=1e-6)
    assert abs(M.global_ncc(a, rng.random((8, 9, 10)))) < 0.3


def test_lm_metrics():
    lm1 = np.array([[[0.0, 0, 0], [1, 1, 1]]])
    lm2 = np.array([[[1.0, 0, 0], [1, 1, 4]]])
    # torch.median convention (reference evaluate.py:364): for an even
    # count the LOWER middle element, so median of (1, 3) is 1, not 2
    assert M.lm_mae(lm1, lm2) == pytest.approx(1.0)
    assert M.lm_euclid(lm1, lm2) == pytest.approx(2.0)  # mean of (1, 3)


def test_lms_var_and_corr():
    rng = np.random.default_rng(1)
    lms = rng.random((5, 4, 3))
    v = M.lms_var(lms)
    assert v.shape == (4,)
    c = M.lms_corr(lms.mean(0), lms, lms.mean(0) + 0.1)
    assert np.isfinite(c)


@pytest.mark.parametrize("method", ["noise", "mean", "white", "black", "checkerboard"])
def test_artifact_3d(method):
    rng = np.random.default_rng(2)
    img = rng.random((1, 16, 16, 16, 1)).astype(np.float32)
    out = artifact(img, method, x=(4, 12), y=(4, 12), z=(4, 12))
    assert out.shape == img.shape
    # outside the box untouched
    np.testing.assert_array_equal(out[:, :4], img[:, :4])
    # inside changed (except vanishingly unlikely)
    assert not np.allclose(out[:, 4:12, 4:12, 4:12], img[:, 4:12, 4:12, 4:12])


def test_artifact_blur_2d():
    rng = np.random.default_rng(3)
    img = rng.random((1, 32, 32, 1)).astype(np.float32)
    out = artifact(img, "blur", x=(8, 24), y=(8, 24))
    roi = out[:, 8:24, 8:24]
    assert roi.std() < img[:, 8:24, 8:24].std()  # smoother


@pytest.mark.slow
def test_run_one_model_smoke(tmp_path):
    """End-to-end eval pipeline on a tiny synthetic task."""
    import jax

    from pulpo_tpu.config import PULPoConfig
    from pulpo_tpu.eval.evaluator import Evaluate
    from pulpo_tpu.models.api import PULPoModel

    cfg = PULPoConfig(input_size=(12, 14, 16), total_levels=3, latent_levels=2,
                      n0=2, dataset="synthetic", segs=True)
    model = PULPoModel(cfg)
    variables = model.init(jax.random.key(0))

    ev = Evaluate()
    ev.set_model(model, variables, output_dir=tmp_path / "evaluation")
    perf, unc = ev.run_one_model(segs=True, lms=True, N=3, task="synthetic",
                                 visualize=True)

    assert perf.shape[0] == cfg.latent_levels
    assert ("train", "RMSE") in perf.columns
    assert np.isfinite(perf[("train", "RMSE")]).all()
    assert unc is not None and np.isfinite(unc[("val", "NCC")]).all()
    assert (tmp_path / "evaluation/loss/loss_table_deterministic.tex").exists()
    assert (tmp_path / "evaluation/uncertainty/loss_table.tex").exists()
    assert len(list((tmp_path / "evaluation/vis").glob("*.png"))) >= 9
    assert len(list((tmp_path / "evaluation/jdet").glob("*.svg"))) >= 9

    aff = ev.performance_affine()
    assert np.isfinite(aff[("train", "RMSE")]).all()


@pytest.mark.slow
def test_artifact_robustness_sweep(tmp_path):
    """The reference's artifact-robustness experiment set: performance /
    uncertainty / affine / vxm tables with a corrupted moving image
    (evaluate.py:1146, 1224, 1300, 1421, 1500)."""
    import jax

    from pulpo_tpu.config import PULPoConfig
    from pulpo_tpu.eval.evaluator import Evaluate
    from pulpo_tpu.models.api import PULPoModel

    cfg = PULPoConfig(input_size=(12, 14, 16), total_levels=3, latent_levels=2,
                      n0=2, dataset="synthetic")
    model = PULPoModel(cfg)
    variables = model.init(jax.random.key(0))

    ev = Evaluate()
    ev.set_model(model, variables, output_dir=tmp_path / "evaluation")
    ev.load_data(task="synthetic", segs=False, lms=True, mask=False, ndims=3)
    for sub in ("loss", "uncertainty"):
        (ev.output_dir / sub).mkdir(parents=True, exist_ok=True)

    clean = ev.performance(save=False)
    corrupted = ev.performance(artifact="black", save=True)
    # the black box changes the moving image -> RMSE must differ
    assert not np.allclose(clean[("train", "RMSE")],
                           corrupted[("train", "RMSE")])
    assert (tmp_path / "evaluation/loss/loss_table_deterministicblack.tex").exists()

    unc = ev.uncertainty(num_samples=2, artifact="noise", save=True)
    assert np.isfinite(unc[("train", "Var")]).all()
    assert (tmp_path / "evaluation/uncertainty/loss_tablenoise.tex").exists()

    aff = ev.performance_affine(artifact="white", save=True)
    assert np.isfinite(aff[("train", "RMSE")]).all()
    assert (tmp_path / "evaluation/loss/loss_table_affinewhite.tex").exists()

    # vxm baseline with artifact (random-init weights; smoke + table)
    from pulpo_tpu.models.voxelmorph import VxmModel

    vxm = VxmModel(cfg.input_size)
    vxm_vars = vxm.init(jax.random.key(1))
    ev.load_vxm(vxm_vars, cfg.input_size, output_dir=tmp_path / "evaluation_vxm")
    for sub in ("loss", "uncertainty"):
        (ev.output_dir / sub).mkdir(parents=True, exist_ok=True)
    pv = ev.performance_vxm(artifact="mean", save=True)
    assert np.isfinite(pv[("train", "RMSE")]).all()
    uv = ev.uncertainty_vxm(num_samples=2, artifact="mean", save=True)
    assert np.isfinite(uv[("train", "Var")]).all()
    assert np.isfinite(uv[("train", "LM_NCC")]).any()
    assert (tmp_path / "evaluation_vxm/loss/loss_table_vxmmean.tex").exists()
