"""Native DIF-VoxelMorph baseline tests."""

import jax
import jax.numpy as jnp
import numpy as np

from pulpo_tpu.models.voxelmorph import VxmModel


def test_vxm_forward_and_sampling():
    model = VxmModel((12, 14, 16))
    v = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 12, 14, 16, 1), dtype=np.float32))
    y = jnp.asarray(rng.random((1, 12, 14, 16, 1), dtype=np.float32))

    moved, df, (mu, sigma, z) = model.apply(v, x, y, deterministic=True)
    assert moved.shape == x.shape
    assert df.shape == (1, 12, 14, 16, 3)
    assert mu.shape == (1, 6, 7, 8, 3)
    assert bool(jnp.all(sigma > 0))
    # deterministic reproducible
    moved2, _, _ = model.apply(v, x, y, deterministic=True)
    np.testing.assert_array_equal(np.asarray(moved), np.asarray(moved2))

    avg_moved, avg_df, moved_std, df_std, all_moved, all_dfs = model.predict(
        v, x, y, 4, jax.random.key(1))
    assert all_moved.shape == (4, 1, 12, 14, 16, 1)
    assert moved_std.shape == (1, 12, 14, 16)
    assert bool(jnp.all(jnp.isfinite(avg_moved)))
    assert float(moved_std.max()) > 0  # stochastic spread


def test_vxm_eval_tables(tmp_path):
    from pulpo_tpu.eval.evaluator import Evaluate

    model = VxmModel((12, 14, 16))
    v = model.init(jax.random.key(0))

    ev = Evaluate()

    # synthetic loaders need a model cfg for shapes; attach vxm directly
    class _Shim:
        class cfg:
            input_size = (12, 14, 16)
            ndims = 3

    ev.model = _Shim()
    ev.load_data(task="synthetic", segs=False, lms=False, mask=False)
    ev.load_vxm(v, (12, 14, 16), output_dir=tmp_path)
    perf = ev.performance_vxm(num_samples=1)
    assert np.isfinite(perf[("train", "RMSE")]).all()
    unc = ev.uncertainty_vxm(num_samples=3)
    assert np.isfinite(unc[("val", "NCC")]).all()
    assert (tmp_path / "loss/loss_table_vxm.tex").exists()
