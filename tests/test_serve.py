"""Serving export round-trip: export the inference programs of a tiny
model (pulpo_tpu/serve.py), reload from the artifact, and check the
served outputs match the live model."""

import jax
import jax.numpy as jnp
import numpy as np

from pulpo_tpu.config import PULPoConfig
from pulpo_tpu.models.api import PULPoModel
from pulpo_tpu.serve import ServedModel, export_model


def _tiny():
    cfg = PULPoConfig(input_size=(16, 16, 16), total_levels=3,
                      latent_levels=2, n0=4, dataset="synthetic")
    model = PULPoModel(cfg)
    variables = model.init(jax.random.key(0))
    return cfg, model, variables


def test_export_roundtrip(tmp_path):
    cfg, model, variables = _tiny()
    path = str(tmp_path / "model.pulpo")
    export_model(model, variables, path, batch_size=1, N=2, chunk=2)

    served = ServedModel(path)
    assert served.config.input_size == cfg.input_size
    assert served.manifest["baked_weights"]

    x = jax.random.uniform(jax.random.key(1), (1, *cfg.input_size, 1))
    y = jax.random.uniform(jax.random.key(2), (1, *cfg.input_size, 1))

    warped, df = served.predict_deterministic(x, y)
    ref = model.module.apply(variables, x, y, deterministic=True, train=False)
    np.testing.assert_allclose(np.asarray(warped), np.asarray(ref[7][0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(df), np.asarray(ref[6][0]),
                               rtol=1e-5, atol=1e-5)

    out = served.uq(x, y, jnp.uint32(7))
    assert all(np.isfinite(np.asarray(o)).all() for o in out)
    # same seed -> same draw; different seed -> different std map
    out2 = served.uq(x, y, jnp.uint32(7))
    np.testing.assert_array_equal(np.asarray(out[2]), np.asarray(out2[2]))

    warped_m, df_m = served.predict_mean(x, y, jnp.uint32(3))
    assert np.isfinite(np.asarray(warped_m)).all()
    assert df_m.shape == (1, *cfg.input_size, 3)
