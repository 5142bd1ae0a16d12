"""Native diffeomorphic-VoxelMorph baseline (DIF-VM).

The reference compares PULPo against a probabilistic VoxelMorph baseline
through `load_vxm` / `predict_vxm` / `performance_vxm` / `uncertainty_vxm`
(evaluate.py:113-118, 282-309, 1224-1377) — but its `voxelmorph`
dependency is never importable there (absent from package-list.txt).
Here the baseline is a first-class native model: a U-Net over
concat(moving, fixed) predicting (mu, log sigma) of an SVF at half
resolution, sampled, integrated by scaling & squaring and upscaled
(Dalca et al., the architecture DIF-VM denotes), trained with the
VoxelMorph-diff loss (MSE/NCC + nondiagonal KL).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from pulpo_tpu.models.blocks import TorchConv
from pulpo_tpu.ops.resize import avg_pool_ceil
from pulpo_tpu.ops.warp import integrate_svf, resize_vecfield, warp_image_auto


class _ConvLReLU(nn.Module):
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = TorchConv(self.features, 3, "SAME", dtype=self.dtype)(x)
        return nn.leaky_relu(x, negative_slope=0.2)


class VxmDense(nn.Module):
    """U-Net -> probabilistic SVF -> diffeomorphic warp."""

    ndims: int = 3
    enc_features: tuple[int, ...] = (16, 32, 32, 32)
    dec_features: tuple[int, ...] = (32, 32, 32, 32, 16, 16)
    int_steps: int = 7
    dtype: Any = None

    @nn.compact
    def __call__(self, moving, fixed, rng=None, deterministic: bool = False):
        x = jnp.concatenate([moving, fixed], axis=-1)

        # encoder (stride via ceil-mode avg pool to match our pyramids)
        skips = []
        h = x
        for f in self.enc_features:
            h = _ConvLReLU(f, self.dtype)(h)
            skips.append(h)
            h = avg_pool_ceil(h)

        from pulpo_tpu.ops.resize import resize_linear

        # decoder with skip connections
        for i, f in enumerate(self.dec_features[:4]):
            h = _ConvLReLU(f, self.dtype)(h)
            if i < len(skips):
                skip = skips[-(i + 1)]
                h = resize_linear(h, skip.shape[1:-1])
                h = jnp.concatenate([h, skip], axis=-1)
        for f in self.dec_features[4:]:
            h = _ConvLReLU(f, self.dtype)(h)

        # probabilistic SVF head at half resolution
        half = tuple(-(-s // 2) for s in moving.shape[1:-1])
        h = resize_linear(h, half)
        mu = TorchConv(self.ndims, 3, "SAME", dtype=self.dtype, name="flow_mu")(h)
        log_sigma = TorchConv(
            self.ndims, 3, "SAME", dtype=self.dtype, name="flow_log_sigma")(h)
        sigma = jnp.exp(log_sigma.astype(jnp.float32))

        if deterministic:
            z = mu.astype(jnp.float32)
        else:
            eps = jax.random.normal(rng, mu.shape, jnp.float32)
            z = mu.astype(jnp.float32) + sigma * eps

        integrated = integrate_svf(z, nsteps=self.int_steps)
        full_df = resize_vecfield(integrated, 0.5, out_size=moving.shape[1:-1])
        moved = warp_image_auto(moving.astype(jnp.float32), full_df)
        return moved, full_df, (mu.astype(jnp.float32), sigma, z)


class VxmModel:
    """Thin stateless wrapper mirroring PULPoModel's API shape."""

    def __init__(self, input_size: tuple[int, ...], dtype: Any = None, int_steps: int = 7):
        self.input_size = tuple(input_size)
        self.module = VxmDense(ndims=len(input_size), int_steps=int_steps, dtype=dtype)

    def init(self, rng):
        @jax.jit
        def _init(rng):
            x = jnp.zeros((1, *self.input_size, 1), jnp.float32)
            p, s = jax.random.split(rng)
            return self.module.init({"params": p}, x, x, rng=s)

        return _init(rng)

    @functools.cached_property
    def _apply_jit(self):
        return jax.jit(
            lambda v, m, f, r, det: self.module.apply(v, m, f, rng=r, deterministic=det),
            static_argnums=4,
        )

    def apply(self, variables, moving, fixed, rng=None, deterministic=False):
        if rng is None:
            rng = jax.random.key(0)
        return self._apply_jit(variables, moving, fixed, rng, deterministic)

    @functools.lru_cache(maxsize=None)
    def _sample_jit(self, n: int):
        def f(v, m, fx, r):
            def one(k):
                moved, df, _ = self.module.apply(v, m, fx, rng=k, deterministic=False)
                return moved, df

            moved, dfs = jax.vmap(one)(jax.random.split(r, n))
            avg_moved = moved.mean(axis=0)
            avg_df = dfs.mean(axis=0)
            moved_std = jnp.mean(jnp.std(moved, axis=0, ddof=1), axis=-1)
            df_std = jnp.mean(jnp.std(dfs, axis=0, ddof=1), axis=-1)
            return avg_moved, avg_df, moved_std, df_std, moved, dfs

        return jax.jit(f)

    def predict(self, variables, moving, fixed, num_samples: int, rng):
        """(avg_moved, avg_df, moved_std, df_std, all_moved, all_dfs) —
        the reference's predict_vxm outputs (evaluate.py:282-309)."""
        return self._sample_jit(num_samples)(variables, moving, fixed, rng)


def make_vxm_train_step(model: VxmModel, tx, image_sigma: float = 0.02,
                        prior_lambda: float = 20.0):
    """VoxelMorph-diff training: -log p(y|moved) (gaussian, image_sigma)
    + nondiagonal KL on the SVF posterior."""
    from pulpo_tpu.ops.losses import kl_nondiagonal

    def loss_fn(params, batch, rng):
        moved, _df, (mu, sigma, _z) = model.module.apply(
            {"params": params}, batch["x"], batch["y"], rng=rng)
        recon = jnp.mean((moved - batch["y"]) ** 2) / (2 * image_sigma**2)
        kl = kl_nondiagonal(mu, sigma, prior_lambda=prior_lambda)
        # normalize KL per voxel to keep the magnitudes comparable
        kl = kl / float(jnp.size(mu))
        total = recon + kl
        return total, {"total_loss": total, "recon": recon, "kl": kl}

    @jax.jit
    def step(params, opt_state, batch, rng):
        rng, sub = jax.random.split(rng)
        grads, metrics = jax.grad(loss_fn, has_aux=True)(params, batch, sub)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return params, opt_state, rng, metrics

    return step
