"""One-way PyTorch-checkpoint importer for parity testing and migration.

Maps a reference PULPo state_dict (src/models.py attribute layout:
`downpath.*`, `autoencoder.*`) onto this framework's flax variables
({'params', 'batch_stats'}), converting conv kernels OI*K -> *KIO and
BatchNorm weight/bias/running stats. Also reproduces the reference's
legacy key migration `control_points -> velocity_field`
(evaluate.py:71-89).

Works on raw numpy/torch state dicts; no torch import required unless
tensors need `.numpy()`.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from pulpo_tpu.config import PULPoConfig


def remap_legacy_keys(state_dict: Mapping[str, Any]) -> dict[str, Any]:
    """control_points -> velocity_field (evaluate.py:78-89)."""
    return {k.replace("control_points", "velocity_field"): v for k, v in state_dict.items()}


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _conv_kernel(w) -> np.ndarray:
    """torch (O, I, *K) -> flax (*K, I, O)."""
    w = _np(w)
    k = w.ndim - 2
    return np.transpose(w, tuple(range(2, 2 + k)) + (1, 0))


def _convunit_entries(torch_prefix: str, sd, params: dict, stats: dict):
    """ConvUnit: _op.0 Conv, _op.1 BatchNorm."""
    params["TorchConv_0"] = {
        "Conv_0": {
            "kernel": _conv_kernel(sd[f"{torch_prefix}._op.0.weight"]),
            "bias": _np(sd[f"{torch_prefix}._op.0.bias"]),
        }
    }
    params["BatchNorm_0"] = {
        "scale": _np(sd[f"{torch_prefix}._op.1.weight"]),
        "bias": _np(sd[f"{torch_prefix}._op.1.bias"]),
    }
    stats["BatchNorm_0"] = {
        "mean": _np(sd[f"{torch_prefix}._op.1.running_mean"]),
        "var": _np(sd[f"{torch_prefix}._op.1.running_var"]),
    }


def _convseq(torch_prefix: str, depth: int, sd):
    params: dict = {}
    stats: dict = {}
    for i in range(depth):
        p: dict = {}
        s: dict = {}
        _convunit_entries(f"{torch_prefix}._op.{i}", sd, p, s)
        params[f"ConvUnit_{i}"] = p
        stats[f"ConvUnit_{i}"] = s
    return params, stats


def _plain_conv(torch_prefix: str, sd):
    return {
        "Conv_0": {
            "kernel": _conv_kernel(sd[f"{torch_prefix}.weight"]),
            "bias": _np(sd[f"{torch_prefix}.bias"]),
        }
    }


def import_torch_state_dict(
    state_dict: Mapping[str, Any], cfg: PULPoConfig
) -> dict[str, Any]:
    """Build flax variables from a reference PULPo state_dict."""
    sd = remap_legacy_keys(dict(state_dict))
    # Lightning checkpoints nest under 'state_dict'
    if "state_dict" in sd and isinstance(sd["state_dict"], Mapping):
        sd = remap_legacy_keys(dict(sd["state_dict"]))

    params: dict = {"downpath": {}, "autoencoder": {}}
    stats: dict = {"downpath": {}, "autoencoder": {}}

    # --- DownPath (pulpo.py:36-45): down_blocks.{k} ConvSequence depth 3
    for k in range(cfg.total_levels):
        p, s = _convseq(f"downpath.down_blocks.{k}", 3, sd)
        params["downpath"][f"down_block_{k}"] = p
        stats["downpath"][f"down_block_{k}"] = s

    ae_p = params["autoencoder"]
    ae_s = stats["autoencoder"]

    # --- up_blocks (pulpo.py:118-125): global levels lk_offset..total-2,
    # ConvSequence depth 2
    for k in range(cfg.lk_offset, cfg.total_levels - 1):
        p, s = _convseq(f"autoencoder.up_blocks.{k}", 2, sd)
        ae_p[f"up_block_{k}"] = p
        ae_s[f"up_block_{k}"] = s

    # --- encoders (pulpo.py:127-135)
    for l in range(cfg.latent_levels):
        enc_p: dict = {}
        enc_s: dict = {}
        # sample_merge_block exists for all levels in the reference but is
        # only *used* (and only materialized here) for l < K-1
        if l < cfg.latent_levels - 1:
            p, s = _convseq(f"autoencoder.encoders.{l}.sample_merge_block", 2, sd)
            enc_p["sample_merge_block"] = p
            enc_s["sample_merge_block"] = s
        enc_p["mu_sigma"] = {
            "conv_mu": _plain_conv(f"autoencoder.encoders.{l}.mu_sigma._conv_mu", sd),
            "conv_sigma": _plain_conv(f"autoencoder.encoders.{l}.mu_sigma._conv_sigma.0", sd),
        }
        ae_p[f"encoder_{l}"] = enc_p
        if enc_s:
            ae_s[f"encoder_{l}"] = enc_s

    # --- decoders (pulpo.py:137-150): VelocityField head
    for l in range(cfg.latent_levels):
        vf_prefix = f"autoencoder.decoders.{l}.velocity_field"
        vf_p: dict = {}
        vf_s: dict = {}
        if cfg.cp_depth >= 2:
            for i in range(cfg.cp_depth - 1):
                p: dict = {}
                s: dict = {}
                _convunit_entries(f"{vf_prefix}._op.{i}", sd, p, s)
                vf_p[f"ConvUnit_{i}"] = p
                vf_s[f"ConvUnit_{i}"] = s
            vf_p["TorchConv_0"] = _plain_conv(f"{vf_prefix}._op.{cfg.cp_depth - 1}", sd)
        elif cfg.cp_depth == 1:
            vf_p["TorchConv_0"] = _plain_conv(f"{vf_prefix}._op.0", sd)
        ae_p[f"decoder_{l}"] = {"velocity_field": vf_p}
        if vf_s:
            ae_s[f"decoder_{l}"] = {"velocity_field": vf_s}

    import jax.numpy as jnp

    to_jnp = lambda t: {
        k: to_jnp(v) if isinstance(v, dict) else jnp.asarray(v) for k, v in t.items()
    }
    return {"params": to_jnp(params), "batch_stats": to_jnp(stats)}
