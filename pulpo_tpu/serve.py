"""Serving export: ahead-of-time compiled, self-contained inference
artifacts.

The reference has no deployment story (inference = re-instantiate the
Lightning module and call predict, evaluate.py:91-111). For production
serving on TPU we export the jitted inference programs as portable
StableHLO artifacts via ``jax.export``:

- one artifact bundles the traced program for a FIXED input shape
  (shapes are static under jit anyway — the reference also runs fixed
  h5-declared shapes, oasis.py:59) plus the model config,
- weights are baked in as constants by default (self-contained: the
  serving host needs no checkpoint, no flax, no model code — just jax),
  or kept as arguments (``bake_weights=False``) for weight-hotswap
  setups,
- artifacts are forward-compatible serialized MLIR with the usual
  jax.export guarantees, and loading does not re-trace or re-compile
  beyond the target backend's AOT step.

Formats: a ``.pulpo`` file is a zip with ``manifest.json`` (config,
entry names, shapes) and one ``<entry>.mlir`` per exported function.

Entries exported by :func:`export_model`:

- ``predict_deterministic(x, y) -> (warped, final_df)`` — level-0
  outputs of the mu-decode (reference models.py:333-336).
- ``predict_mean(x, y, key) -> (warped, final_df)`` — N-sample
  mean-SVF prediction (models.py:323-331).
- ``uq(x, y, key) -> (warped, final_df, output_std, entropy)`` — the
  streaming UQ engine's headline maps (evaluate.py:205-280 workload).
"""

from __future__ import annotations

import dataclasses
import io
import json
import zipfile
from typing import Any, Callable

import jax
import jax.numpy as jnp

from pulpo_tpu.config import PULPoConfig

FORMAT_VERSION = 1


def _entries(model, variables, N: int, chunk: int | None):
    """Name -> (fn, needs_seed) for the export set. Stochastic entries
    take a uint32 ``seed`` scalar (not a key array: extended PRNG-key
    dtypes don't cross the export boundary portably)."""
    from pulpo_tpu.uq.predict import _uq_impl

    def det(v, x, y):
        outs = model.module.apply(v, x, y, deterministic=True, train=False)
        return outs[7][0], outs[6][0]

    def mean(v, x, y, seed):
        res = _uq_impl(model, v, x, y, N, jax.random.key(seed), None, chunk)
        return res.mean_outputs[0], res.final_dfs[0]

    def uq(v, x, y, seed):
        res = _uq_impl(model, v, x, y, N, jax.random.key(seed), None, chunk)
        return (res.mean_outputs[0], res.final_dfs[0],
                res.output_std[0], res.output_entropy[0])

    return {
        "predict_deterministic": (det, False),
        "predict_mean": (mean, True),
        "uq": (uq, True),
    }


def export_model(model, variables, path: str, batch_size: int = 1,
                 N: int = 8, chunk: int | None = None,
                 bake_weights: bool = True,
                 platforms: tuple[str, ...] | None = None) -> None:
    """Export the inference programs of ``model`` to ``path``.

    ``platforms``: lowering targets (default: the current backend).
    Pass ``("tpu", "cpu")`` to produce a multi-platform artifact.
    """
    import jax.export as jex

    cfg = model.cfg
    x_s = jax.ShapeDtypeStruct((batch_size, *cfg.input_size, 1), jnp.float32)
    seed_s = jax.ShapeDtypeStruct((), jnp.uint32)

    from pulpo_tpu import routing as _routing

    manifest: dict[str, Any] = {
        "format_version": FORMAT_VERSION,
        "config": dataclasses.asdict(cfg),
        # resolved kernel-routing table at export time (env + config +
        # defaults): the knobs that shaped the exported programs are
        # part of the artifact's identity (VERDICT r4 #8)
        "kernel_routing": _routing.resolved_table(),
        "batch_size": batch_size,
        "N": N,
        "baked_weights": bake_weights,
        "jax_version": jax.__version__,
        "entries": {},
    }

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, (fn, needs_seed) in _entries(model, variables, N, chunk).items():
            extra = (seed_s,) if needs_seed else ()
            if bake_weights:
                f = lambda x, y, *rest, _fn=fn: _fn(variables, x, y, *rest)
                args = (x_s, x_s) + extra
            else:
                f = fn
                args = (jax.eval_shape(lambda: variables), x_s, x_s) + extra
            exp = jex.export(jax.jit(f), platforms=platforms)(*args)
            zf.writestr(f"{name}.mlir", exp.serialize())
            manifest["entries"][name] = {"needs_seed": needs_seed}
        zf.writestr("manifest.json", json.dumps(manifest, indent=1))


class ServedModel:
    """Loaded serving artifact: callable exported entries.

    ``ServedModel(path)`` then ``served.predict_deterministic(x, y)``,
    ``served.predict_mean(x, y, key)``, ``served.uq(x, y, key)`` (or
    with a leading ``variables`` argument if exported with
    ``bake_weights=False``).
    """

    def __init__(self, path: str):
        import jax.export as jex

        self._fns: dict[str, Callable] = {}
        with zipfile.ZipFile(path) as zf:
            self.manifest = json.loads(zf.read("manifest.json"))
            for name in self.manifest["entries"]:
                exp = jex.deserialize(zf.read(f"{name}.mlir"))
                self._fns[name] = exp.call

    @property
    def config(self) -> PULPoConfig:
        cfg = dict(self.manifest["config"])
        for k in ("input_size", "feedback", "recon_loss"):
            if k in cfg and isinstance(cfg[k], list):
                cfg[k] = tuple(cfg[k])
        return PULPoConfig(**cfg)

    def __getattr__(self, name: str):
        try:
            return self._fns[name]
        except KeyError:
            raise AttributeError(name) from None
