"""Config-owned kernel routing (VERDICT r4 #8).

Every performance-routing decision in the package — which Pallas
kernels are live, their tier ladders and tuning constants — resolves
through this module instead of scattered ``os.environ`` reads. The
precedence is:

    environment variable  >  PULPoConfig.routing  >  registry default

so sweeps keep their env-var ergonomics (an exported ``PULPO_*`` var
still wins) while the *owned* state lives on the config object, rides
checkpoints and serving manifests, and is introspectable/loggable as
one table.

Usage:

- kernels call ``routing.get("PULPO_X")`` (same semantics their old
  ``os.environ.get`` had, plus config awareness);
- entry points (model init, CLIs, bench) call ``activate(cfg)`` once,
  which installs the config's routing pairs and logs the resolved
  table the first time it changes;
- ``resolved_table()`` snapshots every knob for manifests/checkpoints.

The registry also documents each knob — the de-facto routing reference
that VERDICT r4 flagged as missing.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger("pulpo_tpu.routing")

# name -> (default, doc). Defaults mirror the measured round-3/4
# decisions (PERF.md); a knob absent from env and config resolves here.
KNOBS: dict[str, tuple[str, str]] = {
    # global kill switches
    "PULPO_NO_PALLAS_WARP": ("", "disable every Pallas warp/integration kernel (XLA gathers)"),
    "PULPO_NO_PALLAS_BWD": ("", "disable the Pallas squaring-step backward (XLA vjp)"),
    "PULPO_USE_PALLAS": ("1", "per-process Pallas master switch (1=on)"),
    # warp cascade (kernels/warp_halo.py)
    "PULPO_WARP_HALO": ("2,3", "halo tier ladder for image warps (comma ints)"),
    "PULPO_WARP_REPAIR_FRAC": ("0.001,0.02", "sparse-repair budget ladder (fractions of voxels)"),
    "PULPO_WARP_BZ": ("", "z-slab height override for the halo kernels (auto if empty)"),
    "PULPO_WARP_INLINE_W": ("8", "tap count above which hat weights are recomputed inline"),
    "PULPO_WARP_ZLOOP": ("0", "internal-z-loop kernel structure (measured neutral; keep 0)"),
    "PULPO_WARP_COARSE": ("0", "compile the large-displacement coarse tier into warps (LungCT)"),
    "PULPO_WARP_COARSE_CMAX": ("24", "max |coarse offset| voxels the coarse tier absorbs"),
    # SVF integration (kernels/warp_local.py)
    "PULPO_SQUARING_HALO": ("2,3", "halo ladder for past-sub-voxel squaring steps"),
    # round-5 channels-first df pipeline
    "PULPO_CF_PIPELINE": ("0", "channels-first df pipeline: 0/1/integ/interpret"),
    "PULPO_CF_VMEM_MB": ("0", "scoped-VMEM lift for CF kernels (0 = compiler default 16M)"),
    # conv path (ops/conv.py, models/blocks.py)
    "PULPO_NO_CONVPAD": ("", "disable the 96->128 conv channel padding"),
    "PULPO_NO_TAPGRAD": ("", "disable the tap-sum conv backward (XLA conv-transpose vjp)"),
    "PULPO_CONV_TAPGRAD_MIN_VOXELS": ("4194304", "volume threshold for the tap-sum backward"),
    "PULPO_TAPGRAD_UNROLL": ("1", "taps per dk tap-loop body (only with PULPO_TAPGRAD_DK=loop)"),
    "PULPO_TAPGRAD_DK": ("", "''=27-tap loop; 'conv'=chunked-conv dk (2.5x isolated, OOMs composed on 16G)"),
    "PULPO_TAPGRAD_DK_CHUNKS": ("8", "z chunks for the dk conv (bounds the emitter's relayout temp)"),
    "PULPO_CONV_NARROW": ("0", "attic MXU narrow-conv kernel (measured -2.9% composed)"),
    # fused heads (kernels/{vel_head,pos_head}.py; conv_chain in attic/)
    "PULPO_FUSED_VELHEAD": ("", "''=auto (bf16 on), '1' force, '0' off"),
    "PULPO_FUSED_POSTHEAD": ("0", "fused posterior head (measured -6.0% composed; opt-in)"),
    "PULPO_POSTHEAD_MIN_VOL": ("32768", "min volume for the fused posterior head"),
    "PULPO_FUSED_CONVSEQ": ("0", "attic fused encode ConvSequence chain (never composed-A/B'd)"),
    # UQ engine (uq/predict.py)
    "PULPO_UQ_ENCODE_CHUNK": ("0", "stream the encode in pair-chunks of this size (B>=6)"),
}

# knobs whose routing decisions change the compiled program's branch
# surface; activate() logs a WARNING when they deviate from default
# (the -12.9% compiled-but-untaken coarse-tier tax class, VERDICT r4
# weak #9).
_SURFACE_KNOBS = ("PULPO_WARP_COARSE", "PULPO_WARP_HALO",
                  "PULPO_SQUARING_HALO", "PULPO_FUSED_POSTHEAD",
                  "PULPO_FUSED_CONVSEQ")

_active: dict[str, str] = {}
_last_logged: dict[str, str] | None = None


def get(name: str, default: str | None = None) -> str:
    """Resolve one knob: env > active config > registry default.
    `default` overrides the registry default for call sites that had a
    bespoke one (kept for exactness during the migration)."""
    v = os.environ.get(name)
    if v is not None:
        return v
    if name in _active:
        return _active[name]
    if default is not None:
        return default
    return KNOBS.get(name, ("", ""))[0]


def activate(routing=()) -> None:
    """Install config-owned routing pairs (e.g. ``PULPoConfig.routing``)
    and log the resolved table once per distinct state."""
    global _active
    _active = dict(routing)
    for k in _active:
        if k not in KNOBS:
            raise KeyError(f"unknown routing knob {k!r}")
    log_table()


def overlay(pairs) -> None:
    """Merge pairs into the active routing (env vars still win in
    `get`). Used by task switches that imply a routing choice — e.g.
    the LungCT large-deformation paths enabling the coarse warp tier —
    replacing the old ``os.environ.setdefault`` pattern."""
    _active.update(dict(pairs))
    log_table()


def resolved_table() -> dict[str, str]:
    """Every knob's resolved value (for manifests, checkpoints, logs)."""
    return {name: get(name) for name in KNOBS}


def log_table(force: bool = False) -> None:
    """Log the resolved routing table (once per distinct state), plus a
    warning for non-default program-surface knobs — the trace-time
    guard against silently compiling untaken cascade tiers."""
    global _last_logged
    table = resolved_table()
    if table == _last_logged and not force:
        return
    _last_logged = table
    non_default = {k: v for k, v in table.items() if v != KNOBS[k][0]}
    logger.info("kernel routing: %s",
                non_default if non_default else "all defaults")
    for k in _SURFACE_KNOBS:
        if table[k] != KNOBS[k][0]:
            logger.warning(
                "routing knob %s=%s changes the compiled branch surface "
                "(default %r): merely COMPILING an untaken cascade tier "
                "measured -12.9%% composed (PERF.md round-4 ladder) — "
                "confirm the branch is actually taken on this data",
                k, table[k], KNOBS[k][0])
