"""The attic: measured dead ends kept for documentation, not routed.

Policy (round 4, VERDICT #9): hot modules carry only live paths. Code
that was implemented, tested, and measured to LOSE composed on the
flagship bench moves here, with the measurement recorded in PERF.md.
Nothing imports this package at runtime; nothing here is default-on.

Contents:
- im2col.py       — im2col+matmul 3x3x3 conv: 4.3-36x WORSE than the
                    XLA conv on v5e (27-view concat lowers to
                    badly-laid-out pads/copies). PERF.md "Conv
                    throughput by shape".
- conv_narrow.py  — single-op MXU kernel for narrow-cin convs: 1.8x
                    isolated, -2.9% composed (layout glue around the
                    custom call); superseded by the whole-head fusion
                    kernels/vel_head.py. PERF.md round-3 A/B table.
"""
