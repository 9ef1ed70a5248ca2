"""Per-program XLA compiler options for conv-heavy TPU programs.

Round-3 profiling finding (scripts/dump_vae_bwd_hlo.py + xplane traces): XLA's
space-to-batch converter rewrites the SD-VAE's large-spatial convolutions into
a strip-partitioned (batch*strips, H, W/strips+halo, C) form, and the
surrounding layout shuffles drown the program in data movement — at B=4
512^2 the encoder's fwd+bwd spent 183 of 306 ms in copy/pad/broadcast ops
(235 copies!), while every convolution together cost ~35 ms. Disabling the
pass for these programs: encoder fwd 80 -> 43 ms, fwd+bwd 355 -> 158 ms on
v5e. Plain NHWC convs at these shapes run near roofline without the rewrite.

Scope: applied at the jit sites of VAE/UNet-bearing programs (stage-1
guidance_grads, stage-4 NeTF steps, guidance eval/decode). Pallas kernels are
Mosaic-compiled and unaffected. The option participates in the persistent
compile-cache key, so toggling it never serves stale executables.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax

__all__ = ["CONV_COMPILER_OPTIONS", "conv_jit"]

# space-to-batch helps tiny-batch/huge-spatial convs on older generations;
# at SD shapes on v5e it is a large net loss (measured above). Disable it
# for programs that carry 3x3 convs at >=64^2 spatial.
CONV_COMPILER_OPTIONS = {"xla_disable_hlo_passes": "space-to-batch-converter"}


def conv_jit(fun=None, /, **jit_kwargs) -> Any:
    """``jax.jit`` with the conv-program compiler options pre-applied.

    Usable as ``conv_jit(f)``, ``@conv_jit`` or ``@conv_jit(donate_argnums=...)``.
    """
    if fun is None:
        return partial(conv_jit, **jit_kwargs)
    opts = dict(CONV_COMPILER_OPTIONS)
    opts.update(jit_kwargs.pop("compiler_options", None) or {})
    return jax.jit(fun, compiler_options=opts, **jit_kwargs)
