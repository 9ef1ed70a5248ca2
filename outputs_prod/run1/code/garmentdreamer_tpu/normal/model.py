"""Metric3D normal-estimation model: DINOv2 ViT-L encoder + RAFT-DPT decoder.

Stage-2 equivalent of the reference ``DepthModel``/``DensePredModel``
(reference: mono/model/monodepth_model.py:1-37,
mono/model/model_pipelines/dense_pipeline.py:5-16,
mono/model/model_pipelines/__base_model__.py:6-21) configured by
mono/configs/HourglassDecoder/vit.raft5.large.py.

The wrapper jits one apply function over an NHWC batch of canonical 616x1064
crops and returns depth, confidence, and the per-iteration normal stack.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .raft_decoder import RaftDecoderConfig, RaftDepthNormalDecoder
from .vit import DinoViT, ViTConfig

from garmentdreamer_tpu.core.xla_opts import conv_jit

__all__ = ["NormalEstimatorConfig", "NormalEstimator", "init_params", "make_apply"]


@dataclasses.dataclass(frozen=True)
class NormalEstimatorConfig:
    vit: ViTConfig = dataclasses.field(default_factory=ViTConfig.large_reg)
    decoder: RaftDecoderConfig = dataclasses.field(default_factory=RaftDecoderConfig.large)

    @staticmethod
    def large(iters: int = 8, dtype: jnp.dtype = jnp.float32) -> "NormalEstimatorConfig":
        return NormalEstimatorConfig(
            vit=dataclasses.replace(ViTConfig.large_reg(), dtype=dtype),
            decoder=dataclasses.replace(RaftDecoderConfig.large(), iters=iters, dtype=dtype),
        )

    @staticmethod
    def tiny() -> "NormalEstimatorConfig":
        vit = ViTConfig.tiny()
        return NormalEstimatorConfig(
            vit=vit, decoder=RaftDecoderConfig.tiny(vit.embed_dim)
        )


class NormalEstimator(nn.Module):
    cfg: NormalEstimatorConfig

    @nn.compact
    def __call__(self, img: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        tokens, grid = DinoViT(self.cfg.vit, name="encoder")(img)
        return RaftDepthNormalDecoder(self.cfg.decoder, name="decoder")(tokens, grid)


def init_params(cfg: NormalEstimatorConfig, rng: jax.Array, hw: Tuple[int, int] = (616, 1064)):
    model = NormalEstimator(cfg)
    img = jnp.zeros((1, hw[0], hw[1], 3), jnp.float32)
    return model.init(rng, img)


def make_apply(cfg: NormalEstimatorConfig):
    """Jitted ``(params, batch NHWC) -> outputs`` forward."""
    model = NormalEstimator(cfg)

    @conv_jit
    def apply(params, img):
        return model.apply(params, img)

    return apply
