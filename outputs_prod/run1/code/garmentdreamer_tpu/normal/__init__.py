"""Stage 2: Metric3D-style monocular normal estimation, TPU-native.

Replaces the reference ``Garment_3DGS/Normal_estimator_Metric3D`` subtree
(SURVEY.md section 2.3): DINOv2 ViT-L/14-reg backbone (:mod:`.vit`), RAFT-DPT
depth+normal decoder (:mod:`.raft_decoder`), canonical-space preprocessing
(:mod:`.preprocess`), torch-checkpoint conversion (:mod:`.convert`), and the
stage driver (:mod:`.pipeline`).
"""

from .model import NormalEstimator, NormalEstimatorConfig, init_params, make_apply
from .pipeline import estimate_normals
from .preprocess import (
    CANONICAL_CROP,
    DEFAULT_FOCAL,
    postprocess_normal,
    preprocess_rgb,
)
from .raft_decoder import RaftDecoderConfig, RaftDepthNormalDecoder, norm_normalize
from .vit import DinoViT, ViTConfig

__all__ = [
    "NormalEstimator",
    "NormalEstimatorConfig",
    "init_params",
    "make_apply",
    "estimate_normals",
    "CANONICAL_CROP",
    "DEFAULT_FOCAL",
    "preprocess_rgb",
    "postprocess_normal",
    "RaftDecoderConfig",
    "RaftDepthNormalDecoder",
    "norm_normalize",
    "DinoViT",
    "ViTConfig",
]
