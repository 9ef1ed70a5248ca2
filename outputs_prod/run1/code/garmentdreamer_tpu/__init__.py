"""GarmentDreamer-TPU: a TPU-native (JAX/XLA/Pallas) text+template -> textured 3D garment framework.

A ground-up rebuild of the GarmentDreamer pipeline (3DV 2025) for TPU hardware:

  stage 1  splat     -- 3D Gaussian splatting optimized with Score Distillation
                        Sampling against a Stable-Diffusion-2.1-architecture UNet
  stage 2  normal    -- ViT + RAFT-style iterative decoder normal estimation
  stage 3  deform    -- template-mesh vertex-offset optimization against rendered
                        masks/normals (differentiable triangle rasterizer)
  stage 4  netf      -- neural texture field (hash grid + MLP) fit + VSD refinement

All hot paths are single jitted XLA programs; multi-chip scaling is expressed with
`jax.sharding.Mesh` + `shard_map` (view-batch data parallelism over ICI).
"""

__version__ = "0.1.0"
