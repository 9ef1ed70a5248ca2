"""Stage 3: template-mesh deformation against stage-1 renders + stage-2
normals (reference: Garment_Deformer_NeTF/deformation.py)."""

from .driver import DeformerConfig, deformation

__all__ = ["DeformerConfig", "deformation"]
