"""Offline garment autoencoder + latent diffusion (reference:
AutoEncoder-Garment_Diffusion, SURVEY.md section 2.5)."""

from .models import CbnDecoder, CoordsEncoder, Dgcnn, knn_indices
from .trainer import EncDecConfig, EncDecTrainer, LatentDiffusion
from .udf import get_mesh_from_udf, make_udf_training_sample, sample_surface_points

__all__ = [
    "Dgcnn",
    "CbnDecoder",
    "CoordsEncoder",
    "knn_indices",
    "EncDecConfig",
    "EncDecTrainer",
    "LatentDiffusion",
    "sample_surface_points",
    "make_udf_training_sample",
    "get_mesh_from_udf",
]
