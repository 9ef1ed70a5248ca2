"""Stage 4: neural texture field reconstruction + VSD refinement
(reference: Garment_Deformer_NeTF/netf, SURVEY.md section 2.4)."""

from .cameras import orbit_pose, perspective, projection_from_K, reconstruction_pose
from .export import export_textured_mesh, pack_uv_atlas, write_textured_obj
from .renderer import TextureField, clean_mesh, render_textured
from .trainer import NeTFConfig, NeTFTrainer

__all__ = [
    "orbit_pose",
    "perspective",
    "projection_from_K",
    "reconstruction_pose",
    "export_textured_mesh",
    "pack_uv_atlas",
    "write_textured_obj",
    "TextureField",
    "clean_mesh",
    "render_textured",
    "NeTFConfig",
    "NeTFTrainer",
]
