"""Mesh geometry state, deformer losses, neural shader, and view loading for
stage 3 (SURVEY.md section 2.4 -- Garment_Deformer equivalents)."""

from .mesh import (
    MeshTopology,
    aabb_normalization,
    build_topology,
    face_normals,
    laplacian_apply,
    laplacian_loss,
    normal_consistency_loss,
    vertex_normals,
)
from .losses import (
    ShadingInputs,
    camera_view_cosines,
    hole_mask_loss,
    mask_loss,
    normal_map_loss,
    normal_map_loss_enhanced,
    shading_loss_inputs,
    to_camera_normal,
)
from .shader import NeuralShader, NeuralShaderConfig, positional_encoding
from .views import LoadedView, camera_from_json_entry, load_views, transform_view

__all__ = [
    "MeshTopology",
    "build_topology",
    "face_normals",
    "vertex_normals",
    "laplacian_apply",
    "laplacian_loss",
    "normal_consistency_loss",
    "aabb_normalization",
    "mask_loss",
    "hole_mask_loss",
    "normal_map_loss",
    "normal_map_loss_enhanced",
    "shading_loss_inputs",
    "ShadingInputs",
    "to_camera_normal",
    "camera_view_cosines",
    "NeuralShader",
    "NeuralShaderConfig",
    "positional_encoding",
    "LoadedView",
    "load_views",
    "camera_from_json_entry",
    "transform_view",
]
