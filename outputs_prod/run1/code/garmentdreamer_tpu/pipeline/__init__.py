"""Four-stage pipeline driver + model factory (reference:
launch_garmentdreamer.py)."""

from .launch import estimate_normal, generate_3dgs, main, reconstruction, run_pipeline
from .models import GuidanceStack, build_guidance_stack

__all__ = [
    "run_pipeline",
    "generate_3dgs",
    "estimate_normal",
    "reconstruction",
    "main",
    "GuidanceStack",
    "build_guidance_stack",
]
