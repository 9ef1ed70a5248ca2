"""Texture-field encoders (hash grid / frequency / triplane) -- component N7
replacements (SURVEY.md section 2.1)."""

from .encoders import (
    FrequencyEncoder,
    HashGridConfig,
    HashGridEncoder,
    MLP,
    TriplaneEncoder,
)

__all__ = [
    "HashGridConfig",
    "HashGridEncoder",
    "FrequencyEncoder",
    "TriplaneEncoder",
    "MLP",
]
