"""2D diffusion priors: SD-2.1 UNet/VAE in Flax, schedules, prompts, SDS/VSD."""

from garmentdreamer_tpu.guidance.scheduler import (
    DiffusionSchedule,
    add_noise,
    ddim_step,
    eps_from_velocity,
    make_schedule,
    velocity_from_eps,
)
from garmentdreamer_tpu.guidance.unet import UNet2DCondition, UNetConfig
from garmentdreamer_tpu.guidance.vae import AutoencoderKL, VAEConfig
from garmentdreamer_tpu.guidance.prompt import (
    PromptConfig,
    PromptEmbeddings,
    PromptProcessor,
    select_text_embeddings,
    view_direction_index,
)
from garmentdreamer_tpu.guidance.sds import SDSConfig, SDSGuidance
from garmentdreamer_tpu.guidance.if2 import IF2Config, IF2Guidance, if2_unet_config
from garmentdreamer_tpu.guidance.t5 import (
    T5Config,
    T5EncoderModel,
    convert_t5_encoder,
    make_t5_encode_fn,
)

__all__ = [
    "T5Config",
    "T5EncoderModel",
    "convert_t5_encoder",
    "make_t5_encode_fn",
    "IF2Config",
    "IF2Guidance",
    "if2_unet_config",
    "DiffusionSchedule",
    "make_schedule",
    "add_noise",
    "ddim_step",
    "velocity_from_eps",
    "eps_from_velocity",
    "UNet2DCondition",
    "UNetConfig",
    "AutoencoderKL",
    "VAEConfig",
    "PromptConfig",
    "PromptEmbeddings",
    "PromptProcessor",
    "select_text_embeddings",
    "view_direction_index",
    "SDSConfig",
    "SDSGuidance",
]
