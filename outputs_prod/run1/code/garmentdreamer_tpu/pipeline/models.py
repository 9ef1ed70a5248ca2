"""Model factory for the pipeline driver: builds the SD-2.1 guidance stack
(UNet + VAE + prompt embeddings + SDS/VSD) at full or tiny scale.

The reference downloads pretrained weights from HuggingFace at run time
(stable_diffusion_guidance.py:83-99, sd_vsd_utils.py:46-66). This environment
has no egress and no baked checkpoints, so the factory:

* loads converted Flax weights from ``weights_dir`` when present (produced by
  the torch->Flax converters in guidance/convert once checkpoints exist);
* otherwise falls back to deterministic random initialization with a warning
  -- the full pipeline stays runnable end-to-end (shapes, speed, artifacts)
  and picks up real weights the moment they are dropped in.

Prompt embeddings likewise: a real CLIP encode_fn when weights exist, else a
deterministic per-prompt pseudo-embedding (hash-seeded) so view-dependent
prompt selection and caching still exercise the real code path
(prompt_processors/base.py:347-422 semantics).
"""

from __future__ import annotations

import dataclasses
import hashlib
import warnings
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from garmentdreamer_tpu.guidance import (
    AutoencoderKL,
    PromptConfig,
    PromptEmbeddings,
    PromptProcessor,
    SDSConfig,
    SDSGuidance,
    UNet2DCondition,
    UNetConfig,
    VAEConfig,
)
from garmentdreamer_tpu.guidance.vsd import CameraEmb, VSDConfig, VSDGuidance

__all__ = ["GuidanceStack", "build_guidance_stack", "pseudo_encode_fn"]


def pseudo_encode_fn(dim: int = 1024, length: int = 77):
    """Deterministic per-prompt pseudo CLIP embedding (weights-free fallback)."""

    def encode(prompts):
        out = []
        for p in prompts:
            seed = int.from_bytes(hashlib.md5(p.encode()).digest()[:4], "little")
            rs = np.random.RandomState(seed)
            out.append(rs.randn(length, dim).astype(np.float32) * 0.02)
        return np.stack(out)

    return encode


@dataclasses.dataclass
class GuidanceStack:
    sds: SDSGuidance
    vsd: Optional[VSDGuidance]
    prompt_embeddings: PromptEmbeddings
    vsd_text_embeddings: Optional[jnp.ndarray]  # (2, L, D) pos ++ neg
    q_params: Optional[Dict[str, Any]]
    latent_size: int
    image_size: int
    prompt_cfg: Optional[PromptConfig] = None  # carries use_perp_neg + decay


def build_guidance_stack(
    prompt: str,
    negative_prompt: str = "",
    scale: str = "sd21",
    weights_dir: Optional[str] = None,
    guidance_scale: float = 100.0,
    with_vsd: bool = True,
    vsd_positive_prompt: Optional[str] = None,
    vsd_negative_prompt: Optional[str] = None,
    cache_dir: Optional[str] = None,
    seed: int = 0,
    use_sjc: bool = False,
    sjc_var_red: bool = True,
    use_perp_neg: bool = False,
    prompt_overrides: Optional[Dict[str, Any]] = None,
) -> GuidanceStack:
    """``use_sjc`` activates Score-Jacobian-Chaining noising in the SDS
    guidance (reference cfg field stable_diffusion_guidance.py:38-39);
    ``use_perp_neg`` activates the Perp-Neg 4-way-batch path via the returned
    ``prompt_cfg`` (reference base.py:195-206). ``prompt_overrides`` passes
    any further PromptConfig fields (e.g. perp_neg_f_sb decay coefficients)
    straight through."""
    if scale == "sd21":
        # bf16 compute (f32 params): the reference runs fp16-mixed
        # (gaussiandreamer-sd.yaml precision: 16-mixed); bf16 is the TPU MXU's
        # native fast dtype and needs no loss scaling
        ucfg = dataclasses.replace(UNetConfig.sd21(), dtype=jnp.bfloat16)
        vcfg = dataclasses.replace(VAEConfig.sd(), dtype=jnp.bfloat16)
        latent, img, ctx_dim, temb = 64, 512, 1024, 1280
    elif scale == "tiny":
        ucfg = UNetConfig.tiny()
        vcfg = VAEConfig.tiny()
        latent, img, ctx_dim, temb = 16, 64, ucfg.cross_attention_dim, 128
    else:
        raise ValueError(scale)

    rng = jax.random.PRNGKey(seed)
    r_unet, r_vae, r_lora, r_cam, r_g = jax.random.split(rng, 5)

    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(vcfg)
    x0 = jnp.zeros((1, latent, latent, 4))
    t0 = jnp.zeros((1,), jnp.int32)
    c0 = jnp.zeros((1, 77, ctx_dim))
    img0 = jnp.zeros((1, img, img, 3))

    loaded = False
    if weights_dir is not None:
        try:
            from garmentdreamer_tpu.guidance import convert as gconvert  # type: ignore

            unet_params, vae_params = gconvert.load_sd_weights(weights_dir)
            loaded = True
        except Exception as e:  # pragma: no cover - depends on weights presence
            warnings.warn(f"could not load SD weights from {weights_dir}: {e}")
    if not loaded:
        if scale == "sd21":
            warnings.warn(
                "no SD-2.1 weights available; using random initialization "
                "(pipeline runs, outputs are untextured noise-guided)"
            )
        unet_params = unet.init(r_unet, x0, t0, c0)
        vae_params = vae.init(r_vae, img0, r_vae, method=AutoencoderKL.sample_latents)

    def unet_apply(params, lat, t, ctx):
        return unet.apply(params, lat, t, ctx)

    def vae_encode(params, images, rng_):
        return vae.apply(params, images, rng_, method=AutoencoderKL.sample_latents)

    # real CLIP text conditioning whenever a checkpoint is present; the
    # hash-seeded pseudo embedding is ONLY the weights-free fallback
    # (reference: stable_diffusion_prompt_processor.py:15-101)
    encode_fn = None
    if weights_dir is not None:
        try:
            from garmentdreamer_tpu.guidance.prompt import make_flax_clip_encode_fn

            encode_fn = make_flax_clip_encode_fn(weights_dir)
        except Exception as e:  # pragma: no cover - depends on weights presence
            warnings.warn(f"could not load CLIP text encoder from {weights_dir}: {e}")
    if encode_fn is None:
        if scale == "sd21":
            warnings.warn(
                "no CLIP text encoder available; prompts are embedded with the "
                "deterministic pseudo encoder (plumbing-only conditioning)"
            )
        encode_fn = pseudo_encode_fn(ctx_dim)
        model_tag = "pseudo"  # distinct cache key: never shadows real CLIP output
    else:
        model_tag = weights_dir
    pcfg = PromptConfig(
        prompt=prompt,
        negative_prompt=negative_prompt,
        pretrained_model_name_or_path=model_tag,
        cache_dir=cache_dir or ".gd_cache/text_embeddings",
        use_perp_neg=use_perp_neg,
        **{k: tuple(v) if isinstance(v, list) else v
           for k, v in (prompt_overrides or {}).items()},
    )
    prompt_embeddings = PromptProcessor(pcfg, encode_fn=encode_fn)()

    sds = SDSGuidance(
        SDSConfig(
            guidance_scale=guidance_scale, latent_size=latent, image_size=img,
            use_sjc=use_sjc, var_red=sjc_var_red,
        ),
        unet_apply, unet_params, vae_encode, vae_params,
    )

    vsd = None
    vsd_text = None
    q_params = None
    if with_vsd:
        lcfg = dataclasses.replace(ucfg, lora_rank=4, extra_emb_dim=temb)
        lora = UNet2DCondition(lcfg)
        lora_params = lora.init(
            r_lora, x0, t0, c0, extra_emb=jnp.zeros((1, temb))
        )
        # the reference initializes the LoRA UNet FROM the pretrained SD
        # weights and trains only the adapter matrices (netf/trainer.py:
        # 79-120); graft the base leaves so semantics match AND the two
        # trees share HBM buffers (the base copy is ~3.5 GB f32)
        import flax.traverse_util as tu

        fl = tu.flatten_dict(lora_params)
        fu = tu.flatten_dict(unet_params)
        fl.update({k: v for k, v in fu.items()
                   if k in fl and fl[k].shape == v.shape})
        lora_params = tu.unflatten_dict(fl)
        cam = CameraEmb(time_embed_dim=temb)
        cam_params = cam.init(r_cam, jnp.zeros((1, 16)))

        vsd = VSDGuidance(
            VSDConfig(latent_size=latent, image_size=img, time_embed_dim=temb),
            unet_apply=unet_apply,
            unet_params=unet_params,
            vae_encode=vae_encode,
            vae_params=vae_params,
            lora_apply=lambda p, x_, t_, c_, e_: lora.apply(
                p, x_, t_, c_, extra_emb=e_
            ),
            camera_emb_apply=lambda p, pose, sh: cam.apply(p, pose, sh),
        )
        vp = prompt + (", " + vsd_positive_prompt if vsd_positive_prompt else "")
        vn = vsd_negative_prompt or ""
        emb = encode_fn([vp, vn])
        vsd_text = jnp.asarray(emb)
        q_params = {"lora": lora_params, "camera": cam_params}

    return GuidanceStack(
        sds=sds,
        vsd=vsd,
        prompt_embeddings=prompt_embeddings,
        vsd_text_embeddings=vsd_text,
        q_params=q_params,
        latent_size=latent,
        image_size=img,
        prompt_cfg=pcfg,
    )
