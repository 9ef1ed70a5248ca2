"""View-dependent prompt processing with on-disk embedding cache.

TPU re-design of the reference prompt processor (reference:
threestudio/models/prompt_processors/base.py:173-523 +
stable_diffusion_prompt_processor.py:15-101):

* four direction prompts -- side / front / back / overhead -- selected per view
  by azimuth/elevation thresholds (front/back 45 deg, overhead 60 deg), later
  conditions overriding earlier ones (base.py:51-78);
* positive head/tail wrapping: ``head + prompt_vd + ". " + tail``
  (base.py:326-330);
* embeddings cached to ``.gdtpu_cache/text_embeddings/{md5}.npz`` keyed on
  (model, prompt) like the reference's ``.threestudio_cache`` (base.py:19-23).

The reference spawns a subprocess so the text encoder's VRAM is freed
(base.py:377-395); here the encoder runs once on host (torch CPU or any
callable), is garbage-collected afterwards, and only the cached arrays enter
the jitted graph -- no subprocess needed.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field
from typing import Callable, List, NamedTuple, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = [
    "DIRECTION_NAMES",
    "PromptConfig",
    "PromptEmbeddings",
    "shift_azimuth_deg",
    "view_direction_index",
    "compose_view_prompts",
    "PromptProcessor",
    "select_text_embeddings",
    "shifted_exponential_decay",
    "get_text_embeddings_perp_neg",
    "get_debiased_prompt",
    "make_bert_probe_fn",
]

DIRECTION_NAMES = ("side", "front", "back", "overhead")


@dataclass
class PromptConfig:
    prompt: str = ""
    negative_prompt: str = ""
    positive_prompt_head: str = ""
    positive_prompt_tail: str = ""
    front_threshold: float = 45.0
    back_threshold: float = 45.0
    overhead_threshold: float = 60.0
    view_dependent_prompt_front: bool = False
    pretrained_model_name_or_path: str = "stabilityai/stable-diffusion-2-1-base"
    cache_dir: str = ".gdtpu_cache/text_embeddings"
    # Perp-Neg (reference base.py:195-206; a*exp(-b*r)+c decay coefficients)
    use_perp_neg: bool = False
    perp_neg_f_sb: Tuple[float, float, float] = (1.0, 0.5, -0.606)
    perp_neg_f_fsb: Tuple[float, float, float] = (1.0, 0.5, 0.967)
    perp_neg_f_fs: Tuple[float, float, float] = (4.0, 0.5, -2.426)
    perp_neg_f_sf: Tuple[float, float, float] = (4.0, 0.5, -2.426)
    # BERT prompt debiasing (reference base.py:451-509; default off)
    use_prompt_debiasing: bool = False
    pretrained_model_name_or_path_prompt_debiasing: str = "bert-base-uncased"
    prompt_debiasing_mask_ids: Optional[Tuple[int, ...]] = None


class PromptEmbeddings(NamedTuple):
    """All embeddings the training loop needs, as device-ready arrays."""

    text_vd: jnp.ndarray  # (4, L, D) view-dependent positive
    uncond_vd: jnp.ndarray  # (4, L, D) negative
    text: jnp.ndarray  # (L, D) plain positive
    uncond: jnp.ndarray  # (L, D) plain negative


def shift_azimuth_deg(azimuth: jnp.ndarray) -> jnp.ndarray:
    """Wrap to (-180, 180]."""
    return (azimuth + 180.0) % 360.0 - 180.0


def view_direction_index(
    elevation_deg: jnp.ndarray,
    azimuth_deg: jnp.ndarray,
    front_threshold: float = 45.0,
    back_threshold: float = 45.0,
    overhead_threshold: float = 60.0,
) -> jnp.ndarray:
    """(B,) int32 direction id; later conditions override (side<front<back<overhead)."""
    azi = shift_azimuth_deg(azimuth_deg)
    idx = jnp.zeros_like(elevation_deg, jnp.int32)  # side
    idx = jnp.where((azi > -front_threshold) & (azi < front_threshold), 1, idx)
    idx = jnp.where((azi > 180 - back_threshold) | (azi < -180 + back_threshold), 2, idx)
    idx = jnp.where(elevation_deg > overhead_threshold, 3, idx)
    return idx


def compose_view_prompts(
    cfg: PromptConfig, probe_fn: Optional[Callable] = None
) -> List[str]:
    """The four positive prompts, wrapped with head/tail.

    With ``cfg.use_prompt_debiasing`` (and a masked-LM ``probe_fn``), the
    per-view base prompts are first debiased via
    :func:`get_debiased_prompt` (reference base.py:309-318: the debiased
    prompt feeds each direction's template before head/tail wrapping)."""
    if cfg.use_prompt_debiasing:
        if probe_fn is None:
            probe_fn = make_bert_probe_fn(
                cfg.pretrained_model_name_or_path_prompt_debiasing
            )
        base = get_debiased_prompt(
            cfg.prompt, probe_fn, mask_ids=cfg.prompt_debiasing_mask_ids
        )
    else:
        base = [cfg.prompt] * 4
    if cfg.view_dependent_prompt_front:
        templates = [
            "side view of {}", "front view of {}",
            "backside view of {}", "overhead view of {}",
        ]
    else:
        templates = [
            "{}, side view", "{}, front view", "{}, back view", "{}, overhead view",
        ]
    vd = [t.format(p) for t, p in zip(templates, base)]
    return [cfg.positive_prompt_head + v + ". " + cfg.positive_prompt_tail for v in vd]


def get_debiased_prompt(
    prompt: str,
    probe_fn: Callable,
    mask_ids: Optional[Sequence[int]] = None,
) -> List[str]:
    """Debiased per-view prompts via masked-LM pointwise mutual information
    (reference: prompt_processors/base.py:451-509).

    ``probe_fn(prompt) -> (4,)`` returns the masked-LM's normalized
    probabilities of the four view words (side/front/back/overhead) at the
    [MASK] in "This image is depicting a [MASK] view of {prompt}". For each
    candidate word position, the word is dropped from view ``i``'s prompt
    when the PMI ratio ``full / lerp(part, full, 0.5)`` falls below 0.95 --
    words that bias the view distribution (e.g. "front" inside the prompt)
    get removed for the views they fight against."""
    words = prompt.split(" ")
    prompts = [list(words) for _ in range(4)]
    full_probe = np.asarray(probe_fn(prompt), np.float64)
    ids = list(mask_ids) if mask_ids is not None else list(range(len(words)))
    for idx in ids:
        part = " ".join(words[:idx] + words[idx + 1 :])
        part_probe = np.asarray(probe_fn(part), np.float64)
        # torch.lerp(part, full, 0.5) = part + 0.5 * (full - part)
        pmi = full_probe / (part_probe + 0.5 * (full_probe - part_probe))
        for i in range(pmi.shape[0]):
            if pmi[i] < 0.95:
                prompts[i][idx] = ""
    return [" ".join(w for w in p if w) for p in prompts]


def make_bert_probe_fn(model_path: str = "bert-base-uncased") -> Callable:
    """Masked-LM probe over the four view words via transformers
    BertForMaskedLM on host CPU (the reference's debiasing backbone,
    base.py:453-482). Requires a local checkpoint in offline environments."""

    def probe(prompt: str) -> np.ndarray:
        import torch
        from transformers import AutoTokenizer, BertForMaskedLM

        tokenizer = AutoTokenizer.from_pretrained(model_path)
        model = BertForMaskedLM.from_pretrained(model_path)
        views = " ".join(DIRECTION_NAMES)
        view_ids = tokenizer(views, return_tensors="pt").input_ids[0][1:5]
        text = f"This image is depicting a [MASK] view of {prompt}"
        tokens = tokenizer(
            text, padding="max_length", truncation=True,
            add_special_tokens=True, return_tensors="pt",
        )
        mask_idx = torch.where(tokens.input_ids == tokenizer.mask_token_id)[1]
        with torch.no_grad():
            logits = model(**tokens).logits
        p = torch.softmax(logits[0, mask_idx], dim=-1)[0, view_ids]
        out = (p / p.sum()).numpy()
        del model, tokenizer
        return out

    return probe


class PromptProcessor:
    """Embeds (and caches) the prompt set with a pluggable text encoder.

    ``encode_fn(prompts: list[str]) -> np.ndarray (N, L, D)``. Pass
    :func:`make_clip_encode_fn` for a real CLIP checkpoint, or any stub for
    tests / weight-free environments.
    """

    def __init__(
        self,
        cfg: PromptConfig,
        encode_fn: Optional[Callable] = None,
        probe_fn: Optional[Callable] = None,
    ):
        self.cfg = cfg
        self._encode_fn = encode_fn
        self._probe_fn = probe_fn  # masked-LM probe for prompt debiasing
        self.embeddings = self._load_or_compute()

    # -- cache ----------------------------------------------------------------
    def _cache_key(self) -> str:
        payload = (
            f"{self.cfg.pretrained_model_name_or_path}::{self.cfg.prompt}::"
            f"{self.cfg.negative_prompt}::{self.cfg.positive_prompt_head}::"
            f"{self.cfg.positive_prompt_tail}"
            f"::debias={self.cfg.use_prompt_debiasing}"
        )
        return hashlib.md5(payload.encode()).hexdigest()

    def _cache_path(self) -> str:
        return os.path.join(self.cfg.cache_dir, f"{self._cache_key()}.npz")

    def _load_or_compute(self) -> PromptEmbeddings:
        path = self._cache_path()
        if os.path.exists(path):
            z = np.load(path)
            return PromptEmbeddings(
                text_vd=jnp.asarray(z["text_vd"]),
                uncond_vd=jnp.asarray(z["uncond_vd"]),
                text=jnp.asarray(z["text"]),
                uncond=jnp.asarray(z["uncond"]),
            )
        if self._encode_fn is None:
            raise RuntimeError(
                f"no cached embeddings at {path} and no encode_fn provided"
            )
        prompts_vd = compose_view_prompts(self.cfg, probe_fn=self._probe_fn)
        plain = self.cfg.positive_prompt_head + self.cfg.prompt + ". " + self.cfg.positive_prompt_tail
        all_prompts = prompts_vd + [self.cfg.negative_prompt] * 4 + [plain, self.cfg.negative_prompt]
        emb = np.asarray(self._encode_fn(all_prompts), np.float32)
        out = PromptEmbeddings(
            text_vd=jnp.asarray(emb[0:4]),
            uncond_vd=jnp.asarray(emb[4:8]),
            text=jnp.asarray(emb[8]),
            uncond=jnp.asarray(emb[9]),
        )
        os.makedirs(self.cfg.cache_dir, exist_ok=True)
        np.savez(
            path,
            text_vd=np.asarray(out.text_vd),
            uncond_vd=np.asarray(out.uncond_vd),
            text=np.asarray(out.text),
            uncond=np.asarray(out.uncond),
        )
        return out

    def __call__(self) -> PromptEmbeddings:
        return self.embeddings


def select_text_embeddings(
    emb: PromptEmbeddings,
    elevation_deg: jnp.ndarray,
    azimuth_deg: jnp.ndarray,
    view_dependent: bool = True,
    front_threshold: float = 45.0,
    back_threshold: float = 45.0,
    overhead_threshold: float = 60.0,
) -> jnp.ndarray:
    """(2B, L, D): conditional embeddings first, then unconditional
    (the reference's cond-then-uncond order, base.py:76-78)."""
    B = elevation_deg.shape[0]
    if view_dependent:
        idx = view_direction_index(
            elevation_deg, azimuth_deg, front_threshold, back_threshold, overhead_threshold
        )
        cond = emb.text_vd[idx]
        uncond = emb.uncond_vd[idx]
    else:
        cond = jnp.broadcast_to(emb.text[None], (B,) + emb.text.shape)
        uncond = jnp.broadcast_to(emb.uncond[None], (B,) + emb.uncond.shape)
    return jnp.concatenate([cond, uncond], axis=0)


def shifted_exponential_decay(a: float, b: float, c: float, r: jnp.ndarray) -> jnp.ndarray:
    """a*exp(-b*r) + c (reference: threestudio/utils/ops.py:423-424)."""
    return a * jnp.exp(-b * r) + c


def get_text_embeddings_perp_neg(
    emb: PromptEmbeddings,
    elevation_deg: jnp.ndarray,  # (B,)
    azimuth_deg: jnp.ndarray,  # (B,)
    cfg: PromptConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Perp-Neg embeddings: -> ((4B, L, D), (B, 2) negative guidance weights).

    Vectorized re-design of the reference's per-view python loop
    (base.py:80-165): the positive embedding interpolates between the
    front/side/back direction embeddings by azimuth, and two negative
    direction embeddings get exp-decay weights whose perpendicular component
    is subtracted in the guidance (stable_diffusion_guidance.py:196-232).

    Output layout matches the reference's 4-way batch: ``pos(B) ++ uncond(B)
    ++ negs(2B interleaved per view)``; weights row i is view i's two
    negative weights.
    """
    idx = view_direction_index(
        elevation_deg, azimuth_deg,
        cfg.front_threshold, cfg.back_threshold, cfg.overhead_threshold,
    )
    azi = jnp.abs(shift_azimuth_deg(azimuth_deg))  # (B,)
    side, front, back, overhead = (emb.text_vd[i] for i in range(4))

    is_over = (idx == 3)[:, None, None]
    is_fs = (azi < 90.0)[:, None, None]
    r_fs = (1.0 - azi / 90.0)[:, None, None]  # 1=front .. 0=side
    r_sb = (2.0 - azi / 90.0)[:, None, None]  # 1=side  .. 0=back

    pos_fs = r_fs * front[None] + (1.0 - r_fs) * side[None]
    pos_sb = r_sb * side[None] + (1.0 - r_sb) * back[None]
    uncond = emb.uncond_vd[idx]  # (B, L, D)
    pos = jnp.where(is_over, overhead[None], jnp.where(is_fs, pos_fs, pos_sb))

    B = elevation_deg.shape[0]
    front_b = jnp.broadcast_to(front[None], pos.shape)
    side_b = jnp.broadcast_to(side[None], pos.shape)
    neg0 = jnp.where(is_over, uncond, jnp.where(is_fs, front_b, side_b))
    neg1 = jnp.where(is_over, uncond, jnp.where(is_fs, side_b, front_b))

    d = shifted_exponential_decay
    r_fs1, r_sb1 = r_fs[:, 0, 0], r_sb[:, 0, 0]
    w0 = jnp.where(
        azi < 90.0, -d(*cfg.perp_neg_f_fs, r_fs1), -d(*cfg.perp_neg_f_sb, r_sb1)
    )
    w1 = jnp.where(
        azi < 90.0, -d(*cfg.perp_neg_f_sf, 1.0 - r_fs1), -d(*cfg.perp_neg_f_fsb, r_sb1)
    )
    over = idx == 3
    w0 = jnp.where(over, 0.0, w0)
    w1 = jnp.where(over, 0.0, w1)

    negs = jnp.stack([neg0, neg1], axis=1).reshape(2 * B, *pos.shape[1:])
    text = jnp.concatenate([pos, uncond, negs], axis=0)
    return text, jnp.stack([w0, w1], axis=1)


def make_flax_clip_encode_fn(weights_dir: str, max_length: int = 77) -> Callable:
    """Text encoder as one jitted Flax call on the converted SD checkpoint.

    Tokenization runs on host via the checkpoint's own tokenizer files
    (``weights_dir/tokenizer``); the CLIP transformer runs on-device through
    :class:`garmentdreamer_tpu.guidance.clip.CLIPTextModel`. This is the real
    weights path the reference implements with a torch CLIPTextModel in a
    subprocess (stable_diffusion_prompt_processor.py:15-41, base.py:377-395).
    """
    from garmentdreamer_tpu.guidance.clip import CLIPTextModel
    from garmentdreamer_tpu.guidance.convert import load_sd_text_encoder

    cfg, params = load_sd_text_encoder(weights_dir)
    model = CLIPTextModel(cfg)

    def encode(prompts: Sequence[str]) -> np.ndarray:
        from transformers import CLIPTokenizer

        tokenizer = CLIPTokenizer.from_pretrained(weights_dir, subfolder="tokenizer")
        tokens = tokenizer(
            list(prompts),
            padding="max_length",
            max_length=max_length,
            truncation=True,
            return_tensors="np",
        )
        import jax

        # full f32 matmuls: embedding runs once per prompt set, and TPU's
        # default bf16 matmul precision costs ~2e-2 absolute error here
        with jax.default_matmul_precision("highest"):
            out = jax.jit(model.apply)(params, jnp.asarray(tokens.input_ids, jnp.int32))
        return np.asarray(out, np.float32)

    return encode


def make_clip_encode_fn(model_path: str, max_length: int = 77) -> Callable:
    """Text encoder via transformers CLIPTextModel on host CPU.

    Runs once per prompt set; the model is freed immediately after (the
    reference deletes its text encoder too, stable_diffusion_guidance.py:92-93).
    """

    def encode(prompts: Sequence[str]) -> np.ndarray:
        import torch
        from transformers import AutoTokenizer, CLIPTextModel

        tokenizer = AutoTokenizer.from_pretrained(model_path, subfolder="tokenizer")
        model = CLIPTextModel.from_pretrained(model_path, subfolder="text_encoder")
        with torch.no_grad():
            tokens = tokenizer(
                list(prompts),
                padding="max_length",
                max_length=max_length,
                truncation=True,
                return_tensors="pt",
            )
            out = model(tokens.input_ids).last_hidden_state
        del model, tokenizer
        return out.float().numpy()

    return encode
