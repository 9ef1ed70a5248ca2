"""BERT prompt debiasing (VERDICT r2 next-9; reference base.py:451-509).

The masked-LM is pluggable (``probe_fn``), so the PMI word-dropping
algorithm is pinned on a deterministic fixture without needing the
bert-base-uncased checkpoint in this offline environment.
"""

import numpy as np

from garmentdreamer_tpu.guidance.prompt import (
    PromptConfig,
    compose_view_prompts,
    get_debiased_prompt,
)


def _probe_front_biased(prompt: str) -> np.ndarray:
    """Fixture masked-LM: the word 'front' skews the view distribution."""
    if "front" in prompt.split():
        return np.array([0.1, 0.7, 0.1, 0.1])  # side, front, back, overhead
    return np.array([0.25, 0.25, 0.25, 0.25])


def test_biasing_word_dropped_for_fighting_views():
    out = get_debiased_prompt("a front dress", _probe_front_biased)
    # PMI for dropping 'front': full/lerp(part, full, .5) =
    # [.571, 1.474, .571, .571] -> removed for side/back/overhead (< 0.95),
    # kept for the front view
    assert out == ["a dress", "a front dress", "a dress", "a dress"]


def test_neutral_words_kept_everywhere():
    out = get_debiased_prompt("a blue dress", _probe_front_biased)
    assert out == ["a blue dress"] * 4


def test_mask_ids_restrict_candidates():
    # only position 0 ('a') may be dropped -> 'front' survives everywhere
    out = get_debiased_prompt("a front dress", _probe_front_biased, mask_ids=[0])
    assert out == ["a front dress"] * 4


def test_compose_view_prompts_uses_debiased_bases():
    cfg = PromptConfig(prompt="a front dress", use_prompt_debiasing=True)
    vd = compose_view_prompts(cfg, probe_fn=_probe_front_biased)
    assert vd[0] == "a dress, side view. "
    assert vd[1] == "a front dress, front view. "
    assert vd[2] == "a dress, back view. "
    assert vd[3] == "a dress, overhead view. "


def test_compose_view_prompts_unchanged_when_off():
    cfg = PromptConfig(prompt="a front dress", use_prompt_debiasing=False)
    vd = compose_view_prompts(cfg, probe_fn=_probe_front_biased)
    assert vd[1] == "a front dress, front view. "
    assert vd[0] == "a front dress, side view. "
