"""Image quality metrics: PSNR, SSIM, L1 (+ the 3DGS photometric loss).

Reference parity: gaussiansplatting/metrics.py + utils/loss_utils.py of the
vanilla 3DGS subtree (PSNR/SSIM with an 11x11 gaussian window, and the
standard (1-lambda)*L1 + lambda*(1-SSIM) photometric loss, train.py:~69-94).
LPIPS requires pretrained VGG weights (not vendored) and is intentionally
omitted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["psnr", "ssim", "l1_loss", "photometric_loss"]


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))


def psnr(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((a - b) ** 2)
    return 20.0 * jnp.log10(max_val) - 10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return g[:, None] * g[None, :]


def ssim(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Mean SSIM over an (H, W, C) image pair, 11x11 gaussian window
    (vanilla-3DGS loss_utils.ssim convention)."""
    C1 = (0.01 * max_val) ** 2
    C2 = (0.03 * max_val) ** 2
    win = _gaussian_window()[:, :, None, None]  # (11,11,1,1)

    def filt(x):
        # depthwise 11x11 conv, SAME padding
        x_ = jnp.transpose(x, (2, 0, 1))[:, None]  # (C,1,H,W)
        k = jnp.transpose(win, (2, 3, 0, 1))  # (1,1,11,11)
        y = jax.lax.conv_general_dilated(
            x_, k, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW")
        )
        return jnp.transpose(y[:, 0], (1, 2, 0))

    mu_a, mu_b = filt(a), filt(b)
    mu_a2, mu_b2, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sa = filt(a * a) - mu_a2
    sb = filt(b * b) - mu_b2
    sab = filt(a * b) - mu_ab
    s = ((2 * mu_ab + C1) * (2 * sab + C2)) / (
        (mu_a2 + mu_b2 + C1) * (sa + sb + C2)
    )
    return jnp.mean(s)


def photometric_loss(
    pred: jnp.ndarray, target: jnp.ndarray, lambda_dssim: float = 0.2
) -> jnp.ndarray:
    """(1-l)*L1 + l*(1-SSIM) (vanilla 3DGS train.py loss)."""
    return (1.0 - lambda_dssim) * l1_loss(pred, target) + lambda_dssim * (
        1.0 - ssim(pred, target)
    )
