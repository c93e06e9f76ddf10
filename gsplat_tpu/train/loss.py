"""Training losses: L1 + D-SSIM (lambda_dssim weighting) and PSNR.

Absent in the reference (its train loop has no loss, SURVEY.md §2 'Train driver');
semantics follow upstream 3DGS's utils/loss_utils.py (pytorch-ssim): 11x11 Gaussian
window, sigma 1.5, C1=0.01^2, C2=0.03^2, SAME padding; and
loss = (1-lambda) * L1 + lambda * (1 - SSIM), lambda_dssim = 0.2
(reference default src/arguments/params.h:62).

SSIM runs as separable shifted-add blurs (static slices of a zero-padded
image) — one fused elementwise VPU loop per pass under jit; see _blur for why
this beats a C=3 depthwise convolution on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - gt))


def mse(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - gt) ** 2)


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log10(jnp.maximum(mse(pred, gt), 1e-12))


def _gaussian_window(size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    return g / jnp.sum(g)


def _blur(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise Gaussian blur; img (H,W,C) -> (H,W,C), SAME padding.

    Written as shifted weighted adds (static slices of a zero-padded array)
    rather than lax.conv: a C=3-minor depthwise conv lowers to a TPU
    convolution with 3/128 lane utilization (~1.7 ms per pass at 1080p, ~14 ms
    of a 280 ms train step across SSIM fwd+bwd); the slice form fuses into one
    elementwise VPU loop and its transpose (pad+add) fuses the same way.
    Semantics are identical to conv with zero 'SAME' padding (upstream
    pytorch-ssim)."""
    size = window.shape[0]
    half = size // 2
    h, w = img.shape[0], img.shape[1]
    x = jnp.pad(img, ((half, half), (0, 0), (0, 0)))
    img = sum(window[k] * x[k:k + h] for k in range(size))
    x = jnp.pad(img, ((0, 0), (half, half), (0, 0)))
    return sum(window[k] * x[:, k:k + w] for k in range(size))


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
    c1: float = 0.01 ** 2,
    c2: float = 0.03 ** 2,
) -> jnp.ndarray:
    """Mean SSIM over (H,W,3) images in [0,1] (upstream pytorch-ssim semantics)."""
    w = _gaussian_window(window_size, sigma)
    mu1 = _blur(img1, w)
    mu2 = _blur(img2, w)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _blur(img1 * img1, w) - mu1_sq
    sigma2_sq = _blur(img2 * img2, w) - mu2_sq
    sigma12 = _blur(img1 * img2, w) - mu1_mu2
    num = (2 * mu1_mu2 + c1) * (2 * sigma12 + c2)
    den = (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    return jnp.mean(num / den)


def photometric_loss(
    pred: jnp.ndarray, gt: jnp.ndarray, lambda_dssim: float = 0.2
) -> jnp.ndarray:
    """(1-l)*L1 + l*(1-SSIM) — the upstream 3DGS training objective."""
    return (1.0 - lambda_dssim) * l1_loss(pred, gt) + lambda_dssim * (
        1.0 - ssim(pred, gt)
    )
