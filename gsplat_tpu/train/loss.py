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

import jax
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


import os as _os

_BLUR_MODE = _os.environ.get("GSPLAT_BLUR", "matmul")
# GSPLAT_BLUR_PREC selects the MXU pass count of the banded blur matmuls
# (frozen at import, like every kernel lever — jit caches do not key on env):
#   highest — f32 via 6 bf16 passes (~2^-24 input error class) — the default
#   high    — f32 via 3 bf16 passes (~2^-16; XLA's F32_AS_BF16_3X) — a
#             measured but NOT fully quality-gated perf lever, opt-in.
# 'high' halves the loss block's MXU passes: sparse bench step 171.6 ->
# 165.1 ms synced / 149.1 -> 142.9 pipelined (v5e A/B, round 5). It is
# gradient-side only (SSIM feeds the loss scalar, never the rendered image),
# and its 1k isolation gate PASSED exactly (artifacts/qproxy_blurhigh: test
# PSNR 38.6285 @1k — identical to the HIGHEST control's 4 decimals). But the
# deterministic 7k pair (artifacts/qproxy_blurhigh7k vs qproxy_blurctrl7k,
# same scene/session, only this lever changed) measured a -0.34 dB test-PSNR
# snapshot delta at 7k (32.48 vs 32.82; train PSNR matched, 35.00 vs 35.06)
# — larger than the <= 0.12 dB milestone deltas of previously-accepted
# precision flips — and the full 30k gate the repo requires for default
# flips (BASELINE.md round-4 pack lesson) has not been run. Default stays
# HIGHEST until a 30k run at 'high' lands within noise.
_BLUR_PREC_NAME = _os.environ.get("GSPLAT_BLUR_PREC", "highest")
if _BLUR_PREC_NAME not in ("highest", "high"):
    raise ValueError(
        f"GSPLAT_BLUR_PREC must be 'highest' or 'high', got {_BLUR_PREC_NAME!r}")
_BLUR_PREC = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
}[_BLUR_PREC_NAME]


def _band_matrix(n: int, window: jnp.ndarray) -> jnp.ndarray:
    """(n, n) banded matrix B with B[i, j] = window[j - i + half] for
    |j - i| <= half, else 0 — so B @ x is the 1-D 'SAME'-zero-padded blur
    along x's leading axis. Built from static inputs only: XLA constant-folds
    it into the executable."""
    size = window.shape[0]
    half = size // 2
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    d = j - i + half
    return jnp.where(
        (d >= 0) & (d < size), window[jnp.clip(d, 0, size - 1)], 0.0
    )


def _blur(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise Gaussian blur; img (H,W,C) -> (H,W,C), SAME padding.

    Default ('matmul'): two banded-matrix contractions on the MXU. The
    shifted-slice form below materializes each of its 22 zero-padded slices
    as a ~24 MB copy at 1080p (round-4 profile: ~0.6-1.9 ms apiece across
    SSIM fwd+bwd), while the banded matmuls are ~19 GMAC per blur and their
    VJP is again a matmul — no slice chains in the backward. A C=3-minor
    depthwise lax.conv was measured earlier and rejected (3/128 lane
    utilization, ~1.7 ms per pass). Semantics are identical to conv with
    zero 'SAME' padding (upstream pytorch-ssim); MXU pass count is set by
    GSPLAT_BLUR_PREC (see the module-level lever note).

    GSPLAT_BLUR=slices restores the shifted-add form (frozen at import)."""
    if _BLUR_MODE == "slices":
        size = window.shape[0]
        half = size // 2
        h, w = img.shape[0], img.shape[1]
        x = jnp.pad(img, ((half, half), (0, 0), (0, 0)))
        img = sum(window[k] * x[k:k + h] for k in range(size))
        x = jnp.pad(img, ((0, 0), (half, half), (0, 0)))
        return sum(window[k] * x[:, k:k + w] for k in range(size))
    h, w = img.shape[0], img.shape[1]
    bh = _band_matrix(h, window)
    bw = _band_matrix(w, window)
    # rows: contract H; (H,H) @ (H, W*C) in the image's native layout
    out = jax.lax.dot_general(
        bh, img.reshape(h, -1), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_BLUR_PREC,
    ).reshape(img.shape)
    # cols: contract W; batch nothing, output (H, C, W) -> transpose back
    out = jax.lax.dot_general(
        out, bw, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_BLUR_PREC,
    )  # (H, C, W)
    return jnp.transpose(out, (0, 2, 1))


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
