"""Loss semantics vs independent oracles: SSIM must match upstream
pytorch-ssim (the exact implementation 3DGS trains against) — 11x11 Gaussian
window, sigma 1.5, zero-'SAME' padding, C1=0.01^2/C2=0.03^2."""

import numpy as np
import pytest

from gsplat_tpu.train.loss import l1_loss, photometric_loss, psnr, ssim

torch = pytest.importorskip("torch")


def _torch_ssim(img1, img2, window_size=11, sigma=1.5):
    """Verbatim restatement of pytorch-ssim with torch.nn.functional."""
    import torch.nn.functional as F

    x = torch.from_numpy(img1).permute(2, 0, 1)[None].double()
    y = torch.from_numpy(img2).permute(2, 0, 1)[None].double()
    c = x.shape[1]
    g = torch.exp(
        -((torch.arange(window_size, dtype=torch.float64) - window_size // 2) ** 2)
        / (2 * sigma ** 2)
    )
    g = g / g.sum()
    w = (g[:, None] @ g[None, :]).expand(c, 1, window_size, window_size)

    def blur(t):
        return F.conv2d(t, w, padding=window_size // 2, groups=c)

    mu1, mu2 = blur(x), blur(y)
    mu1s, mu2s, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = blur(x * x) - mu1s
    s2 = blur(y * y) - mu2s
    s12 = blur(x * y) - mu12
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1s + mu2s + c1) * (s1 + s2 + c2))
    return float(m.mean())


def test_ssim_matches_pytorch_ssim():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (40, 56, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.08, a.shape), 0, 1).astype(np.float32)
    assert float(ssim(a, b)) == pytest.approx(_torch_ssim(a, b), abs=2e-5)
    # smooth images exercise the stability constants
    yy, xx = np.mgrid[0:40, 0:56] / 56.0
    sa = np.stack([xx, yy, xx * yy], -1).astype(np.float32)
    sb = (sa * 0.9 + 0.05).astype(np.float32)
    assert float(ssim(sa, sb)) == pytest.approx(_torch_ssim(sa, sb), abs=2e-5)


def test_ssim_identity_and_range():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (33, 47, 3)).astype(np.float32)  # non-tile-multiple
    assert float(ssim(a, a)) == pytest.approx(1.0, abs=1e-6)
    assert -1.0 <= float(ssim(a, 1.0 - a)) < 1.0


def test_photometric_loss_composition():
    rng = np.random.default_rng(2)
    a = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    lam = 0.2
    want = (1 - lam) * float(l1_loss(a, b)) + lam * (1.0 - float(ssim(a, b)))
    assert float(photometric_loss(a, b, lam)) == pytest.approx(want, rel=1e-6)
    assert float(psnr(a, a)) > 100.0


def test_blur_prec_lever_subprocess():
    """GSPLAT_BLUR_PREC wiring: 'high' imports and computes the same SSIM as
    the default on CPU (precision flags are MXU pass counts — no-ops off-TPU,
    so this validates the lever plumbing, not the numerics, which are A/B'd
    and gated on hardware — BASELINE.md round 5); a bad value must
    fail loudly at import."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.path.insert(0, %r);"
        "import numpy as np;"
        "from gsplat_tpu.train.loss import ssim, _BLUR_PREC;"
        "assert _BLUR_PREC == jax.lax.Precision.HIGH, _BLUR_PREC;"
        "rng = np.random.default_rng(0);"
        "a = rng.uniform(0, 1, (32, 48, 3)).astype(np.float32);"
        "b = rng.uniform(0, 1, (32, 48, 3)).astype(np.float32);"
        "print('SSIM', float(ssim(a, b)))"
    ) % str(repo)
    env = dict(os.environ, GSPLAT_BLUR_PREC="high", JAX_PLATFORMS="cpu")
    p = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=600,
                       cwd=str(repo))
    assert p.returncode == 0 and "SSIM" in p.stdout, (
        p.stdout[-2000:], p.stderr[-3000:])
    got = float(p.stdout.split("SSIM", 1)[1])
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (32, 48, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (32, 48, 3)).astype(np.float32)
    assert got == pytest.approx(float(ssim(a, b)), abs=1e-6)

    env["GSPLAT_BLUR_PREC"] = "bogus"
    p = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=600,
                       cwd=str(repo))
    assert p.returncode != 0 and "GSPLAT_BLUR_PREC" in p.stderr
