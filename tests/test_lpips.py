"""LPIPS-VGG16: JAX forward vs an independent torch-functional oracle on
synthetic weights, plus the weight-loading formats (.pth state_dict / .npz)."""

import numpy as np
import pytest

from gsplat_tpu.lpips import (
    TAP_CHANNELS, VGG16_SLICES, load_lpips_weights, lpips,
)

torch = pytest.importorskip("torch")


def _rand_vgg_state(rng):
    """torchvision-vgg16-shaped features.* state_dict with random weights."""
    cfg_in = 3
    sd = {}
    for sl in VGG16_SLICES:
        for i in sl:
            # channel count of this conv = the slice's tap width
            pass
    # conv output channels per torchvision index
    out_ch = {0: 64, 2: 64, 5: 128, 7: 128, 10: 256, 12: 256, 14: 256,
              17: 512, 19: 512, 21: 512, 24: 512, 26: 512, 28: 512}
    in_ch = cfg_in
    for i in sorted(out_ch):
        oc = out_ch[i]
        sd[f"features.{i}.weight"] = rng.normal(
            0, 0.08, (oc, in_ch, 3, 3)).astype(np.float32)
        sd[f"features.{i}.bias"] = rng.normal(0, 0.02, (oc,)).astype(np.float32)
        in_ch = oc
    return sd


def _rand_lin_state(rng):
    return {
        f"lin{k}.model.1.weight":
            rng.uniform(0, 0.1, (1, ch, 1, 1)).astype(np.float32)
        for k, ch in enumerate(TAP_CHANNELS)
    }


def _torch_oracle(vgg_sd, lin_sd, img0, img1):
    """Independent re-statement of the LPIPS scoring function with
    torch.nn.functional — mirrors lpips.LPIPS(net='vgg') eval semantics."""
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def prep(im):
        x = torch.from_numpy(im).permute(2, 0, 1)[None] * 2.0 - 1.0
        return (x - shift) / scale

    def taps(x):
        out = []
        for si, sl in enumerate(VGG16_SLICES):
            if si > 0:
                x = F.max_pool2d(x, 2)
            for i in sl:
                w = torch.from_numpy(vgg_sd[f"features.{i}.weight"])
                b = torch.from_numpy(vgg_sd[f"features.{i}.bias"])
                x = F.relu(F.conv2d(x, w, b, padding=1))
            out.append(x)
        return out

    def norm(f):
        return f / torch.sqrt((f * f).sum(1, keepdim=True) + 1e-10)

    total = 0.0
    for k, (t0, t1) in enumerate(zip(taps(prep(img0)), taps(prep(img1)))):
        d = (norm(t0) - norm(t1)) ** 2
        lw = torch.from_numpy(lin_sd[f"lin{k}.model.1.weight"])
        total += (lw * d).sum(1, keepdim=True).mean().item()
    return total


@pytest.fixture(scope="module")
def synthetic_weights(tmp_path_factory):
    rng = np.random.default_rng(7)
    vgg_sd, lin_sd = _rand_vgg_state(rng), _rand_lin_state(rng)
    d = tmp_path_factory.mktemp("lpips")
    torch.save({k: torch.from_numpy(v) for k, v in vgg_sd.items()}, d / "vgg16.pth")
    np.savez(d / "lin.npz", **lin_sd)
    return vgg_sd, lin_sd, d


def test_lpips_matches_torch_oracle(synthetic_weights):
    vgg_sd, lin_sd, d = synthetic_weights
    params = load_lpips_weights(d / "vgg16.pth", d / "lin.npz")
    rng = np.random.default_rng(3)
    img0 = rng.uniform(0, 1, (64, 96, 3)).astype(np.float32)
    img1 = np.clip(img0 + rng.normal(0, 0.1, img0.shape), 0, 1).astype(np.float32)
    got = float(lpips(params, img0, img1))
    want = _torch_oracle(vgg_sd, lin_sd, img0, img1)
    assert got == pytest.approx(want, rel=2e-4), (got, want)


def test_lpips_properties(synthetic_weights):
    _, _, d = synthetic_weights
    params = load_lpips_weights(d / "vgg16.pth", d / "lin.npz")
    rng = np.random.default_rng(5)
    a = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    assert float(lpips(params, a, a)) == pytest.approx(0.0, abs=1e-6)
    d_ab = float(lpips(params, a, b))
    assert d_ab > 0
    assert float(lpips(params, b, a)) == pytest.approx(d_ab, rel=1e-5)


def test_metrics_cli_lpips_slot(synthetic_weights, tmp_path):
    """metrics_cli fills the LPIPS slot when weights are supplied."""
    from PIL import Image

    from gsplat_tpu.metrics_cli import main

    _, _, d = synthetic_weights
    rng = np.random.default_rng(11)
    mdir = tmp_path / "model" / "test" / "ours_10"
    for sub in ("renders", "gt"):
        (mdir / sub).mkdir(parents=True)
        arr = (rng.uniform(0, 1, (32, 32, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(mdir / sub / "00000.png")
    assert main(["-m", str(tmp_path / "model"),
                 "--lpips_vgg", str(d / "vgg16.pth"),
                 "--lpips_lin", str(d / "lin.npz")]) == 0
    import json

    res = json.loads((tmp_path / "model" / "results.json").read_text())
    val = res["test/ours_10"]["LPIPS"]
    assert val is not None and val > 0
