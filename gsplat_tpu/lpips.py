"""LPIPS (Learned Perceptual Image Patch Similarity), VGG16 variant, in JAX.

Upstream 3DGS `metrics.py` reports PSNR/SSIM/LPIPS via the `lpips` package
(richzhang/PerceptualSimilarity, net='vgg'); the reference repo has no metrics
tooling at all (SURVEY.md §0). This is a from-scratch JAX forward of the same
scoring function so the third metric is available when the user supplies the
two standard weight files (no pretrained weights ship in a hermetic offline
container, and random-init LPIPS is meaningless):

  1. torchvision VGG16 state_dict (`vgg16-397923af.pth`) — the backbone, and
  2. the lpips package's `vgg.pth` — the five learned 1x1 channel weightings.

Pass both through `load_lpips_weights(vgg_path, lin_path)` (torch CPU unpickles
them; .npz copies of the same tensors also work), then score with
`lpips(params, img0, img1)` on (H, W, 3) images in [0, 1].

Architecture (matches lpips.LPIPS(net='vgg', spatial=False), eval mode):
  scale inputs to [-1, 1], normalize by the fixed shift/scale layer, run VGG16
  features, tap relu1_2/relu2_2/relu3_3/relu4_3/relu5_3, unit-normalize each
  tap along channels, squared difference, learned 1x1 conv per tap, spatial
  mean, sum over taps.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np

# torchvision vgg16 `features.<i>` indices of the conv layers, grouped by the
# slice they belong to; each tap point is the ReLU after the group's last conv.
VGG16_SLICES: Tuple[Tuple[int, ...], ...] = (
    (0, 2),            # conv1_1 conv1_2 -> relu1_2   (64 ch)
    (5, 7),            # conv2_1 conv2_2 -> relu2_2   (128 ch)
    (10, 12, 14),      # conv3_*         -> relu3_3   (256 ch)
    (17, 19, 21),      # conv4_*         -> relu4_3   (512 ch)
    (24, 26, 28),      # conv5_*         -> relu5_3   (512 ch)
)
TAP_CHANNELS = (64, 128, 256, 512, 512)

# lpips.ScalingLayer constants (inputs already mapped to [-1, 1])
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return np.asarray(t, np.float32)
    return np.asarray(t.detach().cpu().numpy(), np.float32)  # torch tensor


def _load_state_dict(path: Path) -> Dict[str, np.ndarray]:
    path = Path(path)
    if path.suffix == ".npz":
        with np.load(path) as z:
            return {k: np.asarray(z[k], np.float32) for k in z.files}
    import torch  # CPU build is baked into the image

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: _to_numpy(v) for k, v in sd.items()}


def load_lpips_weights(vgg_path, lin_path) -> Dict[str, List[np.ndarray]]:
    """-> params dict: conv kernels/biases per slice + the five lin weights.

    `vgg_path`: torchvision vgg16 state_dict (keys `features.<i>.weight/bias`)
    or an .npz with the same keys. `lin_path`: lpips vgg.pth (keys
    `lin<k>.model.1.weight`, 1x1 convs, no bias) or an .npz with those keys.
    """
    vgg = _load_state_dict(vgg_path)
    lin = _load_state_dict(lin_path)

    convs: List[List[Tuple[np.ndarray, np.ndarray]]] = []
    for sl in VGG16_SLICES:
        layers = []
        for i in sl:
            w = vgg[f"features.{i}.weight"]  # (out, in, 3, 3) torch layout
            b = vgg[f"features.{i}.bias"]
            layers.append((w, b))
        convs.append(layers)

    lins = []
    for k, ch in enumerate(TAP_CHANNELS):
        key = f"lin{k}.model.1.weight"
        w = lin[key].reshape(1, ch, 1, 1)  # (1, ch, 1, 1)
        lins.append(w)
    return {"convs": convs, "lins": lins}


def lpips(params, img0, img1):
    """LPIPS distance between two (H, W, 3) images in [0, 1]. Returns a scalar
    jnp array; jit-compatible for fixed image shapes."""
    import jax.numpy as jnp
    from jax import lax

    def prep(im):
        x = jnp.asarray(im, jnp.float32) * 2.0 - 1.0          # [-1, 1]
        x = (x - _SHIFT) / _SCALE
        return jnp.transpose(x, (2, 0, 1))[None]               # (1, 3, H, W)

    def conv(x, w, b):
        # HIGHEST: TPU convs default to bf16 input truncation, which compounds
        # through 13 layers and shifts the metric by scene-quality magnitudes
        y = lax.conv_general_dilated(
            x, jnp.asarray(w), window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=lax.Precision.HIGHEST,
        )
        return jnp.maximum(y + jnp.asarray(b)[None, :, None, None], 0.0)

    def pool(x):
        return lax.reduce_window(
            x, -jnp.inf, lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
        )

    def taps(x):
        out = []
        for si, layers in enumerate(params["convs"]):
            if si > 0:
                x = pool(x)
            for w, b in layers:
                x = conv(x, w, b)
            out.append(x)
        return out

    def unit_norm(f):
        return f * lax.rsqrt(jnp.sum(f * f, axis=1, keepdims=True) + 1e-10)

    f0, f1 = taps(prep(img0)), taps(prep(img1))
    total = jnp.zeros((), jnp.float32)
    for t0, t1, lw in zip(f0, f1, params["lins"]):
        d = (unit_norm(t0) - unit_norm(t1)) ** 2                # (1, ch, h, w)
        val = jnp.sum(jnp.asarray(lw) * d, axis=1, keepdims=True)
        total = total + jnp.mean(val)
    return total
