"""MILO masked perceptual metric (https://github.com/ugurcogalan06/MILO).

Re-expresses `/root/reference/models/model_titok/metrics/milo.py:22-129` in
Flax. The reference downloads `MILO.pth` at import time; this environment has
no network egress, so weight loading is gated behind
`load_torch_milo_state_dict` / `MILOCalculator(weights_path=...)` (same
pattern as LPIPS/DINO/I3D). The architecture itself is fully implemented and
runs with random weights for tests.

Structure (reference line numbers):
  * ScalerNetwork (milo.py:22-36): 1x1 conv MLP 1->32->32->1, LeakyReLU(0.2),
    sigmoid. Present in the checkpoint and instantiated by the reference but
    NOT used in its forward; kept here so `load_state_dict(strict=True)`
    parity holds through the converter.
  * MaskFinder (milo.py:39-62): five 3x3 convs 7->32->64->32->16->1 with
    ReLU, then sigmoid — predicts a visibility mask from
    [reference frame, distorted frame, upsampled coarser mask].
  * mask_generator (milo.py:88-118): 4-level pyramid. Three 2x2 avg-pool
    downscales, then coarse-to-fine: upsample the running mask 2x (bilinear,
    align_corners=True — reimplemented exactly; `jax.image.resize` uses
    half-pixel sampling), replicate-pad on odd sizes, and refine with
    `mask = MaskFinder(cat(ref, dist, up)) + up`.
  * forward (milo.py:121-127): clamp inputs to [-1, 1], map to [0, 1],
    score = mean(mask * |x - y|). We return per-sample means; the
    reference's scalar is `scores.mean()`.

Layout: NHWC internally (TPU conv layout); the public API takes the
reference's [B, C, H, W].
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _upsample2x_align_corners(x: jax.Array) -> jax.Array:
    """2x bilinear upsample with torch's align_corners=True sampling grid.

    x: [B, H, W, C]. Output pixel i samples input position
    i * (H - 1) / (2H - 1) (corners map to corners), which differs from
    jax.image.resize's half-pixel-center convention.
    """

    def axis_resize(v, axis):
        n = v.shape[axis]
        if n == 1:
            return jnp.repeat(v, 2, axis=axis)
        pos = jnp.arange(2 * n, dtype=jnp.float32) * (n - 1) / (2 * n - 1)
        i0 = jnp.floor(pos).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, n - 1)
        w = (pos - i0).astype(v.dtype)
        shape = [1] * v.ndim
        shape[axis] = 2 * n
        w = w.reshape(shape)
        return jnp.take(v, i0, axis=axis) * (1 - w) + jnp.take(
            v, i1, axis=axis
        ) * w

    return axis_resize(axis_resize(x, 1), 2)


class ScalerNetwork(nn.Module):
    """1x1-conv scaler head (reference milo.py:22-36). Unused by the score
    path, retained for checkpoint parity."""

    chn_mid: int = 32

    @nn.compact
    def __call__(self, val: jax.Array) -> jax.Array:  # [B, H, W, 1]
        h = nn.Conv(self.chn_mid, (1, 1), name="conv0")(val)
        h = nn.leaky_relu(h, negative_slope=0.2)
        h = nn.Conv(self.chn_mid, (1, 1), name="conv1")(h)
        h = nn.leaky_relu(h, negative_slope=0.2)
        h = nn.Conv(1, (1, 1), name="conv2")(h)
        return nn.sigmoid(h)


class MaskFinder(nn.Module):
    """Visibility-mask CNN (reference milo.py:39-62)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, H, W, 7] -> [.., 1]
        for i, ch in enumerate((32, 64, 32, 16)):
            x = nn.Conv(ch, (3, 3), padding=1, name=f"conv{i}")(x)
            x = nn.relu(x)
        x = nn.Conv(1, (3, 3), padding=1, name="conv4")(x)
        return nn.sigmoid(x)


class MILO(nn.Module):
    """Masked-difference perceptual score (reference milo.py:65-127)."""

    number_of_scales: int = 3

    def setup(self):
        self.mask_finder_1 = MaskFinder()
        self.scaler_network = ScalerNetwork()

    def mask_generator(self, y: jax.Array, x: jax.Array) -> jax.Array:
        """y = distorted, x = reference, NHWC in [0, 1] -> mask [B, H, W, 1].

        Mirrors reference milo.py:88-118: build avg-pool pyramids of both
        inputs, then refine a zero-initialised mask coarse-to-fine.
        """
        ref_scale = [x]
        dist_scale = [y]
        for _ in range(self.number_of_scales):
            ref_scale.insert(
                0, nn.avg_pool(ref_scale[0], (2, 2), strides=(2, 2))
            )
            dist_scale.insert(
                0, nn.avg_pool(dist_scale[0], (2, 2), strides=(2, 2))
            )

        b, h0, w0, _ = ref_scale[0].shape
        mask = jnp.zeros((b, h0 // 2, w0 // 2, 1), ref_scale[0].dtype)
        for level in range(len(ref_scale)):
            up = _upsample2x_align_corners(mask)
            rh, rw = ref_scale[level].shape[1:3]
            if up.shape[1] != rh:  # odd-size replicate pad (milo.py:110-113)
                up = jnp.pad(up, ((0, 0), (0, 1), (0, 0), (0, 0)), "edge")
            if up.shape[2] != rw:
                up = jnp.pad(up, ((0, 0), (0, 0), (0, 1), (0, 0)), "edge")
            mask = self.mask_finder_1(
                jnp.concatenate([ref_scale[level], dist_scale[level], up], -1)
            ) + up
        return mask

    def __call__(self, y: jax.Array, x: jax.Array) -> jax.Array:
        """y = distorted, x = reference, [B, C, H, W] in [-1, 1] ->
        per-sample scores [B] (reference milo.py:121-127 returns the batch
        mean of this)."""
        x = (jnp.clip(x, -1, 1) + 1) / 2
        y = (jnp.clip(y, -1, 1) + 1) / 2
        x = jnp.transpose(x, (0, 2, 3, 1))
        y = jnp.transpose(y, (0, 2, 3, 1))
        # reference forward calls mask_generator(x, y) against the
        # (y=dist, x=ref) signature, i.e. pyramids are built with ref=y,
        # dist=x — mirrored verbatim.
        mask = self.mask_generator(x, y)
        return jnp.mean(mask * jnp.abs(x - y), axis=(1, 2, 3))


def load_torch_milo_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Map the reference MILO.pth state dict to this module's params.

    torch conv weights [O, I, kh, kw] -> HWIO kernels; biases pass through.
    Keys: mask_finder_1.netBasic.{0,2,4,6,8}.* (reference milo.py:44-53) and
    scaler_network.model.{0,2,4}.* (milo.py:26-30).
    """

    def conv(prefix):
        w = np.asarray(sd[prefix + ".weight"], np.float32)
        return {
            "kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
            "bias": np.asarray(sd[prefix + ".bias"], np.float32),
        }

    params = {
        "mask_finder_1": {
            f"conv{i}": conv(f"mask_finder_1.netBasic.{2 * i}")
            for i in range(5)
        },
        "scaler_network": {
            f"conv{i}": conv(f"scaler_network.model.{2 * i}")
            for i in range(3)
        },
    }
    return {"params": params}


class MILOCalculator:
    """Jitted per-sample MILO scores over [B, C, H, W] frames in [-1, 1].

    weights_path: .npz produced by tools/convert_milo.py (or None ->
    random-init refuse, matching the other weight-gated metrics).
    """

    def __init__(self, weights_path: Optional[str] = None):
        self.pretrained = weights_path is not None
        self.model = MILO()
        if self.pretrained:
            data = np.load(weights_path, allow_pickle=True)
            variables = jax.tree_util.tree_map(
                jnp.asarray, data["params"].item()
            )
            self._variables = {"params": variables}
            self._fn = jax.jit(self.model.apply)

    def __call__(self, y, x):
        if not self.pretrained:
            raise RuntimeError(
                "MILO weights are not available in this offline environment."
                " Convert MILO.pth with tools/convert_milo.py and pass "
                "weights_path."
            )
        return np.asarray(self._fn(self._variables, y, x))
