"""LPIPS perceptual metric (VGG16 backbone) in Flax.

Replaces the torch `lpips.LPIPS(net='vgg')` dependency
(`/root/reference/models/loss.py:241`, `eval/rfvd_evaluator.py:50`): VGG16
features tapped at relu1_2/relu2_2/relu3_3/relu4_3/relu5_3, channel-unit
normalization, frozen 1x1 linear calibration heads, spatial mean, layer sum.

Pretrained VGG + calibration weights cannot be downloaded in this environment;
parameters initialize randomly and can be replaced via
`load_torch_lpips_state_dict` (accepts the `lpips` package's pickled state
dict) for metric-exact evaluation. Training with uncalibrated weights still
provides a meaningful random-feature perceptual loss but is NOT directly
comparable to reference LPIPS numbers — load real weights for parity runs.

Input convention matches `lpips(x, y, normalize=True)`: inputs in [0, 1].
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# VGG16 conv plan: channel counts per conv, 'M' = maxpool
_VGG16_PLAN = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512]
# indices (into conv list) after which features are tapped
_TAP_AFTER_CONV = [1, 3, 6, 9, 12]  # relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
_TAP_CHANNELS = [64, 128, 256, 512, 512]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 trunk returning the five LPIPS tap activations. Input: NHWC in [-1,1]."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        x = (x - _SHIFT) / _SCALE
        taps = []
        conv_i = 0
        for item in _VGG16_PLAN:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(
                    item, (3, 3), padding=1, dtype=self.dtype,
                    name=f"conv{conv_i}",
                )(x)
                x = nn.relu(x)
                if conv_i in _TAP_AFTER_CONV:
                    taps.append(x)
                conv_i += 1
        return taps


class LPIPS(nn.Module):
    """Learned perceptual distance. Inputs NCHW or NHWC frames in [0,1]."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array, normalize: bool = True):
        if x.shape[1] == 3 and x.shape[-1] != 3:  # NCHW -> NHWC
            x = jnp.transpose(x, (0, 2, 3, 1))
            y = jnp.transpose(y, (0, 2, 3, 1))
        if normalize:  # [0,1] -> [-1,1]
            x = 2.0 * x - 1.0
            y = 2.0 * y - 1.0
        net = VGG16Features(dtype=self.dtype, name="net")
        fx = net(x)
        fy = net(y)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            diff = (a - b) ** 2
            w = self.param(
                f"lin{i}",
                nn.initializers.ones,
                (1, 1, 1, _TAP_CHANNELS[i]),
            )
            # frozen 1x1 conv head -> spatial mean
            d = jnp.mean(jnp.sum(diff * jnp.abs(w), axis=-1), axis=(1, 2))
            total = total + d
        return total  # [B]


def load_torch_lpips_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Convert the torch `lpips` package state dict to our Flax params tree.

    Torch keys: net.slice{1..5}.{idx}.weight/bias (VGG convs, OIHW) and
    lin{0..4}.model.1.weight ([1, C, 1, 1]).
    """
    params: Dict[str, Any] = {"net": {}}
    # VGG torchvision features indices for conv layers:
    tv_conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    # the lpips package builds each sliceN with add_module(str(x), ...)
    # where x is the GLOBAL torchvision feature index (lpips
    # pretrained_networks.py vgg16) — e.g. net.slice2.5.weight is feature 5.
    # The in-slice number therefore IS the tv index; do NOT add an offset.
    conv_map = {}
    for k, v in sd.items():
        if not k.startswith("net."):
            continue
        parts = k.split(".")  # e.g. net.slice1.0.weight
        tv_index = int(parts[2])
        if tv_index in tv_conv_idx and parts[3] in ("weight", "bias"):
            ci = tv_conv_idx.index(tv_index)
            conv_map.setdefault(ci, {})[parts[3]] = np.asarray(v)
    if conv_map and len(conv_map) != len(tv_conv_idx):
        raise ValueError(
            f"LPIPS conversion mapped {len(conv_map)}/13 VGG convs — "
            "unexpected state-dict layout"
        )
    for ci, wb in conv_map.items():
        entry = {}
        if "weight" in wb:
            entry["kernel"] = np.transpose(wb["weight"], (2, 3, 1, 0))  # OIHW->HWIO
        if "bias" in wb:
            entry["bias"] = wb["bias"]
        params["net"][f"conv{ci}"] = entry
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        if key in sd:
            w = np.asarray(sd[key])  # [1, C, 1, 1]
            params[f"lin{i}"] = w.reshape(1, 1, 1, -1)
    return params
