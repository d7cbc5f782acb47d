"""InceptionV3 (pytorch-fid variant) feature extractor in Flax.

Replaces `/root/reference/utils/fid/inception.py` (347 LoC torchvision port
with the FID-specific pooling tweaks): TF-Inception-v3 trunk returning the
2048-d final-avgpool features. Weight layout mirrors torchvision
`inception_v3` so `tools/convert_inception.py` can import the pytorch-fid
weights file when available; random init otherwise (smoke-test only).

Input convention (pytorch-fid): [0,1] images, resized to 299x299, then
normalized to [-1,1].
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class BasicConv2d(nn.Module):
    out_channels: int
    kernel: tuple = (3, 3)
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x):
        p = self.padding
        if isinstance(p, int):
            pad = ((p, p), (p, p))
        else:
            pad = p
        x = nn.Conv(
            self.out_channels, self.kernel, strides=(self.stride, self.stride),
            padding=pad, use_bias=False, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-3, name="bn"
        )(x)
        return nn.relu(x)


def _avg_pool_novalid(x, window=3, stride=1, pad=1):
    """avg_pool with count_include_pad=False (the FID tweak)."""
    ones = jnp.ones_like(x[..., :1])
    summed = nn.avg_pool(
        x, (window, window), strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
    ) * (window * window)
    counts = nn.avg_pool(
        ones, (window, window), strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
    ) * (window * window)
    return summed / counts


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = _avg_pool_novalid(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_novalid(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_type: str = "avg"  # FID variant uses avg in both E blocks... torchvision E2 uses max

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_type == "max":
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        else:
            bp = _avg_pool_novalid(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Returns 2048-d pool features. Input: NHWC 299x299 in [-1, 1]."""

    @nn.compact
    def __call__(self, x):
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        # pytorch-fid's FIDInceptionE_2 (Mixed_7c) keeps MAX pooling — its
        # source comments this is "likely an error" vs the paper, but the
        # FID weights were trained with it (reference utils/fid/
        # inception.py:339-344), so parity requires max here
        x = InceptionE("max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # [B, 2048]


class InceptionFeatureExtractor:
    def __init__(self, weights_path: Optional[str] = None):
        self.model = InceptionV3()
        self.pretrained = False
        if weights_path is not None:
            data = np.load(weights_path, allow_pickle=True)
            self.variables = jax.tree_util.tree_map(
                jnp.asarray, data["variables"].item()
            )
            self.pretrained = True
        else:
            self.variables = self.model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3))
            )
        self._fn = jax.jit(self._features)

    def _features(self, variables, images):
        # images: [B, C, H, W] in [0, 1]
        x = jnp.transpose(images, (0, 2, 3, 1))
        B, H, W, C = x.shape
        if (H, W) != (299, 299):
            # plain bilinear, no antialias prefilter (reference torch
            # interpolate default)
            x = jax.image.resize(
                x, (B, 299, 299, C), method="bilinear", antialias=False
            )
        x = x * 2.0 - 1.0
        return self.model.apply(variables, x)

    def __call__(self, images):
        return self._fn(self.variables, jnp.asarray(images))
