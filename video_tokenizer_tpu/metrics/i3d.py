"""InceptionI3D (Kinetics-400) feature extractor in Flax, for FVD.

Replaces the TorchScript I3D blob the reference loads
(`/root/reference/utils/fvd/fvd.py:324-336`, the universome/fvd-comparison
`i3d_torchscript.pt`): same architecture (tf-hub I3D inflated Inception-v1,
BN+ReLU units, SAME padding), returning the 400-d logits used as FVD features
(`return_features=True` semantics), with input in [-1, 1] resized to 224x224
(`resize=True` semantics; resize happens on device via jax.image).

Pretrained weights cannot be downloaded here; convert them offline from the
torchscript blob with `tools/convert_i3d.py` (torch-cpu is available) into an
.npz and pass its path to `I3DFeatureExtractor`. Random-init features still
define a valid metric ordering for smoke tests but are NOT comparable to
reference FVD numbers.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class Unit3D(nn.Module):
    out_channels: int
    kernel: Sequence[int] = (1, 1, 1)
    stride: Sequence[int] = (1, 1, 1)
    use_bn: bool = True
    activation: bool = True
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        # x: [B, T, H, W, C]; SAME padding like the tf-hub original
        x = nn.Conv(
            self.out_channels, tuple(self.kernel), strides=tuple(self.stride),
            padding="SAME", use_bias=self.use_bias, name="conv3d",
        )(x)
        if self.use_bn:
            # inference-only extractor: running stats are baked parameters
            x = nn.BatchNorm(
                use_running_average=True, epsilon=1e-3, momentum=0.99,
                name="bn",
            )(x)
        if self.activation:
            x = nn.relu(x)
        return x


class InceptionBlock(nn.Module):
    b0: int
    b1a: int
    b1b: int
    b2a: int
    b2b: int
    b3b: int

    @nn.compact
    def __call__(self, x):
        br0 = Unit3D(self.b0, name="Branch_0")(x)
        br1 = Unit3D(self.b1a, name="Branch_1a")(x)
        br1 = Unit3D(self.b1b, (3, 3, 3), name="Branch_1b")(br1)
        br2 = Unit3D(self.b2a, name="Branch_2a")(x)
        br2 = Unit3D(self.b2b, (3, 3, 3), name="Branch_2b")(br2)
        br3 = nn.max_pool(
            x, (3, 3, 3), strides=(1, 1, 1), padding="SAME"
        )
        br3 = Unit3D(self.b3b, name="Branch_3b")(br3)
        return jnp.concatenate([br0, br1, br2, br3], axis=-1)


class InceptionI3D(nn.Module):
    """Returns 400-d logits (FVD features). Input: [B, T, H, W, C] in [-1,1]."""

    num_classes: int = 400

    @nn.compact
    def __call__(self, x):
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), name="Conv3d_1a_7x7")(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        x = Unit3D(64, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, (3, 3, 3), name="Conv3d_2c_3x3")(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        x = InceptionBlock(64, 96, 128, 16, 32, 32, name="Mixed_3b")(x)
        x = InceptionBlock(128, 128, 192, 32, 96, 64, name="Mixed_3c")(x)
        x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2), padding="SAME")
        x = InceptionBlock(192, 96, 208, 16, 48, 64, name="Mixed_4b")(x)
        x = InceptionBlock(160, 112, 224, 24, 64, 64, name="Mixed_4c")(x)
        x = InceptionBlock(128, 128, 256, 24, 64, 64, name="Mixed_4d")(x)
        x = InceptionBlock(112, 144, 288, 32, 64, 64, name="Mixed_4e")(x)
        x = InceptionBlock(256, 160, 320, 32, 128, 128, name="Mixed_4f")(x)
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2), padding="SAME")
        x = InceptionBlock(256, 160, 320, 32, 128, 128, name="Mixed_5b")(x)
        x = InceptionBlock(384, 192, 384, 48, 128, 128, name="Mixed_5c")(x)
        # reference head: avg_pool3d kernel (2,7,7) stride 1 — a spatial
        # mean (H'=W'=7 at 224 input) plus a kernel-2 stride-1 temporal
        # moving average — then the 1x1x1 logits conv, then time-mean.
        # (A plain time-mean is only equivalent when T'==2, i.e. 16 frames.)
        x = jnp.mean(x, axis=(2, 3), keepdims=True)  # [B, T', 1, 1, 1024]
        if x.shape[1] > 1:
            x = 0.5 * (x[:, 1:] + x[:, :-1])
        x = Unit3D(
            self.num_classes, use_bn=False, activation=False, use_bias=True,
            name="logits",
        )(x)
        return jnp.mean(x[:, :, 0, 0, :], axis=1)  # [B, 400]


class I3DFeatureExtractor:
    """Wraps InceptionI3D with [0,1]-video preprocessing and jit."""

    def __init__(self, weights_path: Optional[str] = None):
        self.model = InceptionI3D()
        self.pretrained = False
        if weights_path is not None:
            data = np.load(weights_path, allow_pickle=True)
            self.variables = jax.tree_util.tree_map(
                jnp.asarray, data["variables"].item()
            )
            self.pretrained = True
        else:
            dummy = jnp.zeros((1, 16, 224, 224, 3))
            self.variables = self.model.init(jax.random.PRNGKey(0), dummy)
        self._fn = jax.jit(self._features)

    def _features(self, variables, videos):
        # videos: [B, C, T, H, W] in [0, 1]
        x = jnp.transpose(videos, (0, 2, 3, 4, 1))  # BTHWC
        x = x * 2.0 - 1.0
        B, T, H, W, C = x.shape
        if (H, W) != (224, 224):
            # antialias=False: the reference TorchScript resize is plain
            # bilinear without an antialiasing prefilter
            x = jax.image.resize(
                x, (B, T, 224, 224, C), method="bilinear", antialias=False
            )
        return self.model.apply(variables, x)

    def __call__(self, videos) -> jax.Array:
        return self._fn(self.variables, jnp.asarray(videos))
