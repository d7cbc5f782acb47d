"""Minimal torchvision.transforms for the reference dataset's code paths.

The fake `null` dataset emits clips already at crop_size, so
Resize(min-side == size) and CenterCrop(size) are identities there; both
are still implemented generally. Random/augmentation transforms raise if
actually invoked (the harness runs with rand_flip='no', rand_augment='no').
"""
import enum

import torch
import torch.nn.functional as F


class InterpolationMode(str, enum.Enum):
    NEAREST = "nearest"
    BILINEAR = "bilinear"
    BICUBIC = "bicubic"


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


class Resize:
    """Resize so the SHORT side equals `size` (int), keeping aspect."""

    def __init__(self, size, interpolation=InterpolationMode.BILINEAR,
                 antialias=None):
        self.size = size

    def __call__(self, x):  # [..., H, W]
        h, w = x.shape[-2], x.shape[-1]
        if isinstance(self.size, (tuple, list)):
            nh, nw = self.size
        else:
            s = self.size
            if min(h, w) == s:
                return x
            if h < w:
                nh, nw = s, max(1, round(w * s / h))
            else:
                nh, nw = max(1, round(h * s / w)), s
        if (nh, nw) == (h, w):
            return x
        shape = x.shape
        flat = x.reshape(-1, 1, h, w).float()
        out = F.interpolate(flat, size=(nh, nw), mode="bilinear",
                            antialias=True, align_corners=False)
        return out.reshape(*shape[:-2], nh, nw).to(x.dtype)


class CenterCrop:
    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, x):
        th, tw = self.size
        h, w = x.shape[-2], x.shape[-1]
        i = max(0, (h - th) // 2)
        j = max(0, (w - tw) // 2)
        return x[..., i : i + th, j : j + tw]


class _RaiseOnUse:
    _name = "transform"

    def __init__(self, *a, **k):
        pass

    def __call__(self, x):
        raise RuntimeError(
            f"torchvision stub: {type(self).__name__} is not implemented "
            "(the parity harness must run without augmentation)"
        )


class RandomResizedCrop(_RaiseOnUse):
    pass


class RandomHorizontalFlip(_RaiseOnUse):
    pass


class RandAugment(_RaiseOnUse):
    pass


class Normalize:
    def __init__(self, mean, std, inplace=False):
        self.mean = torch.tensor(mean).view(-1, 1, 1)
        self.std = torch.tensor(std).view(-1, 1, 1)

    def __call__(self, x):
        return (x - self.mean.to(x)) / self.std.to(x)


class ToTensor:
    def __call__(self, x):
        return torch.as_tensor(x)


class Lambda:
    def __init__(self, fn):
        self.fn = fn

    def __call__(self, x):
        return self.fn(x)
