"""Convert a torch `lpips` package state dict to Flax LPIPS params.

When the lpips VGG weights file is available (pip `lpips` caches it at
`lpips/weights/v0.1/vgg.pth`, VGG16 backbone from torchvision):

    python tools/convert_lpips.py lpips_vgg_full_state_dict.pt out.npz

The input must be a full LPIPS state dict (backbone + lin heads), e.g. saved
via `torch.save(lpips.LPIPS(net='vgg').state_dict(), ...)` on a machine with
downloads available. torch-cpu only.
"""
from __future__ import annotations

import sys

import numpy as np


def convert(in_path: str, out_path: str):
    import torch

    sd = torch.load(in_path, map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items()}

    sys.path.insert(0, ".")
    from video_tokenizer_tpu.models.lpips import load_torch_lpips_state_dict

    params = load_torch_lpips_state_dict(sd)
    np.savez(out_path, params=np.asarray({"params": params}, dtype=object))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2])
