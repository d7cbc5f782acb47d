"""Convert DINO-small ViT (torch state dict) to Flax .npz for DinoDisc.

The reference downloads `dino_deitsmall16_pretrain.pth` from torch hub
(reference models/discriminators.py:188). When you have the file, run:

    python tools/convert_dino.py dino_deitsmall16_pretrain.pth dino.npz

then `models.discriminators.load_dino_weights(variables, path)`.

Mapping (torch timm-style ViT-S/16 -> models/discriminators.py::FrozenDINOSmall):
  patch_embed.proj.weight [D,C,p,p] -> 'patch_embed' Dense kernel
      [(p1 p2 c), D]  — note the flatten order: the Flax port rearranges
      pixels as "(p1 p2 c)", so the conv weight transposes to (p,p,C) first.
  cls_token / pos_embed              -> same names
  blocks.{i}.norm1/attn.qkv/attn.proj/norm2/mlp.fc1/mlp.fc2 -> *_{i}
  x_scale/x_shift: DinoDisc feeds [-1,1] frames; DINO expects ImageNet-
      normalized [0,1] images, so x_norm = x*(0.5/std) + (0.5-mean)/std.
The final `norm` and head are dropped — the discriminator taps block
activations only (key_depths).
"""
from __future__ import annotations

import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_IMNET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMNET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def convert(in_path: str, out_path: str):
    import torch

    sd = torch.load(in_path, map_location="cpu")
    for key in ("teacher", "student", "model", "state_dict"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    sd = {
        k.replace("module.", "").replace("backbone.", ""): v.detach().numpy()
        for k, v in sd.items()
    }

    params: dict = {
        "x_scale": 0.5 / _IMNET_STD,
        "x_shift": (0.5 - _IMNET_MEAN) / _IMNET_STD,
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
    }

    w = sd["patch_embed.proj.weight"]  # [D, C, p, p]
    D = w.shape[0]
    params["patch_embed"] = {
        # (p1 p2 c) flatten order
        "kernel": np.ascontiguousarray(
            w.transpose(0, 2, 3, 1).reshape(D, -1).T
        ),
        "bias": sd.get("patch_embed.proj.bias", np.zeros(D, np.float32)),
    }

    def dense(prefix, w_key, b_key):
        params[prefix] = {"kernel": np.ascontiguousarray(sd[w_key].T)}
        if b_key in sd:
            params[prefix]["bias"] = sd[b_key]

    n_blocks = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"blocks\.(\d+)\.", k))
    )
    for i in range(n_blocks):
        p = f"blocks.{i}."
        params[f"norm1_{i}"] = {
            "scale": sd[p + "norm1.weight"], "bias": sd[p + "norm1.bias"]
        }
        dense(f"qkv_{i}", p + "attn.qkv.weight", p + "attn.qkv.bias")
        dense(f"proj_{i}", p + "attn.proj.weight", p + "attn.proj.bias")
        params[f"norm2_{i}"] = {
            "scale": sd[p + "norm2.weight"], "bias": sd[p + "norm2.bias"]
        }
        dense(f"fc1_{i}", p + "mlp.fc1.weight", p + "mlp.fc1.bias")
        dense(f"fc2_{i}", p + "mlp.fc2.weight", p + "mlp.fc2.bias")

    np.savez(out_path, params=np.asarray(params, dtype=object))
    print(f"wrote {out_path}: {n_blocks} blocks, dim {D}")


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2])
