"""Convert a VJEPA2 ViT (torch state dict) to Flax .npz for the VFM teacher.

The reference's larp_tokenizer_vfm imports the external `vjepa2` package and
loads `vit_huge_rope` weights (reference models/larp_tokenizer_vfm.py:19-21)
— neither the package nor the checkpoint ship with the repo. When you have
the torch checkpoint, run:

    python tools/convert_vjepa2.py vjepa2_vit_huge.pt teacher.npz

then pass the npz to `models.vfm.load_teacher_weights(variables, path)`.

Mapping (torch -> models/vfm.py::VJEPA2TeacherViT):
  patch_embed.proj.weight [D,C,pt,p,p] -> 'patch_embed' Dense kernel
      [(c pt p1 p2), D]  (flatten order matches the einops rearrange)
  blocks.{i}.norm1.{weight,bias}       -> norm1_{i} scale/bias
  blocks.{i}.attn.qkv.{weight,bias}    -> qkv_{i}  kernel [D,3D]/bias
  blocks.{i}.attn.proj.{weight,bias}   -> proj_{i}
  blocks.{i}.norm2.{weight,bias}       -> norm2_{i}
  blocks.{i}.mlp.fc1/fc2.{weight,bias} -> fc1_{i}/fc2_{i}
Dense kernels transpose from torch [out,in] to flax [in,out]. The final
norm / predictor / mask tokens are dropped — the teacher taps intermediate
blocks only (vfm.py out_layers).
"""
from __future__ import annotations

import re
import sys

import numpy as np


def convert(in_path: str, out_path: str):
    import torch

    sd = torch.load(in_path, map_location="cpu")
    for key in ("encoder", "target_encoder", "model", "state_dict"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    sd = {
        k.replace("module.", "").replace("backbone.", ""): v.detach().numpy()
        for k, v in sd.items()
    }

    params: dict = {}

    def dense(prefix, w_key, b_key=None):
        params[prefix] = {"kernel": np.ascontiguousarray(sd[w_key].T)}
        if b_key and b_key in sd:
            params[prefix]["bias"] = sd[b_key]

    # patch embed: Conv3d [D, C, pt, p, p] -> Dense [(c pt p1 p2), D]
    w = sd["patch_embed.proj.weight"]
    D = w.shape[0]
    params["patch_embed"] = {
        "kernel": np.ascontiguousarray(w.reshape(D, -1).T),
        "bias": sd.get("patch_embed.proj.bias", np.zeros(D, np.float32)),
    }

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
