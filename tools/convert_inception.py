"""Convert pytorch-fid InceptionV3 weights to Flax .npz for the FID stack.

The reference FID stack (/root/reference/utils/fid/inception.py:30-40)
downloads `pt_inception-2015-12-05-6726825d.pth` — a torchvision
inception_v3 state dict with the FID-specific pooling tweaks (which are
architectural, not weight-bearing, so a plain state-dict remap suffices).
When you have the file (public GitHub release URL in that reference file),
run:

    python tools/convert_inception.py pt_inception-2015-12-05-6726825d.pth \
        video_tokenizer_tpu/metrics/inception_weights.npz

and `InceptionFeatureExtractor(weights_path=...)` picks it up. torch-cpu only.

Layout notes:
  torch `Mixed_5b.branch1x1.conv.weight` [O,I,kH,kW] -> flax
  `Mixed_5b/branch1x1/conv/kernel` [kH,kW,I,O]; BatchNorm weight/bias ->
  scale/bias in params; running_mean/var -> batch_stats mean/var. The
  classifier head (`fc.*`) and aux logits are dropped — the extractor stops
  at the 2048-d pool features (metrics/inception.py:166).
"""
from __future__ import annotations

import sys

import numpy as np


def convert(in_path: str, out_path: str):
    import torch

    sd = torch.load(in_path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.detach().numpy() for k, v in sd.items()}

    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    for key, val in sd.items():
        parts = key.split(".")
        if parts[0] in ("fc", "AuxLogits"):
            continue  # head not used for features
        if parts[-1] == "num_batches_tracked":
            continue
        # e.g. Mixed_5b.branch1x1.conv.weight -> [Mixed_5b, branch1x1, conv]
        # or   Conv2d_1a_3x3.conv.weight      -> [Conv2d_1a_3x3, conv]
        mapped, leaf = parts[:-1], parts[-1]
        if mapped and mapped[-1] == "conv" and leaf == "weight":
            put(params, mapped + ["kernel"], np.transpose(val, (2, 3, 1, 0)))
        elif mapped and mapped[-1] == "conv" and leaf == "bias":
            put(params, mapped + ["bias"], val)
        elif mapped and mapped[-1] == "bn" and leaf == "weight":
            put(params, mapped + ["scale"], val)
        elif mapped and mapped[-1] == "bn" and leaf == "bias":
            put(params, mapped + ["bias"], val)
        elif leaf == "running_mean":
            put(batch_stats, mapped + ["mean"], val)
        elif leaf == "running_var":
            put(batch_stats, mapped + ["var"], val)
        else:
            print(f"skipping unmapped key: {key}")

    variables = {"params": params, "batch_stats": batch_stats}
    np.savez(out_path, variables=np.asarray(variables, dtype=object))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2])
