"""Convert the reference's I3D TorchScript blob to Flax .npz weights.

The reference FVD stack loads `utils/fvd/i3d_torchscript.pt`
(universome/fvd-comparison, stripped from the repo — see
/root/reference/.MISSING_LARGE_BLOBS). When you have the file (public
Dropbox URL at /root/reference/utils/fvd/fvd.py:328), run:

    python tools/convert_i3d.py i3d_torchscript.pt \
        video_tokenizer_tpu/metrics/i3d_weights.npz

and FVDCalculator will pick the weights up automatically. torch-cpu only.
"""
from __future__ import annotations

import re
import sys

import numpy as np


def convert(in_path: str, out_path: str):
    import torch

    ts = torch.jit.load(in_path, map_location="cpu")
    sd = {k: v.detach().numpy() for k, v in ts.state_dict().items()}

    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    unit_re = re.compile(
        r"(?P<block>[A-Za-z0-9_]+)\.(?:(?P<branch>b[0-3][ab]?|branch\w*)\.)?"
    )

    for key, val in sd.items():
        # torchscript module paths look like:
        #   Conv3d_1a_7x7.conv3d.weight / ...bn.weight / ...bn.running_mean
        #   Mixed_3b.b0.conv3d.weight  (branch names b0, b1a, b1b, b2a, b2b, b3b)
        parts = key.split(".")
        # normalize branch names to our module names
        mapped = []
        for p in parts[:-1]:
            m = {
                "b0": "Branch_0", "b1a": "Branch_1a", "b1b": "Branch_1b",
                "b2a": "Branch_2a", "b2b": "Branch_2b", "b3b": "Branch_3b",
            }.get(p, p)
            mapped.append(m)
        leaf = parts[-1]
        if leaf == "weight" and "conv3d" in mapped:
            # torch conv3d OIDHW -> flax DHWIO
            put(params, mapped + ["kernel"], np.transpose(val, (2, 3, 4, 1, 0)))
        elif leaf == "bias" and "conv3d" in mapped:
            put(params, mapped + ["bias"], val)
        elif "bn" in mapped and leaf == "weight":
            put(params, mapped + ["scale"], val)
        elif "bn" in mapped and leaf == "bias":
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
