"""Convert MILO.pth (torch state dict) to a Flax .npz for metrics/milo.py.

The reference downloads the checkpoint from
github.com/ugurcogalan06/MILO at import time
(reference models/model_titok/metrics/milo.py:70-74). When you have the
file, run:

    python tools/convert_milo.py MILO.pth milo.npz

then `MILOCalculator(weights_path="milo.npz")`.

Mapping (see metrics/milo.py::load_torch_milo_state_dict):
  mask_finder_1.netBasic.{0,2,4,6,8}.weight [O,I,3,3] -> conv{0..4} HWIO
  scaler_network.model.{0,2,4}.weight       [O,I,1,1] -> conv{0..2} HWIO
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def convert(in_path: str, out_path: str):
    import torch

    sd = torch.load(in_path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.detach().numpy() for k, v in sd.items()}

    from video_tokenizer_tpu.metrics.milo import load_torch_milo_state_dict

    variables = load_torch_milo_state_dict(sd)
    np.savez(out_path, params=np.asarray(variables["params"], dtype=object))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2])
