"""Tokenizer reconstruction eval CLI.

Re-expresses `/root/reference/eval/eval_larp_tokenizer.py`. Golden outputs for
the public LARP-L-long-tokenizer on UCF-101 val (16x128x128, deterministic VQ),
from the reference docstring (eval_larp_tokenizer.py:86-89) — reproducing them
requires converted reference weights + pretrained I3D/LPIPS weights:

    mse:   0.00177
    psnr:  28.70
    rfvd:  19.53
    lpips: 0.0755

Usage:
  python eval/eval_larp_tokenizer.py --tokenizer <ckpt_dir> \
      --csv_path data/metadata/ucf101_val.csv --frames 16 --input_size 128
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

import video_tokenizer_tpu.models  # noqa: F401,E402
import video_tokenizer_tpu.data  # noqa: F401,E402
from video_tokenizer_tpu.registry import datasets  # noqa: E402
from video_tokenizer_tpu.utils.model_io import load_model_from_checkpoint  # noqa: E402
from rfvd_evaluator import UCFrFVDEvaluator  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    # --dataset_csv/--num_frames/--use_amp/--det/... are the reference CLI's
    # spellings (reference eval_larp_tokenizer.py:19-30), accepted so its
    # eval commands run unchanged
    ap.add_argument("--tokenizer", required=True, help="checkpoint directory")
    ap.add_argument("--version", default="sd")
    ap.add_argument("--csv_path", "--dataset_csv",
                    default="data/metadata/ucf101_val.csv")
    ap.add_argument("--root_path", default="data/metadata")
    ap.add_argument("--frames", "--num_frames", type=int, default=16)
    ap.add_argument("--input_size", type=int, default=128)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--num_workers", type=int, default=4)
    ap.add_argument("--i3d_weights", default=None)
    ap.add_argument("--max_batches", type=int, default=None)
    ap.add_argument("--no_fvd", action="store_true",
                    help="skip I3D feature extraction and the FVD score "
                         "(MSE/PSNR/LPIPS only)")
    ap.add_argument("--use_amp", action="store_true",
                    help="reference AMP flag: casts params to bfloat16 for "
                         "the forward (fp16 has no TPU advantage; metric "
                         "math stays fp32 either way)")
    ap.add_argument("--amp_dtype", default="bfloat16",
                    help="accepted for reference CLI compat; any value runs "
                         "as bfloat16 on TPU")
    ap.add_argument("--compile", action="store_true",
                    help="accepted for reference CLI compat; everything is "
                         "already jit-compiled")
    ap.add_argument("--det", action="store_true",
                    help="accepted for reference CLI compat; encode_eval is "
                         "always deterministic here (stochastic VQ is a "
                         "train-mode-only path)")
    ap.add_argument("--token_subsample", type=int, default=None)
    ap.add_argument("--repeat_to_16", action="store_true",
                    help="repeat <16-frame clips to 16 for the I3D stats "
                         "(reference rfvd_evaluator.py:28); auto-enabled "
                         "below 10 frames, where I3D cannot run at all")
    args = ap.parse_args()
    if args.token_subsample is not None:
        raise SystemExit(
            "--token_subsample is not supported: no registered model's "
            "decode() takes it (true of the reference too — its flag is "
            "non-functional, eval/rfvd_evaluator.py:109-110)."
        )

    model, params = load_model_from_checkpoint(args.tokenizer, args.version)
    if args.use_amp:
        import jax.numpy as jnp

        params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16)
            if jnp.issubdtype(p.dtype, jnp.floating) else p,
            params,
        )
    dataset = datasets.make(
        {
            "name": "video_dataset",
            "args": {
                "root_path": args.root_path,
                "csv_file": args.csv_path,
                "frame_num": args.frames,
                "crop_size": args.input_size,
                "cls_vid_num": "-1_-1",
                "split": "test",
                "use_all_frames": False,
            },
        }
    )
    evaluator = UCFrFVDEvaluator(
        model, {"params": params}, dataset,
        batch_size=args.batch_size, num_workers=args.num_workers,
        i3d_weights=args.i3d_weights,
        repeat_to_16_frames=args.repeat_to_16 or args.frames < 10,
        compute_fvd=not args.no_fvd,
    )
    results = evaluator.evaluate(max_batches=args.max_batches)
    for k, v in results.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
