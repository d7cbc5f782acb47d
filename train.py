"""Training launcher.

CLI-compatible re-expression of `/root/reference/train.py`: same flags
(`--cfg`, `--csv_file`, `-b`, `-j`, `--frame_num`, `--input_size`, `--opts`,
`--manualSeed`, `--tag`, `--out_path`, `--replace`, ...), same YAML `$var$`
substitution + dotted `--opts` merge. The mp.spawn-one-process-per-GPU fork
(train.py:162-169) is gone: ONE process per host runs the jitted SPMD program
over every local device; multi-host runs initialize jax.distributed from the
standard TPU environment.

Usage:
  python train.py --cfg cfgs/larp_tokenizer.yaml --csv_file null128 \
      -b 8 -j 4 --frame_num 16 --input_size 128 --opts max_epoch 10
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from video_tokenizer_tpu.config import load_config  # noqa: E402
from video_tokenizer_tpu.registry import trainers  # noqa: E402
import video_tokenizer_tpu.models  # noqa: F401,E402
import video_tokenizer_tpu.data  # noqa: F401,E402
import video_tokenizer_tpu.trainers  # noqa: F401,E402


def parse_args(args=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--data_path", default="data/k400")
    parser.add_argument("--csv_file", default="null128")
    parser.add_argument("--eval_frames", type=str, default="none")
    parser.add_argument("--frame_num", type=int, default=16)
    parser.add_argument("--input_size", type=int, default=128)
    parser.add_argument("--batch_size", "-b", type=int, default=16)
    parser.add_argument("--num_workers", "-j", type=int, default=16)
    parser.add_argument("--out_path", type=str, default="save/default")
    parser.add_argument("--name", "-n", default=None)
    parser.add_argument("--tag", type=str, default="")
    parser.add_argument("--replace", action="store_true")
    parser.add_argument("--opts", type=str, nargs="*", default=[])
    parser.add_argument("--manualSeed", type=int, default=-1)
    parser.add_argument("--comment", type=str, default="")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed for multi-host runs")
    # wandb knobs, CLI-compatible with the reference launcher
    # (reference train.py:36-38; `--wandn_entity` is the reference's own
    # spelling, accepted verbatim so its launch scripts run unchanged)
    parser.add_argument("--wandb-upload", "-w", dest="wandb_upload",
                        action="store_true")
    parser.add_argument("--wandb_entity", "--wandn_entity",
                        dest="wandb_entity", type=str, default=None)
    parser.add_argument("--wandb_project", type=str, default=None)
    return parser.parse_args(args)


def make_cfg(args):
    variables = {
        "csv_file": args.csv_file,
        "batch_size": args.batch_size,
        "num_workers": args.num_workers,
        "frame_num": args.frame_num,
        "input_size": args.input_size,
        "data_path": args.data_path,
        "eval_frames": args.eval_frames,
    }
    cfg = load_config(args.cfg, variables=variables, opts=args.opts)
    if args.manualSeed < 0:
        args.manualSeed = int.from_bytes(os.urandom(2), "little")
        if jax.process_count() > 1:
            # one seed for the whole SPMD program: per-host random seeds
            # would diverge replicated init / the global shuffle
            from jax.experimental import multihost_utils

            args.manualSeed = int(
                multihost_utils.broadcast_one_to_all(
                    jnp.asarray(args.manualSeed, jnp.int32)
                )
            )
    cfg["manualSeed"] = args.manualSeed
    cfg["replace"] = args.replace
    if args.wandb_upload:
        cfg["wandb_upload"] = True
    if args.wandb_entity is not None:
        cfg["wandb_entity"] = args.wandb_entity
    if args.wandb_project is not None:
        cfg["wandb_project"] = args.wandb_project
    name = args.name or os.path.splitext(os.path.basename(args.cfg))[0]
    tag = f"_{args.tag}" if args.tag else ""
    cfg["save_dir"] = os.path.join(args.out_path, f"{name}{tag}")
    cfg["batch_size"] = args.batch_size
    return cfg


def main():
    args = parse_args()
    if args.multihost:
        jax.distributed.initialize()
    cfg = make_cfg(args)
    trainer = trainers.make({"name": cfg["trainer"]}, args={"cfg": cfg})
    trainer.run()


if __name__ == "__main__":
    main()
