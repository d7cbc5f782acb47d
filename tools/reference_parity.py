"""Cross-framework training-dynamics parity harness.

Runs the ACTUAL reference trainer
(`/root/reference/trainers/larp_tokenizer_trainer.py`, torch-CPU, via the
offline stubs in tools/ref_parity/stubs) for N steps on the fake `null128`
dataset, then runs THIS framework's `larp_tokenizer_trainer` from the SAME
initial weights (through tools/convert_reference_tokenizer.py) on the SAME
recorded batches, and compares the per-step loss trajectories.

Why this shape: seeds cannot make two frameworks draw identical init or
identical shuffles, so instead the reference run *records* its batches and
exports its init state dict; our run consumes both. With identical weights,
identical data, matched hyperparameters (Adam(0.5, 0.9), lr 1e-4 constant,
GAN gated off, perceptual off, deterministic VQ), the two loss curves must
agree to float tolerance — this checks the full train path (forward, VQ
straight-through, backward, Adam update) rather than just leaf-exact weight
conversion.

Usage:
    python tools/reference_parity.py all  [--steps 12] [--out DIR]
    # or the phases separately: ref | ours | compare

Each phase runs in its own interpreter (the reference needs its own
sys.path/sys.modules world). `ours` forces
jax_default_matmul_precision=highest: XLA:CPU's default onednn matmul path
computes fp32 GEMMs in reduced precision (~1e-2 abs drift per layer), which
would swamp the comparison.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

SEED = 0
BATCH = 4
FRAMES = 8
SIZE = 32

# shared tiny geometry (reference arg names; ours match)
MODEL_ARGS = {
    "bottleneck": {"name": "bottleneck", "args": {
        "bottleneck_dim": 8, "norm": "none",
        "regularizer": {"name": "vq", "args": {
            "codebook_size": 64, "commitment_loss_weight": 0.25,
            "codebook_loss_weight": 1.0, "entropy_loss_weight": 0.0,
            "entropy_loss_temperature": 0.01, "l2_normalized": True,
            "stochastic": False, "stochastic_temperature": 0.03}}}},
    "bottleneck_token_num": 16,
    "input_size": SIZE, "frame_num": FRAMES,
    "temporal_patch_size": 4, "patch_size": 8,
    "decoder_temporal_patch_size": 4, "decoder_patch_size": 8,
    "in_channels": 3, "bottleneck_type": "vq", "train_type": "simple",
    "transformer_name": "transformer_encoder_parallel",
    "encoder_hidden_size": 64, "decoder_hidden_size": 64,
    "encoder_num_heads": 4, "decoder_num_heads": 4,
    "encoder_depth": 2, "decoder_depth": 2,
}

# GAN fully gated off; perceptual weight 0 (reference loss arg names)
REF_LOSS_ARGS = {
    "disc_type": "transformer", "disc_start": 10**9,
    "disc_self_start": 10**9, "pixelloss_weight": 1.0,
    "perceptual_weight": 0.0, "pixel_loss": "l1",
    "perceptual_loss": "lpips", "perceptual_fp16": False,
    "lecam_weight": 0.001, "disc_loss": "ns_smooth", "disc_weight": 0.3,
    "r1_gp_weight": 0.0, "d_update_freq": 1, "spectral_norm": False,
    "disc_tran_hidden_size": 64, "disc_tran_n_heads": 4,
    "disc_tran_n_layers": 1, "disc_tran_temporal_patch_size": 4,
    "disc_tran_patch_size": 8, "input_spatial_size": SIZE,
    "frame_num": FRAMES,
}

OPTIMIZER = {
    "name": "adam", "loss_name": "adam",
    "args": {"lr": 1.0e-4, "betas": [0.5, 0.9]},
    "loss_args": {"lr": 1.0e-4, "betas": [0.5, 0.9]},
    "lr_type": "step", "lr_step_pcts": "0.9_0.95", "warmup_epoch": 1,
    "min_lr_mult": 0.1, "prior_lr_mult": 1.0, "emb_lr_mult": 1.0,
}

TRAIN_KEYS = {
    "loss_q_warmup": "1.0_1", "loss_q_weight": 1.0, "loss_kl_weight": 0.0,
    "clip_grad_max_norm": 0.0, "ema_decay": "_", "use_amp": False,
    "max_epoch": 2,
}

# our default (GAN-off) loss args — our arg names
# (video_tokenizer_tpu/models/loss.py)
OUR_LOSS_ARGS = {
    "disc_start": 10**9, "disc_self_start": 10**9,
    "pixelloss_weight": 1.0, "perceptual_weight": 0.0,
    "pixel_loss": "l1", "lecam_weight": 0.001,
    "disc_loss": "ns_smooth", "disc_weight": 0.3,
    "r1_gp_weight": 0.0, "d_update_freq": 1,
    "disc_tran_hidden_size": 64, "disc_tran_n_heads": 4,
    "disc_tran_n_layers": 1, "disc_tran_temporal_patch_size": 4,
    "disc_tran_patch_size": 8, "input_spatial_size": SIZE,
    "frame_num": FRAMES,
}

# GAN phases (VERDICT r3 #3): discriminator live from epoch 0, LeCam ON.
# lecam_weight 1.0 neutralizes the reference's double application (reference
# loss.py:425,437 — weight inside AND outside; ours applies it once, loss.py
# module docstring), so both sides compute d_loss + lecam_reg exactly.
# hinge exercises d_update_freq=2 (update every 2nd step, reference
# 1-indexed global_step % 2 == 0); ns_smooth uses freq=1 so every step has
# one recorded noise draw to replay.


def _gan_loss_args(base: dict, disc_loss: str, freq: int) -> dict:
    return {**base, "disc_start": 0, "disc_self_start": 0,
            "lecam_weight": 1.0, "disc_loss": disc_loss,
            "d_update_freq": freq}


GAN_VARIANTS = {
    "gan_hinge": ("hinge", 2),
    "gan_ns": ("ns_smooth", 1),
}

# per-step scalars compared (same key names on both sides)
COMPARED = ["loss", "rec_loss", "loss_q", "loss_commit", "psnr"]
COMPARED_AR = ["loss"]
COMPARED_GAN = ["loss", "rec_loss", "g_loss", "psnr", "d_loss",
                "d_total_loss", "d_lecam_loss", "logits_real", "logits_fake"]

# AR parity config: tiny llama-abs-S over the tiny tokenizer's 16-token /
# 64-vocab code space. All dropout off (determinism); AdamW with real
# weight decay to exercise the minGPT decay/no-decay split on both sides.
AR_MODEL_ARGS = {
    "num_classes": 101, "cls_token_num": 1, "token_dropout_p": 0.0,
    "resid_dropout_p": 0.0, "ffn_dropout_p": 0.0, "attn_dropout_p": 0.0,
    "class_dropout_prob": 0.0, "use_fixed_pe": False,
}
AR_OPTIMIZER = {
    "name": "adamw",
    "args": {"lr": 1.0e-4, "betas": [0.9, 0.95], "weight_decay": 0.05},
    "lr_type": "step", "lr_step_pcts": "0.9_0.95", "warmup_epoch": 1,
    "min_lr_mult": 0.01,
}
AR_SECTION = {
    "num_samples": 8, "num_save_wandb": 0, "sample_batch_size": 4,
    "cfg_scale": 1.0, "cfg_interval": -1, "temperature": 1.0,
    "top_k": 0, "top_p": 1.0,
}


def dataset_args():
    return {
        "root_path": "", "split": "train", "frame_num": FRAMES,
        "rand_augment": "no", "csv_file": "null128",
        "cls_vid_num": "-1_-1", "crop_size": SIZE, "scale": 1.0,
        "aspect_ratio": 1.0, "rand_flip": "no", "use_all_frames": False,
        "pre_load": False,
    }


# ------------------------------------------------------------------ ref AR


def run_ref_ar(out: str, steps: int):
    sys.path.insert(0, os.path.join(HERE, "ref_parity"))
    import refenv

    refenv.setup()
    import numpy as np
    import torch

    torch.manual_seed(SEED)
    np.random.seed(SEED)

    import models as ref_models
    import trainers
    import trainers.base_trainer as bt

    bt.FVDCalculator = lambda *a, **k: None

    # frozen tokenizer: build fresh (seeded), save in the reference's
    # torch-checkpoint format for from_checkpoint AND as npz for our side.
    vae_args = {**MODEL_ARGS, "prior_model": {"name": "none", "args": {}}}
    vae = ref_models.make({"name": "larp_tokenizer", "args": vae_args})
    vae_sd = vae.state_dict()
    torch.save(
        {"model": {"args": vae_args, "sd": vae_sd}},
        os.path.join(out, "vae_ref.pth"),
    )
    np.savez(os.path.join(out, "vae_sd.npz"),
             **{k: v.detach().cpu().numpy() for k, v in vae_sd.items()})

    save_dir = os.path.join(out, "ref_ar_run")
    cfg = {
        "trainer": "larp_ar_trainer",
        "env": {"tot_gpus": 1, "port": 0, "cudnn": False,
                "save_dir": save_dir},
        "train_dataset": {
            "name": "video_dataset",
            "args": {**dataset_args(), "root_path": os.path.join(out, "d")},
            "loader": {"batch_size": BATCH, "num_workers": 0},
        },
        "model": {"name": "llama-abs-S", "args": dict(AR_MODEL_ARGS)},
        "vae": {"name": "larp_tokenizer",
                "checkpoint": os.path.join(out, "vae_ref.pth"),
                "version": "sd", "eval_deterministic": True},
        "ar": dict(AR_SECTION),
        "optimizer": dict(AR_OPTIMIZER),
        "compile": False, "compile_mode": "default",
        "stepwise_logging": False, "vae_force_fp32": True,
        **TRAIN_KEYS,
    }
    os.makedirs(save_dir, exist_ok=True)

    t = trainers.trainers_dict[cfg["trainer"]](0, cfg)
    t.make_datasets()
    t.starting_epoch, t.global_step = 1, 0
    t.make_model()
    t.make_loss()
    t.configure_optimizers(cfg["optimizer"])
    t.configure_scalers()

    np.savez(os.path.join(out, "init_ar_sd.npz"),
             **{k: v.detach().cpu().numpy()
                for k, v in t.orig_model.state_dict().items()})

    t.n_steps_per_epoch = len(t.train_loader)
    t.max_steps = t.n_steps_per_epoch * cfg["max_epoch"]

    batches, infos = [], []
    done = False
    for epoch in range(1, cfg["max_epoch"] + 1):
        if done:
            break
        t.epoch = epoch
        t.global_step = (epoch - 1) * t.n_steps_per_epoch
        t.model_ddp.train()
        for data in t.train_loader:
            t.global_step += 1
            t.adjust_learning_rate_stepwise()
            batches.append((np.asarray(data["gt"].cpu().numpy()),
                            np.asarray(data["label"].cpu().numpy())))
            ret = t.train_step(data)
            infos.append({"epoch": epoch,
                          **{k: float(v) for k, v in ret.items()
                             if isinstance(v, (int, float))}})
            if len(infos) >= steps:
                done = True
                break

    np.savez(os.path.join(out, "batches_ar.npz"),
             **{f"b{i}": b for i, (b, _) in enumerate(batches)},
             **{f"l{i}": lb for i, (_, lb) in enumerate(batches)})
    with open(os.path.join(out, "ref_ar_info.json"), "w") as f:
        json.dump(infos, f, indent=1)
    print(f"[ref-ar] {len(infos)} steps recorded -> {out}")
    for i, r in enumerate(infos):
        print(f"[ref-ar] step {i}: " + " ".join(
            f"{k}={v:.6f}" for k, v in r.items() if k != "epoch"))


# ----------------------------------------------------------------- ours AR


def run_ours_ar(out: str, steps: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache_tests"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import numpy as np

    sys.path.insert(0, REPO)
    sys.path.insert(0, HERE)
    from convert_reference_tokenizer import (
        convert_larp_ar, convert_larp_tokenizer,
    )

    import video_tokenizer_tpu.models  # noqa: F401
    import video_tokenizer_tpu.data.video_dataset  # noqa: F401
    import video_tokenizer_tpu.trainers  # noqa: F401
    from video_tokenizer_tpu import registry
    from video_tokenizer_tpu.utils import checkpoint as ckpt_lib

    # converted frozen tokenizer -> our checkpoint format
    vae_sd = dict(np.load(os.path.join(out, "vae_sd.npz")))
    vae_params = convert_larp_tokenizer(vae_sd)
    vae_spec = {"name": "larp_tokenizer",
                "args": {**MODEL_ARGS, "prior_model": None}}
    vae_ckpt = os.path.join(out, "vae_ours")
    ckpt_lib.save_checkpoint(vae_ckpt, {"params": vae_params},
                             meta={"model": vae_spec})

    save_dir = os.path.join(out, "ours_ar_run")
    cfg = {
        "trainer": "larp_ar_trainer",
        "save_dir": save_dir, "manualSeed": SEED,
        "train_dataset": {
            "name": "video_dataset",
            "args": dataset_args(),
            "loader": {"batch_size": BATCH, "num_workers": 0},
        },
        "model": {"name": "llama-abs-S", "args": dict(AR_MODEL_ARGS)},
        "vae": {"name": "larp_tokenizer", "checkpoint": vae_ckpt,
                "version": "sd", "eval_deterministic": True},
        "ar": dict(AR_SECTION),
        "optimizer": dict(AR_OPTIMIZER),
        "vae_force_fp32": True,
        **TRAIN_KEYS,
    }

    t = registry.trainers.make({"name": cfg["trainer"]}, args={"cfg": cfg})
    t.make_datasets()
    t.make_model()

    init_sd = dict(np.load(os.path.join(out, "init_ar_sd.npz")))
    # reference built with class_dropout_prob 0 -> its class table has no
    # null row; pad it to our always-allocated-null-row layout
    converted = convert_larp_ar(
        init_sd, num_classes=AR_MODEL_ARGS["num_classes"]
    )
    import jax.numpy as jnp

    t.state["params"] = jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.asarray(a, np.float32)), converted
    )

    data = np.load(os.path.join(out, "batches_ar.npz"))
    n = sum(1 for k in data.files if k.startswith("b"))
    ref_infos = json.load(open(os.path.join(out, "ref_ar_info.json")))
    infos = []
    for i in range(min(n, steps)):
        t.epoch = int(ref_infos[i]["epoch"])
        t.global_step += 1
        keys, packed = t.train_step(
            {"gt": data[f"b{i}"], "label": data[f"l{i}"]}
        )
        infos.append(
            {k: float(v) for k, v in zip(keys, np.asarray(packed).tolist())}
        )
    with open(os.path.join(out, "ours_ar_info.json"), "w") as f:
        json.dump(infos, f, indent=1)
    print(f"[ours-ar] {len(infos)} steps -> {out}")
    for i, r in enumerate(infos):
        print(f"[ours-ar] step {i}: " + " ".join(
            f"{k}={v:.6f}" for k, v in r.items()))


# --------------------------------------------------------------------- ref


def run_ref(out: str, steps: int, loss_args=None, suffix: str = "",
            record_gan_noise: bool = False):
    """Record a reference-trainer run. With the default `loss_args` the GAN
    is gated off (the round-2 harness). GAN phases pass overridden loss args
    (disc on from epoch 0, LeCam, d_update_freq) and a `suffix` so artifacts
    coexist; `record_gan_noise=True` additionally captures the torch
    `randn_like` draws inside ns_d_loss_single_side_smooth (reference
    loss.py:82-92) so our side can replay the stochastic label smoothing
    exactly."""
    sys.path.insert(0, os.path.join(HERE, "ref_parity"))
    import refenv

    refenv.setup()
    import numpy as np
    import torch

    torch.manual_seed(SEED)
    np.random.seed(SEED)

    import trainers
    import trainers.base_trainer as bt

    bt.FVDCalculator = lambda *a, **k: None  # offline: no i3d_torchscript.pt

    save_dir = os.path.join(out, f"ref_run{suffix}")
    cfg = {
        "trainer": "larp_tokenizer_trainer",
        "env": {"tot_gpus": 1, "port": 0, "cudnn": False,
                "save_dir": save_dir},
        "train_dataset": {
            "name": "video_dataset",
            "args": {**dataset_args(), "root_path": os.path.join(out, "d")},
            "loader": {"batch_size": BATCH, "num_workers": 0},
        },
        "model": {"name": "larp_tokenizer", "args": {
            **MODEL_ARGS,
            "prior_model": {"name": "none", "args": {}},
        }},
        "loss": {"name": "lpips_disc_loss",
                 "args": dict(loss_args or REF_LOSS_ARGS)},
        "optimizer": dict(OPTIMIZER),
        "compile": False, "compile_mode": "default",
        "stepwise_logging": False,
        **TRAIN_KEYS,
    }
    os.makedirs(save_dir, exist_ok=True)

    t = trainers.trainers_dict[cfg["trainer"]](0, cfg)
    t.make_datasets()
    t.starting_epoch, t.global_step = 1, 0
    t.make_model()
    t.make_loss()
    t.configure_optimizers(cfg["optimizer"])
    t.configure_scalers()

    init_sd = {k: v.detach().cpu().numpy()
               for k, v in t.orig_model.state_dict().items()}
    np.savez(os.path.join(out, f"init_sd{suffix}.npz"), **init_sd)
    np.savez(os.path.join(out, f"init_loss_sd{suffix}.npz"),
             **{k: v.detach().cpu().numpy()
                for k, v in t.loss.state_dict().items()})

    noise_rec = []
    if record_gan_noise:
        def recording_ns_smooth(logits_real, logits_fake):
            rn = torch.randn_like(logits_real)
            fn_ = torch.randn_like(logits_fake)
            noise_rec.append((rn.detach().cpu().numpy(),
                              fn_.detach().cpu().numpy()))
            real_target = (1.0 - rn.abs() * 0.15).clamp_min(0.7)
            fake_target = (fn_.abs() * 0.15).clamp_max(0.3)
            bce = torch.nn.functional.binary_cross_entropy_with_logits
            return (bce(logits_real, real_target)
                    + bce(logits_fake, fake_target))

        t.loss.disc_loss = recording_ns_smooth

    t.n_steps_per_epoch = len(t.train_loader)
    t.max_steps = t.n_steps_per_epoch * cfg["max_epoch"]

    batches, infos = [], []
    done = False
    for epoch in range(1, cfg["max_epoch"] + 1):
        if done:
            break
        t.epoch = epoch
        t.global_step = (epoch - 1) * t.n_steps_per_epoch
        t.model_ddp.train()
        for data in t.train_loader:
            t.global_step += 1
            t.adjust_learning_rate_stepwise()
            batches.append(np.asarray(data["gt"].cpu().numpy()))
            ret = t.train_step(data)
            infos.append({"epoch": epoch,
                          **{k: float(v) for k, v in ret.items()
                             if isinstance(v, (int, float))}})
            if len(infos) >= steps:
                done = True
                break

    np.savez(os.path.join(out, f"batches{suffix}.npz"),
             **{f"b{i}": b for i, b in enumerate(batches)})
    if record_gan_noise:
        np.savez(os.path.join(out, f"gan_noise{suffix}.npz"),
                 **{f"r{i}": r for i, (r, _) in enumerate(noise_rec)},
                 **{f"f{i}": fk for i, (_, fk) in enumerate(noise_rec)})
    with open(os.path.join(out, f"ref{suffix}_info.json"), "w") as f:
        json.dump(infos, f, indent=1)
    print(f"[ref{suffix}] {len(infos)} steps recorded -> {out}")
    for i, r in enumerate(infos):
        print(f"[ref{suffix}] step {i}: loss={r['loss']:.6f} "
              f"d={r.get('d_loss', float('nan')):.6f} "
              f"psnr={r.get('psnr', float('nan')):.4f}")


# -------------------------------------------------------------------- ours


def run_ours(out: str, steps: int, loss_args=None, suffix: str = "",
             replay_gan_noise: bool = False):
    """Replay the recorded reference run through OUR trainer. GAN phases
    pass overridden loss args + suffix; `replay_gan_noise=True` runs the
    step EAGERLY (unjitted) and substitutes the reference's recorded
    randn draws into ns_d_loss_single_side_smooth so the stochastic label
    smoothing is bit-aligned across frameworks."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    # persistent compile cache: the GAN-step compile dominated this phase's
    # wall time (test-tier contract, VERDICT r3 #8)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache_tests"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import functools

    import numpy as np

    sys.path.insert(0, REPO)
    sys.path.insert(0, HERE)
    from convert_reference_tokenizer import (
        convert_larp_tokenizer, convert_lpips_disc_loss,
    )

    import video_tokenizer_tpu.models  # noqa: F401
    import video_tokenizer_tpu.data.video_dataset  # noqa: F401
    import video_tokenizer_tpu.trainers  # noqa: F401
    from video_tokenizer_tpu import registry

    save_dir = os.path.join(out, f"ours_run{suffix}")
    cfg = {
        "trainer": "larp_tokenizer_trainer",
        "save_dir": save_dir, "manualSeed": SEED,
        "train_dataset": {
            "name": "video_dataset",
            "args": dataset_args(),
            "loader": {"batch_size": BATCH, "num_workers": 0},
        },
        "model": {"name": "larp_tokenizer",
                  "args": {**MODEL_ARGS, "prior_model": None}},
        # our loss arg names (video_tokenizer_tpu/models/loss.py)
        "loss": {"name": "lpips_disc_loss",
                 "args": dict(loss_args or OUR_LOSS_ARGS)},
        "optimizer": dict(OPTIMIZER),
        **TRAIN_KEYS,
    }

    t = registry.trainers.make({"name": cfg["trainer"]}, args={"cfg": cfg})
    t.make_datasets()
    t.make_model()

    init_sd = dict(np.load(os.path.join(out, f"init_sd{suffix}.npz")))
    converted = convert_larp_tokenizer(init_sd)
    converted = jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float32), converted
    )
    # graft the reference's init into the live state; Adam moments are fresh
    # zeros on both sides, so only params need replacing.
    import jax.numpy as jnp

    t.state["params"] = jax.tree_util.tree_map(jnp.asarray, converted)

    loss_sd_path = os.path.join(out, f"init_loss_sd{suffix}.npz")
    if os.path.exists(loss_sd_path) and any(
        k.startswith("discriminator.") for k in np.load(loss_sd_path).files
    ):
        loss_vars = convert_lpips_disc_loss(dict(np.load(loss_sd_path)))
        lp = dict(t.state["loss_params"])
        lp["discriminator"] = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a, np.float32)),
            loss_vars["params"]["discriminator"],
        )
        t.state["loss_params"] = lp
        if "ema" in loss_vars and t.state.get("loss_ema"):
            t.state["loss_ema"] = {
                k: jnp.asarray(np.asarray(v, np.float32))
                for k, v in loss_vars["ema"].items()
            }

    noise = None
    if replay_gan_noise:
        noise = np.load(os.path.join(out, f"gan_noise{suffix}.npz"))
        # eager step: each call re-executes Python, so the per-step replay
        # closure below is picked up (a jitted step would bake step-0 noise
        # into the compiled program)
        t._train_step = functools.partial(t._step_impl, is_train=True)

    import video_tokenizer_tpu.models.loss as loss_lib

    orig_ns = loss_lib.ns_d_loss_single_side_smooth

    def set_replay(i):
        rn = jnp.asarray(np.asarray(noise[f"r{i}"], np.float32))
        fk = jnp.asarray(np.asarray(noise[f"f{i}"], np.float32))

        def replay(logits_real, logits_fake, rng):
            real_target = jnp.clip(1.0 - jnp.abs(rn) * 0.15, min=0.7)
            fake_target = jnp.clip(jnp.abs(fk) * 0.15, max=0.3)
            from video_tokenizer_tpu.models.loss import _bce_logits

            return (_bce_logits(logits_real, real_target)
                    + _bce_logits(logits_fake, fake_target))

        loss_lib.ns_d_loss_single_side_smooth = replay

    data = np.load(os.path.join(out, f"batches{suffix}.npz"))
    n = sum(1 for k in data.files if k.startswith("b"))
    ref_infos = json.load(open(os.path.join(out, f"ref{suffix}_info.json")))
    infos = []
    try:
        for i in range(min(n, steps)):
            if replay_gan_noise:
                set_replay(i)
            t.epoch = int(ref_infos[i]["epoch"])
            t.global_step += 1
            keys, packed = t.train_step({"gt": data[f"b{i}"]})
            infos.append(
                {k: float(v)
                 for k, v in zip(keys, np.asarray(packed).tolist())}
            )
    finally:
        loss_lib.ns_d_loss_single_side_smooth = orig_ns
    with open(os.path.join(out, f"ours{suffix}_info.json"), "w") as f:
        json.dump(infos, f, indent=1)
    print(f"[ours{suffix}] {len(infos)} steps -> {out}")
    for i, r in enumerate(infos):
        print(f"[ours{suffix}] step {i}: loss={r['loss']:.6f} "
              f"d={r.get('d_loss', float('nan')):.6f} "
              f"psnr={r.get('psnr', float('nan')):.4f}")


# ----------------------------------------------------------------- compare


def run_compare(out: str, rtol: float, trainer: str = "tokenizer"):
    if trainer == "ar":
        suffix, keys = "_ar", COMPARED_AR
    elif trainer in GAN_VARIANTS:
        suffix, keys = f"_{trainer}", COMPARED_GAN
    else:
        suffix, keys = "", COMPARED
    ref = json.load(open(os.path.join(out, f"ref{suffix}_info.json")))
    ours = json.load(open(os.path.join(out, f"ours{suffix}_info.json")))
    n = min(len(ref), len(ours))
    print(f"comparing {n} {trainer} steps (rtol {rtol})")
    worst = {}
    ok = True
    for k in keys:
        # per-step presence: the reference only reports d_* keys on steps
        # where its d-branch ran (epoch/freq gates); compare the overlap
        steps_both = [i for i in range(n) if k in ref[i] and k in ours[i]]
        if not steps_both:
            print(f"  [skip] {k} (missing on one side)")
            continue
        rel = []
        for i in steps_both:
            a, b = ref[i][k], ours[i][k]
            denom = max(abs(a), abs(b), 1e-6)
            rel.append(abs(a - b) / denom)
        worst[k] = max(rel)
        line = " ".join(f"{r:.1e}" for r in rel)
        status = "OK " if worst[k] <= rtol else "FAIL"
        if worst[k] > rtol:
            ok = False
        print(f"  [{status}] {k:12s} worst rel {worst[k]:.2e}  "
              f"({len(steps_both)} steps)  per-step: {line}")
    print(json.dumps({"parity_ok": ok, "steps": n, "worst_rel": worst}))
    if not ok:
        sys.exit(1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=["ref", "ours", "compare", "all"])
    ap.add_argument("--out", default="/tmp/ref_parity")
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--rtol", type=float, default=0.02)
    ap.add_argument("--trainer",
                    choices=["tokenizer", "ar", "gan_hinge", "gan_ns"],
                    default="tokenizer")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    def phase_ref():
        if args.trainer == "ar":
            run_ref_ar(args.out, args.steps)
        elif args.trainer in GAN_VARIANTS:
            disc_loss, freq = GAN_VARIANTS[args.trainer]
            run_ref(args.out, args.steps,
                    loss_args=_gan_loss_args(REF_LOSS_ARGS, disc_loss, freq),
                    suffix=f"_{args.trainer}",
                    record_gan_noise=(disc_loss == "ns_smooth"))
        else:
            run_ref(args.out, args.steps)

    def phase_ours():
        if args.trainer == "ar":
            run_ours_ar(args.out, args.steps)
        elif args.trainer in GAN_VARIANTS:
            disc_loss, freq = GAN_VARIANTS[args.trainer]
            run_ours(args.out, args.steps,
                     loss_args=_gan_loss_args(OUR_LOSS_ARGS, disc_loss, freq),
                     suffix=f"_{args.trainer}",
                     replay_gan_noise=(disc_loss == "ns_smooth"))
        else:
            run_ours(args.out, args.steps)

    if args.phase == "ref":
        phase_ref()
    elif args.phase == "ours":
        phase_ours()
    elif args.phase == "compare":
        run_compare(args.out, args.rtol, args.trainer)
    else:
        me = os.path.abspath(__file__)
        for ph in ("ref", "ours"):
            print(f"=== phase {ph} ({args.trainer}) ===", flush=True)
            subprocess.run(
                [sys.executable, me, ph, "--out", args.out,
                 "--steps", str(args.steps), "--trainer", args.trainer],
                check=True,
            )
        run_compare(args.out, args.rtol, args.trainer)


if __name__ == "__main__":
    main()
