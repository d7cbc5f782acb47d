"""AR prior trainers: class-conditional and frame-prediction.

Re-expresses `/root/reference/trainers/larp_ar_trainer.py` and
`larp_ar_fp_trainer.py`:
  * frozen tokenizer ("vae") loaded from checkpoint; `max_seq_len`/`vocab_size`
    derived from it (larp_ar_trainer.py:40-68). The vae params are passed as a
    non-donated argument to the jitted step so they stay resident and frozen.
  * step: `vae.encode(x)['bottleneck_rep']` under stop-gradient -> CE loss +
    top-1/top-5 accuracy (larp_ar_trainer.py:178-186), AdamW with the
    minGPT-style decay/no-decay split (:97-162) expressed as an optax
    weight-decay mask (decay only Dense kernels).
  * frame prediction (larp_ar_fp_trainer.py:216-226): condition = tokens of
    the first `num_cond_frames` frames repeated to `num_frames`, a
    `sep_token = codebook_size` appended, `cls_token_num = seq_len + 1`.
  * visualize_epoch samples videos through `generation.generate` + tokenizer
    decode (FVD scoring is wired through metrics.fvd when I3D weights are
    available).
"""
from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import registry
from ..generation import generate
from ..metrics import statistics as stats
from ..models.larp_ar import LARP_AR
from ..parallel import replicated_sharding
from ..registry import trainers
from ..utils import checkpoint as ckpt_lib
from ..utils import common
from .base_trainer import BaseTrainer, ema_update, make_lr_schedule


def adamw_mingpt(lr_schedule, betas=(0.9, 0.95), weight_decay=0.0):
    """AdamW decaying only Dense kernels (minGPT split, larp_ar_trainer.py:97-162)."""

    def decay_mask(params):
        def label(path, leaf):
            return path[-1].key == "kernel" if hasattr(path[-1], "key") else False

        return jax.tree_util.tree_map_with_path(label, params)

    return optax.adamw(
        lr_schedule, b1=betas[0], b2=betas[1],
        weight_decay=weight_decay, mask=decay_mask,
    )


class _ARTrainerBase(BaseTrainer):
    frame_prediction = False

    def __init__(self, cfg):
        super().__init__(cfg)
        ar_cfg = cfg.get("ar", {})
        self.num_samples = int(ar_cfg.get("num_samples", 8))
        self.sample_batch_size = int(ar_cfg.get("sample_batch_size", 8))
        self.cfg_scale = float(ar_cfg.get("cfg_scale", 1.0))
        self.cfg_interval = int(ar_cfg.get("cfg_interval", -1))
        self.temperature = float(ar_cfg.get("temperature", 1.0))
        self.top_k = int(ar_cfg.get("top_k", 0))
        self.top_p = float(ar_cfg.get("top_p", 1.0))
        self.num_frames = int(ar_cfg.get("num_frames", 16))
        self.num_cond_frames = int(ar_cfg.get("num_cond_frames", 5))
        self.compute_dtype = (
            jnp.bfloat16 if cfg.get("use_amp", False) else jnp.float32
        )
        self.grad_accum = int(cfg.get("grad_accum_steps", 1))
        self._info_keys = {}

    # -------------------------------------------------------------- building

    def _load_vae(self):
        vae_cfg = self.cfg["vae"]
        ckpt_path = str(vae_cfg.get("checkpoint", "")).strip("'\"")
        if ckpt_path and not ckpt_lib.checkpoint_exists(ckpt_path):
            # hub-id fallback (reference larp_ar_trainer loads the frozen
            # tokenizer via from_pretrained when the path is not local) —
            # same resolution rules as sample.py (model_io.resolve_pretrained)
            from ..utils.model_io import resolve_pretrained

            try:
                ckpt_path = resolve_pretrained(ckpt_path)
            except FileNotFoundError:
                pass  # fall through to the explicit error below
        if ckpt_path and ckpt_lib.checkpoint_exists(ckpt_path):
            meta = ckpt_lib.load_meta(ckpt_path)
            model_spec = meta["model"] if "model" in meta else meta["cfg"]["model"]
            self.vae = registry.models.make(model_spec)
            state = ckpt_lib.restore_checkpoint(ckpt_path)
            version = vae_cfg.get("version", "sd")
            if version == "sd":
                self.vae_params = state["params"]
            elif version.startswith("ema"):
                alpha = version.split("_")[1]
                self.vae_params = state["ema_params"][alpha]
            self.log(f"Loaded VAE from {ckpt_path}")
        else:
            # fresh init (testing / fake runs without a pretrained tokenizer)
            assert "args" in vae_cfg or "model" in vae_cfg, (
                "vae.checkpoint not found and no inline vae spec given"
            )
            spec = (
                vae_cfg["model"]
                if "model" in vae_cfg
                else {"name": vae_cfg["name"], "args": vae_cfg["args"]}
            )
            self.vae = registry.models.make(spec)
            dummy = jnp.zeros(
                (1, 3, self.vae.frame_num, self.vae.input_size, self.vae.input_size)
            )
            vv = jax.jit(self.vae.init)(
                {"params": self.base_key, "vq": self.base_key}, dummy
            )
            self.vae_params = vv["params"]
            self.log("VAE initialized randomly (no checkpoint found)")
        if bool(self.cfg["vae"].get("eval_deterministic", False)):
            # vq_eval_deterministic is a module attribute; fresh modules default True
            pass

    def make_model(self):
        self._load_vae()
        seq_length = self.vae.bottleneck_token_num
        vocab_size = self.vae.codebook_size

        model_name = self.cfg["model"]["name"]
        args = dict(self.cfg["model"].get("args", {}))
        args["max_seq_len"] = seq_length
        args["vocab_size"] = vocab_size
        if self.frame_prediction:
            args["frame_prediction"] = True
            args["cls_token_num"] = seq_length + 1
        else:
            num_classes = getattr(self.train_dataset, "num_classes", None)
            if num_classes:
                args["num_classes"] = num_classes
        self.model: LARP_AR = registry.models.make(
            {"name": model_name, "args": args}
        )
        self.model_cfg = self.model.config

        B = 2
        dummy_idx = jnp.zeros((B, seq_length - 1), jnp.int32)
        if self.frame_prediction:
            dummy_cond = jnp.zeros((B, seq_length + 1), jnp.int32)
        else:
            dummy_cond = jnp.zeros((B,), jnp.int32)
        # one compiled init program instead of eager op-by-op dispatches
        # (see tokenizer_trainer.make_model)
        variables = jax.jit(self.model.init)(
            {"params": self.base_key, "dropout": self.base_key},
            dummy_idx, dummy_cond,
        )
        self.log(f"AR model params: {common.compute_num_params(variables['params'])}")

        opt_cfg = self.cfg["optimizer"]
        steps_per_epoch = self.steps_per_epoch()
        sched = make_lr_schedule(
            opt_cfg, float(opt_cfg["args"]["lr"]), steps_per_epoch,
            int(self.cfg["max_epoch"]),
        )
        betas = opt_cfg["args"].get("betas", [0.9, 0.95])
        self.tx = adamw_mingpt(
            sched, betas=tuple(betas),
            weight_decay=float(opt_cfg["args"].get("weight_decay", 0.0)),
        )

        state = {
            "params": variables["params"],
            "opt": self.tx.init(variables["params"]),
            "ema_params": {
                str(d): jax.tree_util.tree_map(
                    lambda p: jnp.array(p, dtype=jnp.float32, copy=True),
                    variables["params"],
                )
                for d in self.ema_decays
            },
            "step": jnp.zeros((), jnp.int32),
            "rng": jax.random.fold_in(self.base_key, 99),
        }
        rep = replicated_sharding(self.mesh)
        # cfg `param_placement: fsdp` shards params + Adam moments + EMA over
        # the 'data' mesh axis (ZeRO-3 via GSPMD — parallel/fsdp.py); XLA
        # inserts the all-gathers/reduce-scatters. Default: replicated (DDP
        # equivalent, like the reference). Needed for llama-abs-XXL/XXXL,
        # whose fp32 params+Adam exceed one chip's HBM.
        placement = str(self.cfg.get("param_placement", "replicated"))
        # cfg `mesh_model: N` (base_trainer mesh) turns on Megatron tensor
        # parallelism for the zoo (parallel/tp.py): column/row-parallel
        # matmuls + vocab-parallel embedding/head, collectives inserted by
        # GSPMD. Composes with `param_placement: fsdp` (the remaining large
        # dim shards over 'data' — ZeRO-3+TP, the llama-abs-XXXL layout).
        use_tp = self.mesh.shape.get("model", 1) > 1
        # cfg `mesh_pipe: N` (base_trainer mesh) pipelines the transformer
        # trunk over the 'pipe' axis with a GPipe microbatch schedule
        # (parallel/pp.py): each device holds n_layer/N layers, activations
        # hop stages via ppermute over ICI. Exclusive with TP/FSDP; the
        # trunk must be deterministic (dropouts 0).
        use_pp = self.mesh.shape.get("pipe", 1) > 1
        self._pp_apply = None
        if use_pp:
            if placement == "fsdp":
                raise ValueError("mesh_pipe does not compose with "
                                 "param_placement: fsdp")
            mc = self.model_cfg
            if (mc.resid_dropout_p or mc.ffn_dropout_p
                    or mc.drop_path_rate):
                raise ValueError(
                    "pipeline-parallel trunk is deterministic: set "
                    "resid_dropout_p/ffn_dropout_p/drop_path_rate to 0"
                )
            from ..parallel.pp import pp_logits_fn, shard_params_pp

            raw = state["params"]
            state["params"] = shard_params_pp(raw, self.mesh, mc.n_layer)
            state["opt"] = self.tx.init(state["params"])
            # EMA rebuilt from a fp32 HOST copy through shard_params_pp:
            # guarantees fresh device buffers in the same pipe layout — an
            # astype/alias of state['params'] would double-donate the same
            # buffer through the jitted step's donate_argnums.
            state["ema_params"] = {
                str(d): shard_params_pp(
                    jax.tree_util.tree_map(
                        lambda p: np.asarray(p, np.float32), raw
                    ),
                    self.mesh, mc.n_layer,
                )
                for d in self.ema_decays
            }
            for k in ("step", "rng"):
                state[k] = jax.device_put(state[k], rep)
            self.state = state
            self._pp_apply = pp_logits_fn(
                self.model, self.mesh,
                n_microbatch=int(self.cfg.get("pp_microbatches", 2)),
            )
        elif placement == "fsdp" or use_tp:
            from ..parallel.fsdp import shard_like_params, shard_params_fsdp
            from ..parallel.tp import larp_ar_param_spec, shard_params_tp

            if placement == "fsdp":
                min_size = int(self.cfg.get("fsdp_min_size", 2**16))
                state["params"] = shard_params_fsdp(
                    state["params"], self.mesh, min_size=min_size,
                    tp_spec_fn=larp_ar_param_spec if use_tp else None,
                )
            else:
                state["params"] = shard_params_tp(state["params"], self.mesh)
            state["opt"] = shard_like_params(
                state["opt"], state["params"], self.mesh
            )
            state["ema_params"] = {
                k: shard_like_params(v, state["params"], self.mesh)
                for k, v in state["ema_params"].items()
            }
            for k in ("step", "rng"):
                state[k] = jax.device_put(state[k], rep)
            self.state = state
        else:
            self.state = jax.device_put(state, rep)
        self.vae_params = jax.device_put(self.vae_params, rep)

        self._train_step = jax.jit(
            functools.partial(self._step_impl, is_train=True), donate_argnums=(0,)
        )
        self._eval_step = jax.jit(functools.partial(self._step_impl, is_train=False))

    # ------------------------------------------------------------- step impl

    def _encode_tokens(self, vae_params, x, rng):
        out = self.vae.apply(
            {"params": vae_params}, x, train=False, rngs={"vq": rng}
        )
        return jax.lax.stop_gradient(out["bottleneck_rep"])

    def _make_cond_and_targets(self, vae_params, batch, rng):
        """Returns (cond, z). Overridden by the FP trainer."""
        x = common.video_to_float(batch["gt"])
        z = self._encode_tokens(vae_params, x, rng)
        cond = batch["label"].astype(jnp.int32)
        return cond, z

    def _loss_fn(self, params, z, cond, r_drop, is_train):
        if self._pp_apply is not None:
            from ..models.larp_ar import ar_sequence_loss

            logits = self._pp_apply(
                params, z[:, :-1], cond, is_train,
                rngs={"dropout": r_drop},
            )
            nll_sum, n = ar_sequence_loss(logits, z)
            return nll_sum / jnp.maximum(n, 1), logits
        logits, loss = self.model.apply(
            {"params": params}, z[:, :-1], cond, targets=z,
            train=is_train, rngs={"dropout": r_drop},
        )
        return loss, logits

    def _accum_grads(self, state, vae_params, batch, r_vq, r_drop):
        """cfg `grad_accum_steps: A`: one optimizer update from A sequential
        microbatches, as a lax.scan INSIDE the jitted step (grads summed in
        fp32, VAE encode + forward + backward per microbatch) — A x the
        effective batch at ~1/A the activation memory. The reference has no
        accumulation (its recipes fit per-GPU batches); this is the
        TPU-native lever for recipes whose global batch exceeds HBM."""
        A = self.grad_accum
        B = jax.tree_util.tree_leaves(batch)[0].shape[0]
        if B % A:
            raise ValueError(
                f"grad_accum_steps={A} must divide the per-step batch {B}"
            )
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape((A, B // A) + x.shape[1:]), batch
        )

        def body(carry, inp):
            g_acc, info_acc = carry
            mb, rv, rd = inp
            cond, z = self._make_cond_and_targets(vae_params, mb, rv)
            (loss, logits), g = jax.value_and_grad(
                lambda p: self._loss_fn(p, z, cond, rd, True), has_aux=True
            )(state["params"])
            info = {"loss": loss, **stats.topk_accuracy(logits, z, ks=(1, 5))}
            g_acc = jax.tree_util.tree_map(
                lambda a, b: a + b.astype(jnp.float32), g_acc, g
            )
            info_acc = jax.tree_util.tree_map(
                lambda a, b: a + b.astype(jnp.float32), info_acc, info
            )
            return (g_acc, info_acc), None

        g0 = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state["params"]
        )
        i0 = {k: jnp.zeros((), jnp.float32) for k in ("loss", "top1", "top5")}
        (g_sum, info_sum), _ = jax.lax.scan(
            body, (g0, i0), (micro, jax.random.split(r_vq, A),
                             jax.random.split(r_drop, A))
        )
        grads = jax.tree_util.tree_map(
            lambda g, p: (g / A).astype(p.dtype), g_sum, state["params"]
        )
        info = {k: v / A for k, v in info_sum.items()}
        return grads, info

    def _step_impl(self, state, vae_params, batch, is_train: bool):
        rng = state["rng"]
        rng, r_vq, r_drop = jax.random.split(rng, 3)

        if is_train:
            if self.grad_accum > 1:
                grads, info = self._accum_grads(
                    state, vae_params, batch, r_vq, r_drop
                )
            else:
                cond, z = self._make_cond_and_targets(vae_params, batch, r_vq)
                (loss, logits), grads = jax.value_and_grad(
                    lambda p: self._loss_fn(p, z, cond, r_drop, True),
                    has_aux=True,
                )(state["params"])
                info = {"loss": loss,
                        **stats.topk_accuracy(logits, z, ks=(1, 5))}
            updates, new_opt = self.tx.update(grads, state["opt"], state["params"])
            new_params = optax.apply_updates(state["params"], updates)
            ema_params = {
                d: ema_update(state["ema_params"][d], new_params, float(d))
                for d in state["ema_params"]
            }
        else:
            cond, z = self._make_cond_and_targets(vae_params, batch, r_vq)
            loss, logits = self._loss_fn(state["params"], z, cond, r_drop,
                                         False)
            new_params, new_opt = state["params"], state["opt"]
            ema_params = state["ema_params"]
            info = {"loss": loss, **stats.topk_accuracy(logits, z, ks=(1, 5))}
        keys = tuple(sorted(info))
        self._info_keys["train" if is_train else "eval"] = keys
        packed = jnp.stack([info[k].astype(jnp.float32) for k in keys])
        new_state = {
            "params": new_params,
            "opt": new_opt,
            "ema_params": ema_params,
            "step": state["step"] + (1 if is_train else 0),
            "rng": rng,
        }
        return new_state, packed

    # ------------------------------------------------------------ loop hooks

    def train_step(self, batch):
        with self._sp_ctx():
            self.state, packed = self._train_step(
                self.state, self.vae_params, batch
            )
        return (self._info_keys["train"], packed)

    def evaluate_step(self, batch):
        with self._sp_ctx():
            _, packed = self._eval_step(self.state, self.vae_params, batch)
        return dict(zip(self._info_keys["eval"], np.asarray(packed).tolist()))

    def _inference_params(self, params=None):
        """Params in the standard `layers_i` layout for generation / export
        (the pipeline layout stacks the trunk — parallel/pp.py). Costs one
        cross-'pipe' gather of the trunk; called once per visualization
        epoch / final export, not in the training hot path."""
        params = self.state["params"] if params is None else params
        if self._pp_apply is not None:
            from ..parallel.pp import unstack_layer_params

            params = unstack_layer_params(
                params["rest"], params["layers"], self.model_cfg.n_layer
            )
        return params

    def sample_videos(self, cond, key):
        """cond -> decoded videos [B, C, T, H, W] via compiled generation."""
        seq = generate(
            self.model, {"params": self._inference_params()}, cond,
            self.model.max_seq_length, key,
            cfg_scale=self.cfg_scale, cfg_interval=self.cfg_interval,
            temperature=self.temperature, top_k=self.top_k, top_p=self.top_p,
        )
        return self.vae.apply(
            {"params": self.vae_params}, seq, method=self.vae.decode_from_bottleneck
        )

    def visualize_epoch(self):
        if not self.is_master:
            return
        try:
            n = min(self.sample_batch_size, 4)
            if self.frame_prediction:
                batch = next(iter(self.test_loader(next(iter(self.test_datasets)))))
                x = jnp.asarray(common.video_to_float(batch["gt"][:n]))
                x_cond = common.repeat_to_m_frames(
                    x[:, :, : self.num_cond_frames], m=self.num_frames
                )
                c = self._encode_tokens(
                    self.vae_params, x_cond, jax.random.PRNGKey(0)
                )
                sep = jnp.full((n, 1), self.vae.codebook_size, jnp.int32)
                cond = jnp.concatenate([c, sep], axis=1)
            else:
                counts = np.asarray(
                    getattr(self.train_dataset, "label_count", None)
                    or [1] * self.model.num_classes,
                    np.float64,
                )
                probs = counts / counts.sum()
                cond = jnp.asarray(
                    np.random.choice(len(probs), size=n, p=probs), jnp.int32
                )
            videos = self.sample_videos(cond, jax.random.fold_in(self.base_key, self.epoch))
            vis_dir = common.ensure_path(os.path.join(self.save_dir, "vis"))
            self._save_samples(
                np.asarray(videos), os.path.join(vis_dir, f"samples_ep{self.epoch}.png")
            )
            self._maybe_fvd(videos)
        except Exception as e:
            self.log(f"visualize_epoch failed: {e}")

    def _maybe_fvd(self, videos):
        """gFVD of samples vs precomputed real stats
        (cfg.fvd_real_stats_path, reference larp_ar_trainer.py:325-341)."""
        stats_path = str(self.cfg.get("fvd_real_stats_path", "") or "")
        if not stats_path or not os.path.exists(stats_path):
            return
        try:
            from ..metrics.fvd import FeatureStats, FVDCalculator

            calc = FVDCalculator(self.cfg.get("i3d_weights"))
            if not (calc.pretrained or self.cfg.get("force_fvd", False)):
                return
            gen = calc.get_feature_stats_for_batch(jnp.asarray(videos))
            real = FeatureStats.load(stats_path)
            self.current_fvd = float(calc.calculate_fvd(gen, real))
            self.log(f"sample gFVD: {self.current_fvd:.3f}")
            self.log_temp_scalar("eval/gfvd", self.current_fvd)
        except Exception as e:
            self.log(f"gFVD computation failed: {e}")

    @staticmethod
    def _save_samples(videos, path, max_frames=8):
        import cv2

        b, c, t, h, w = videos.shape
        t = min(t, max_frames)
        rows = [
            np.concatenate([videos[i, :, j] for j in range(t)], axis=-1)
            for i in range(b)
        ]
        grid = np.concatenate(rows, axis=-2)
        img = np.clip(np.transpose(grid, (1, 2, 0)) * 255, 0, 255).astype(np.uint8)
        cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))

    def checkpoint_meta(self):
        meta = super().checkpoint_meta()
        meta["model"] = {
            "name": self.cfg["model"]["name"],
            "args": {
                k: v
                for k, v in dataclasses.asdict(self.model_cfg).items()
            },
        }
        meta["vae"] = self.cfg["vae"].to_dict()
        return meta

    def state_for_checkpoint(self):
        return self.state

    def export_state_for_final(self):
        """Final slim export in the standard (non-pipelined) param layout so
        `from_checkpoint` / sample.py load PP-trained models unchanged.
        epoch-last stays in the training layout (resume round-trips)."""
        state = dict(self.state)
        if self._pp_apply is not None:
            state["params"] = self._inference_params()
            state["ema_params"] = {
                d: self._inference_params(v)
                for d, v in state["ema_params"].items()
            }
        return state

    def load_state(self, state):
        sharded = (
            str(self.cfg.get("param_placement", "replicated")) == "fsdp"
            or self.mesh.shape.get("model", 1) > 1
            or self.mesh.shape.get("pipe", 1) > 1
        )
        if sharded:
            # re-apply the FSDP layout on resume: restored host arrays would
            # otherwise land replicated and OOM the very models FSDP exists
            # for. self.state already carries the sharded layout from
            # make_model — copy each restored leaf to its sharding.
            self.state = jax.tree_util.tree_map(
                lambda cur, new: jax.device_put(new, cur.sharding),
                self.state, state,
            )
        else:
            self.state = jax.device_put(state, replicated_sharding(self.mesh))


@trainers.register("larp_ar_trainer")
class LARPARTrainer(_ARTrainerBase):
    frame_prediction = False


@trainers.register("larp_ar_fp_trainer")
class LARPARFramePredictionTrainer(_ARTrainerBase):
    frame_prediction = True

    def _make_cond_and_targets(self, vae_params, batch, rng):
        x = common.video_to_float(batch["gt"])
        x_cond = common.repeat_to_m_frames(
            x[:, :, : self.num_cond_frames], m=self.num_frames
        )
        zc = self._encode_tokens(
            vae_params, jnp.concatenate([x, x_cond], axis=0), rng
        )
        z, c = jnp.split(zc, 2, axis=0)
        sep = jnp.full((c.shape[0], 1), self.vae.codebook_size, c.dtype)
        cond = jnp.concatenate([c, sep], axis=1)
        return cond, z
