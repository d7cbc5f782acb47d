"""BaseTrainer: SPMD epoch-loop runtime.

Re-expresses `/root/reference/trainers/base_trainer.py` TPU-first:
  * mp.spawn + NCCL DDP (base_trainer.py:128-131, train.py:162-169) collapse
    into ONE python process per host driving a jitted SPMD `train_step` over a
    `jax.sharding.Mesh`; gradient averaging is implicit in the partitioned
    program (no DDP hooks, no all_reduce calls).
  * AMP/GradScaler (base_trainer.py:83-95,429-438) -> bf16 compute policy;
    no loss scaling needed on TPU.
  * cosine/step LR with warmup (base_trainer.py:546-572) -> an optax-style
    schedule closure evaluated inside the compiled step. Note: the reference's
    'step' lr_type never applies a multiplier (lr_mult_epochwise stays 0 and
    the stepwise function returns before apply) — i.e. constant LR; we match.
  * resume from `<save_dir>/epoch-last` incl. optimizer+EMA+RNG key via one
    Orbax pytree (base_trainer.py:236-266,783-797) — per-rank RNG states are
    unnecessary because the PRNG key lives in the replicated train state.
  * distributed scalar averaging (base_trainer.py:582-591) is a jnp.mean
    inside jit; host-side Averagers aggregate per-epoch logs.
"""
from __future__ import annotations

import csv as _csv
import os
import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .. import registry
from ..config import ConfigDict, save_config
from ..data.loader import make_loader
from ..parallel import MeshConfig, create_mesh, shard_batch
from ..registry import trainers
from ..utils import common
from ..utils import checkpoint as ckpt_lib


def cosine_warmup_schedule(base_lr, warmup_steps, max_steps, min_lr_mult):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = min_lr_mult + (1.0 - min_lr_mult) * step / max(warmup_steps, 1)
        progress = (step - warmup_steps) / max(max_steps - warmup_steps, 1)
        cos = min_lr_mult + (1.0 - min_lr_mult) * 0.5 * (
            jnp.cos(jnp.pi * progress) + 1.0
        )
        return base_lr * jnp.where(step <= warmup_steps, warm, cos)

    return schedule


def constant_schedule(base_lr):
    return lambda step: jnp.asarray(base_lr, jnp.float32)


def make_lr_schedule(opt_cfg, base_lr, steps_per_epoch, max_epoch):
    lr_type = opt_cfg.get("lr_type", "cosine")
    if lr_type == "cosine":
        return cosine_warmup_schedule(
            base_lr,
            warmup_steps=opt_cfg.get("warmup_epoch", 0) * steps_per_epoch,
            max_steps=steps_per_epoch * max_epoch,
            min_lr_mult=opt_cfg.get("min_lr_mult", 0.1),
        )
    if lr_type == "step":
        return constant_schedule(base_lr)
    raise NotImplementedError(f"lr_type {lr_type}")


def ema_update(ema_params, new_params, decay: float):
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params,
        new_params,
    )


class BaseTrainer:
    def __init__(self, cfg: ConfigDict):
        self.cfg = cfg
        self.is_master = jax.process_index() == 0
        # cfg `mesh_model: N` carves a 2-D (data, model) mesh for tensor
        # parallelism (parallel/tp.py); cfg `mesh_pipe: N` carves a
        # (data, pipe) mesh for GPipe pipeline parallelism (parallel/pp.py).
        # Default is the reference-equivalent pure-DP layout (SURVEY.md §2.3).
        n_model = int(cfg.get("mesh_model", 1))
        n_pipe = int(cfg.get("mesh_pipe", 1))
        n_seq = int(cfg.get("mesh_seq", 1))
        if n_pipe > 1:
            if n_model > 1 or n_seq > 1:
                raise ValueError("mesh_pipe excludes mesh_model/mesh_seq")
            from ..parallel.pp import create_pp_mesh

            self.mesh = create_pp_mesh(
                data=jax.device_count() // n_pipe, pipe=n_pipe
            )
        else:
            # cfg `mesh_seq: N` adds ring-attention context parallelism
            # (parallel/ring.py): sequences shard over the 'seq' axis and
            # every eligible attention call rings over ICI
            self.mesh = create_mesh(MeshConfig(model=n_model, seq=n_seq))
        self.save_dir = cfg.get("save_dir", cfg.get("out_path", "save/run"))
        if self.is_master:
            common.ensure_path(self.save_dir)
            save_config(cfg, os.path.join(self.save_dir, "cfg.yaml"))
        self.logger = common.set_logger(
            os.path.join(self.save_dir, "log.txt") if self.is_master else None
        )
        self.writer = self._make_tb_writer()
        self.wandb = self._make_wandb()

        seed = int(cfg.get("manualSeed", 0) or 0)
        self.base_key = jax.random.PRNGKey(seed)
        np.random.seed(seed)

        self.epoch = 0
        self.global_step = 0
        self.log_buffer = []
        self.train_psnr = []
        self.train_loss = []
        self.current_fvd = 99999.99
        self.current_fid = 99999.99
        self.best_fvd = None

        ema_raw = str(cfg.get("ema_decay", "_"))
        self.ema_decays = [
            float(x) for x in ema_raw.split("_") if x not in ("", "none")
        ]

    # ------------------------------------------------------------------ infra

    def _make_tb_writer(self):
        if not self.is_master or not self.cfg.get("enable_tb", True):
            return None
        try:
            from torch.utils.tensorboard import SummaryWriter

            return SummaryWriter(os.path.join(self.save_dir, "tensorboard"))
        except Exception:
            return None

    def _make_wandb(self):
        """wandb run with offline fallback (reference base_trainer.py:166-229);
        enabled by cfg.wandb_upload, gated on the package being installed."""
        if not self.is_master or not self.cfg.get("wandb_upload", False):
            return None
        try:
            import socket
            import wandb

            mode = "online"
            try:
                socket.create_connection(("api.wandb.ai", 443), timeout=2).close()
            except OSError:
                mode = "offline"
            run = wandb.init(
                project=self.cfg.get("wandb_project") or "video_tokenizer_tpu",
                entity=self.cfg.get("wandb_entity"),
                name=os.path.basename(self.save_dir),
                dir=self.save_dir,
                mode=mode,
                config=self.cfg.to_dict(),
                resume="allow",
                id=self.cfg.get("wandb_run_id"),
            )
            self.log(f"wandb initialized (mode={mode})")
            return run
        except Exception as e:
            self.log(f"wandb unavailable: {e}")
            return None

    def log(self, msg: str):
        if self.is_master:
            self.logger.info(msg)

    def log_temp_scalar(self, k, v, t=None):
        step = t if t is not None else self.epoch
        if self.writer is not None:
            self.writer.add_scalar(k, v, global_step=step)
        if self.wandb is not None:
            self.wandb.log({k: v}, step=step)

    # ------------------------------------------------------------------- data

    def make_datasets(self):
        cfg = self.cfg
        train_spec = cfg["train_dataset"]
        self.train_dataset = registry.datasets.make(train_spec)
        loader_cfg = train_spec.get("loader", {})
        self.train_batch_size = int(loader_cfg.get("batch_size", 8))
        self.train_workers = int(loader_cfg.get("num_workers", 0))
        self.log(
            f"train dataset: {len(self.train_dataset)} samples, "
            f"batch {self.train_batch_size}"
        )

        self.test_datasets: Dict[str, Any] = {}
        test_spec = cfg.get("test_dataset")
        if test_spec is not None:
            csv_paths = test_spec.get("csv_paths", {})
            for name, csv_path in csv_paths.items():
                if not csv_path:
                    continue
                spec = {
                    "name": test_spec["name"],
                    "args": {
                        **dict(test_spec.get("args", {})),
                        "csv_file": csv_path,
                        "split": "test",
                    },
                }
                self.test_datasets[name] = registry.datasets.make(spec)
                self.log(
                    f"test dataset {name}: {len(self.test_datasets[name])} samples"
                )
            self.test_batch_size = int(
                test_spec.get("loader", {}).get("batch_size", self.train_batch_size)
            )
            self.test_workers = int(
                test_spec.get("loader", {}).get("num_workers", 0)
            )

    def train_loader(self, epoch: int):
        """One epoch of batches from a PERSISTENT grain stream.

        The worker pool is spawned once for the whole run: each grain worker
        process re-imports jax (~20s startup), so rebuilding the DataLoader
        per epoch — the reference's torch-DataLoader pattern
        (base_trainer.py:312-323, persistent_workers unset) — costs more
        than an entire short epoch. grain reshuffles every pass over the
        dataset internally; `epoch` is unused (kept for the hook signature).
        """
        if getattr(self, "_train_stream", None) is None:
            self._train_stream = make_loader(
                self.train_dataset,
                self.train_batch_size,
                num_workers=self.train_workers,
                shuffle=True,
                seed=int(self.cfg.get("manualSeed", 0) or 0),
                num_epochs=None,
            )

        def _one_epoch():
            for _ in range(self.n_steps_per_epoch):
                yield next(self._train_stream)

        return _one_epoch()

    def test_loader(self, name: str):
        return make_loader(
            self.test_datasets[name],
            self.test_batch_size,
            num_workers=self.test_workers,
            shuffle=False,
            seed=0,
            num_epochs=1,
            drop_remainder=False,
        )

    # ------------------------------------------------------------ state hooks

    def make_model(self):
        raise NotImplementedError

    def train_step(self, batch) -> Dict[str, float]:
        raise NotImplementedError

    def evaluate_step(self, batch) -> Dict[str, float]:
        raise NotImplementedError

    def visualize_epoch(self):
        pass

    def steps_per_epoch(self) -> int:
        """ONE definition of epoch length (per host): LR schedules, kl
        decay, and the epoch loop must agree on it."""
        return max(
            len(self.train_dataset)
            // (self.train_batch_size * max(jax.process_count(), 1)),
            1,
        )

    def state_for_checkpoint(self):
        raise NotImplementedError

    def export_state_for_final(self):
        """State for the slim `epoch-final` export; trainers whose training
        layout differs from the inference layout (e.g. pipeline-stacked
        params) override this to convert."""
        return self.state_for_checkpoint()

    def load_state(self, state):
        raise NotImplementedError

    def checkpoint_meta(self) -> Dict[str, Any]:
        return {
            "epoch": self.epoch,
            "global_step": self.global_step,
            "cfg": self.cfg.to_dict(),
        }

    # ------------------------------------------------------------------ loops

    def save_checkpoint(self, name: str, save_best: bool = False):
        # cfg `async_checkpoint` (default true): the epoch-loop save takes a
        # host snapshot and hands the Orbax write to a background thread, so
        # the next epoch's compute overlaps checkpoint I/O (the reference's
        # torch.save always blocks, base_trainer.py:783-891). Final/preempt
        # saves and restores stay blocking (ckpt_lib.wait_for_pending).
        block = not bool(self.cfg.get("async_checkpoint", True))
        path = os.path.join(self.save_dir, name)
        t0 = time.time()
        ckpt_lib.save_checkpoint(
            path, self.state_for_checkpoint(), self.checkpoint_meta(),
            block=block,
        )
        verb = "saved to" if block else "dispatched (async) to"
        self.log(f"checkpoint {verb} {path} ({time.time() - t0:.1f}s)")
        if save_best:
            self._maybe_save_best()

    def save_final_checkpoint(self):
        """Slim end-of-training export: params/EMA only, optimizer + RNG
        dropped (reference base_trainer.py:831-859 — final-epoch checkpoints
        strip optimizer/RNG; `model_sd_only` export). Always written, even
        when `latest_interval` never divides `max_epoch`, so every completed
        run leaves a loadable checkpoint."""
        state = self.export_state_for_final()
        keep = {
            k: v for k, v in state.items()
            if k in ("params", "ema_params", "loss_params", "step")
        }
        path = os.path.join(self.save_dir, "epoch-final")
        ckpt_lib.save_checkpoint(path, keep, self.checkpoint_meta())
        self.log(f"final slim checkpoint saved to {path}")

    def _maybe_save_best(self):
        """Keep a single best_fvd_<value> checkpoint (reference
        base_trainer.py:863-891: best-by-FVD file naming)."""
        import glob
        import shutil

        if self.current_fvd >= 99999.0:
            return
        existing = glob.glob(os.path.join(self.save_dir, "best_fvd_*"))
        best_prev = None
        for p in existing:
            try:
                best_prev = float(os.path.basename(p).split("_")[-1])
            except ValueError:
                continue
        if best_prev is not None and self.current_fvd >= best_prev:
            return
        for p in existing:
            shutil.rmtree(p, ignore_errors=True)
        name = f"best_fvd_{self.current_fvd:.2f}"
        ckpt_lib.save_checkpoint(
            os.path.join(self.save_dir, name),
            self.state_for_checkpoint(), self.checkpoint_meta(),
        )
        self.log(f"new best checkpoint: {name}")

    def try_resume(self) -> bool:
        path = os.path.join(self.save_dir, "epoch-last")
        if not ckpt_lib.checkpoint_exists(path) or self.cfg.get("replace", False):
            return False
        meta = ckpt_lib.load_meta(path)
        state = ckpt_lib.restore_checkpoint(path, self.state_for_checkpoint())
        self.load_state(state)
        self.epoch = meta["epoch"]
        self.global_step = meta["global_step"]
        # mid-epoch preemption checkpoint: the interrupted epoch replays
        # with its first `resume_skip_steps` batches consumed but NOT
        # re-applied (they are already in the restored state); data order is
        # epoch-seeded so the fast-forward is exact
        self._resume_skip = int(meta.get("resume_skip_steps", 0) or 0)
        self.log(
            f"resumed from {path} at epoch {self.epoch}"
            + (f" (+{self._resume_skip} steps)" if self._resume_skip else "")
        )
        return True

    def run(self):
        self.make_datasets()
        self.make_model()
        resumed = self.try_resume()
        if not resumed:
            self.try_init_checkpoint()
        self.starting_epoch = self.epoch + 1 if resumed else 1
        self.train()

    def try_init_checkpoint(self):
        """Warm-start params from cfg.init_checkpoint without resuming
        optimizer/epoch state (reference base_trainer.py:269-281)."""
        path = str(self.cfg.get("init_checkpoint", "") or "")
        if not path or not ckpt_lib.checkpoint_exists(path):
            return
        state = ckpt_lib.restore_checkpoint(path)
        cur = self.state_for_checkpoint()
        warm = dict(cur)
        for k in ("params", "loss_params", "ema_params"):
            if k in state and k in warm:
                warm[k] = state[k]
        self.load_state(warm)
        self.log(f"warm-started params from {path}")

    # ------------------------------------------------------- preemption safety

    def _install_preemption_handler(self):
        """cfg `save_on_preempt` (default true): catch SIGTERM — the advance
        warning TPU pods get before eviction — and request a checkpoint at
        the next step boundary. The reference has no preemption handling
        (SURVEY.md §5: auto-resume from epoch-last only, losing up to a full
        epoch); here an evicted run loses at most one step."""
        self._preempt_requested = False
        if not bool(self.cfg.get("save_on_preempt", True)):
            return
        import signal
        import threading

        if threading.current_thread() is not threading.main_thread():
            return

        def handler(signum, frame):
            self._preempt_requested = True

        try:
            signal.signal(signal.SIGTERM, handler)
        except (ValueError, OSError):
            pass

    def _sp_ctx(self):
        """cfg `sequence_parallel: true` (with mesh_model > 1): trace the
        jitted steps under parallel.tp.sequence_parallel so inter-block
        activations shard over 'model' on the sequence dim (Megatron-SP).
        The constraint bakes in at trace time; entering the context on every
        call is a no-op afterwards. Honored by any model whose blocks call
        parallel.tp.seq_constraint (the AR trunk and the tokenizer ViT
        stacks)."""
        import contextlib

        stack = contextlib.ExitStack()
        if bool(self.cfg.get("sequence_parallel", False)) and (
            self.mesh.shape.get("model", 1) > 1
        ):
            from ..parallel.tp import sequence_parallel

            stack.enter_context(sequence_parallel(self.mesh))
        if self.mesh.shape.get("seq", 1) > 1:
            from ..parallel.ring import ring_sequence

            stack.enter_context(ring_sequence(self.mesh))
        return stack

    def _maybe_preempt(self):
        """Checkpoint + clean-exit if a SIGTERM flag is pending. Called at
        every step boundary AND between the epoch's phases (eval / vis /
        saves can run for minutes — a flag raised there must not wait for
        the next epoch's first training step)."""
        if getattr(self, "_preempt_requested", False):
            self._checkpoint_on_preempt()

    def _checkpoint_on_preempt(self):
        """Save a resumable epoch-last and exit cleanly. Mid-epoch, the meta
        epoch is rolled back one and `resume_skip_steps` records how many of
        the interrupted epoch's batches were already applied: `try_resume` +
        `train_epoch` replay the epoch's (deterministic, epoch-seeded) data
        stream, consuming those batches without re-applying them — exact
        step-granular resume, no double-trained batches. If this epoch's
        training already completed (preempt during eval/vis/save), no
        rollback — resume continues with the next epoch."""
        meta = self.checkpoint_meta()
        epoch_done = getattr(self, "_epoch_complete", False)
        meta["epoch"] = self.epoch if epoch_done else self.epoch - 1
        if not epoch_done:
            meta["resume_skip_steps"] = getattr(self, "_epoch_step", 0)
        meta["preempted"] = True
        path = os.path.join(self.save_dir, "epoch-last")
        ckpt_lib.save_checkpoint(path, self.state_for_checkpoint(), meta)
        self.log(f"preempted: checkpoint saved to {path}; exiting")
        raise SystemExit(0)

    def train(self):
        cfg = self.cfg
        self._install_preemption_handler()
        max_epoch = int(cfg["max_epoch"])
        eval_epoch = int(cfg.get("eval_epoch", max_epoch + 1))
        vis_epoch = int(cfg.get("vis_epoch", max_epoch + 1))
        save_epoch = int(cfg.get("save_epoch", max_epoch + 1))
        latest_interval = int(cfg.get("latest_interval", 1))
        timer = common.EpochTimer(max_epoch)
        self.n_steps_per_epoch = self.steps_per_epoch()
        self.max_steps = self.n_steps_per_epoch * max_epoch

        for epoch in range(self.starting_epoch, max_epoch + 1):
            self.epoch = epoch
            self.global_step = (epoch - 1) * self.n_steps_per_epoch
            self.log_buffer = [f"Epoch {epoch}"]
            self.t_data, self.t_model = 0.0, 0.0

            st = time.time()
            self._epoch_complete = False
            self.train_epoch()
            self._epoch_complete = True
            self.log(f"Epoch {epoch} training done. Time: {time.time()-st:.2f}s")
            self._maybe_preempt()

            if epoch % eval_epoch == 0:
                self.evaluate_epoch()
                self._maybe_preempt()
            if epoch % vis_epoch == 0:
                self.visualize_epoch()
                self._maybe_preempt()
            if epoch % save_epoch == 0:
                self.save_checkpoint(f"epoch-{epoch}")
            if epoch % latest_interval == 0:
                self.save_checkpoint(
                    "epoch-last", save_best=bool(cfg.get("save_best", False))
                )
            self._maybe_preempt()

            epoch_time, tot_time, est_time = timer.epoch_done()
            d_ratio = self.t_data / (self.t_data + self.t_model + 1e-6)
            self.log_buffer.append(
                f"{epoch_time} (d {d_ratio:.2f}) {tot_time}/{est_time}"
            )
            self.log(", ".join(self.log_buffer))

        self.dump_csv()
        if max_epoch >= self.starting_epoch:
            self.save_final_checkpoint()
        ckpt_lib.wait_for_pending()  # don't return with an in-flight save

    def train_epoch(self):
        ave: Dict[str, common.Averager] = {}
        deferred = []  # (keys, device_array) — fetched once at epoch end
        # `profile_steps: N` in cfg captures a jax.profiler device trace of
        # the first N steps (skipping step 1 = compile) to save_dir/profile,
        # viewable in Perfetto/TensorBoard (SURVEY.md §5: the reference has
        # wall-clock instrumentation only; this is the TPU-native upgrade).
        profile_steps = int(self.cfg.get("profile_steps", 0))
        profiling = False
        epoch_step = 0
        # exact mid-epoch resume (see _checkpoint_on_preempt): consume the
        # already-applied batches of the interrupted epoch without stepping
        skip = getattr(self, "_resume_skip", 0)
        self._resume_skip = 0
        t1 = time.time()
        for batch in self.train_loader(self.epoch):
            self.global_step += 1
            epoch_step += 1
            self._epoch_step = epoch_step
            if skip > 0:
                skip -= 1
                t1 = time.time()
                continue
            if profile_steps and self.epoch == self.starting_epoch:
                if epoch_step == 2:
                    jax.profiler.start_trace(
                        os.path.join(self.save_dir, "profile")
                    )
                    profiling = True
                elif profiling and epoch_step == 2 + profile_steps:
                    jax.block_until_ready(deferred[-1][1] if deferred else 0)
                    jax.profiler.stop_trace()
                    profiling = False
                    self.log(f"profiler trace ({profile_steps} steps) -> "
                             f"{os.path.join(self.save_dir, 'profile')}")
            t0 = time.time()
            self.t_data += t0 - t1
            batch_dev = shard_batch(self.mesh, {"gt": batch["gt"], "label": batch.get("label", np.zeros(len(batch["gt"])))})
            ret = self.train_step(batch_dev)
            self.t_model += time.time() - t0
            self._maybe_preempt()
            B = len(batch["gt"])
            if isinstance(ret, tuple):
                # deferred device telemetry: no host sync inside the epoch,
                # steps pipeline freely through the async dispatch queue
                deferred.append(ret)
            else:
                for k, v in ret.items():
                    ave.setdefault(k, common.Averager()).add(float(v), n=B)
            t1 = time.time()
        if profiling:
            jax.block_until_ready(deferred[-1][1] if deferred else 0)
            jax.profiler.stop_trace()

        for keys, packed in deferred:
            vals = np.asarray(packed)
            for k, v in zip(keys, vals.tolist()):
                ave.setdefault(k, common.Averager()).add(v)

        logtext = "train:"
        for k, v in ave.items():
            logtext += f" {k}={v.item():.4f}"
            self.log_temp_scalar("train/" + k, v.item())
        self.log_buffer.append(logtext)
        if "psnr" in ave:
            self.train_psnr.append(ave["psnr"].item())
        if "loss" in ave:
            self.train_loss.append(ave["loss"].item())

    def evaluate_epoch(self):
        for name in self.test_datasets:
            ave: Dict[str, common.Averager] = {}
            for batch in self.test_loader(name):
                batch_dev = shard_batch(
                    self.mesh,
                    {"gt": batch["gt"], "label": batch.get("label", np.zeros(len(batch["gt"])))},
                )
                ret = self.evaluate_step(batch_dev)
                self._maybe_preempt()
                B = len(batch["gt"])
                for k, v in ret.items():
                    ave.setdefault(k, common.Averager()).add(float(v), n=B)
            logtext = f"eval {name}:"
            for k, v in ave.items():
                logtext += f" {k}={v.item():.4f}"
                self.log_temp_scalar(f"eval_{name}/{k}", v.item())
            self.log_buffer.append(logtext)
            self.log(logtext)

    def dump_csv(self):
        if not self.is_master:
            return
        path = os.path.join(self.save_dir, "results.csv")
        with open(path, "w", newline="") as f:
            w = _csv.writer(f)
            w.writerow(["epoch", "train_psnr", "train_loss"])
            for i, (p, l) in enumerate(
                zip(
                    self.train_psnr or [None] * len(self.train_loss),
                    self.train_loss or [None] * len(self.train_psnr),
                )
            ):
                w.writerow([i + 1, p, l])
