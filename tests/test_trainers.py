"""Trainer-level tests on the 8-device CPU mesh: steps, resume, checkpoints."""
import jax
import numpy as np
import pytest

from video_tokenizer_tpu.config import ConfigDict
import video_tokenizer_tpu.models  # noqa: F401
import video_tokenizer_tpu.data  # noqa: F401
import video_tokenizer_tpu.trainers  # noqa: F401
from video_tokenizer_tpu.registry import trainers
from video_tokenizer_tpu.parallel import shard_batch


def _tok_cfg(tmp_path, **over):
    cfg = {
        "save_dir": str(tmp_path / "run"),
        "manualSeed": 0,
        "max_epoch": 1,
        "eval_epoch": 10,
        "vis_epoch": 10,
        "latest_interval": 1,
        "loss_q_weight": 0.1,
        "use_amp": False,
        "train_dataset": {
            "name": "video_dataset",
            "args": {
                "root_path": "/tmp", "split": "train", "frame_num": 8,
                "csv_file": "null128", "crop_size": 32, "cls_vid_num": "-1_-1",
            },
            "loader": {"batch_size": 8, "num_workers": 0},
        },
        "model": {
            "name": "larp_tokenizer",
            "args": {
                "bottleneck": {
                    "name": "bottleneck",
                    "args": {
                        "bottleneck_dim": 8, "norm": "none",
                        "regularizer": {
                            "name": "vq",
                            "args": {
                                "codebook_size": 64, "l2_normalized": True,
                                "stochastic": True,
                                "stochastic_temperature": 0.03,
                            },
                        },
                    },
                },
                "prior_model": {"name": "none"},
                "bottleneck_token_num": 16, "input_size": 32, "frame_num": 8,
                "encoder_hidden_size": 64, "decoder_hidden_size": 64,
                "encoder_num_heads": 4, "decoder_num_heads": 4,
                "encoder_depth": 1, "decoder_depth": 1,
            },
        },
        "loss": {
            "name": "lpips_disc_loss",
            "args": {
                "disc_start": 0, "disc_loss": "hinge", "disc_weight": 0.3,
                "d_update_freq": 1, "disc_tran_hidden_size": 64,
                "disc_tran_n_heads": 4, "disc_tran_n_layers": 1,
                "disc_tran_temporal_patch_size": 4, "disc_tran_patch_size": 8,
                "input_spatial_size": 32, "frame_num": 8,
            },
        },
        "optimizer": {
            "name": "adam", "args": {"lr": 1e-4, "betas": [0.5, 0.9]},
            "loss_args": {"lr": 3e-5, "betas": [0.5, 0.9]},
            "lr_type": "cosine", "warmup_epoch": 1, "min_lr_mult": 0.01,
        },
    }
    cfg.update(over)
    return ConfigDict(cfg)


def _fetch(ret):
    """train_step returns (keys, device_packed) — fetch for assertions."""
    import numpy as _np
    if isinstance(ret, tuple):
        keys, packed = ret
        return dict(zip(keys, _np.asarray(packed).tolist()))
    return ret


def _batch(b=8):
    rng = np.random.RandomState(0)
    return {
        "gt": rng.rand(b, 3, 8, 32, 32).astype(np.float32),
        "label": np.zeros(b, np.int32),
    }


class TestTokenizerTrainer:
    def test_step_and_checkpoint_resume(self, tmp_path):
        cfg = _tok_cfg(tmp_path, ema_decay="0.999")
        tr = trainers.make({"name": "larp_tokenizer_trainer"}, args={"cfg": cfg})
        tr.make_datasets()
        tr.n_steps_per_epoch = 4
        tr.epoch = 1
        tr.make_model()
        batch = shard_batch(tr.mesh, _batch())
        info1 = _fetch(tr.train_step(batch))
        assert np.isfinite(info1["loss"])
        assert "index_usage" in info1 and "perplexity" in info1
        step_after = int(tr.state["step"])
        tr.save_checkpoint("epoch-last")

        # fresh trainer resumes the exact state
        tr2 = trainers.make({"name": "larp_tokenizer_trainer"}, args={"cfg": cfg})
        tr2.make_datasets()
        tr2.n_steps_per_epoch = 4
        tr2.epoch = 1
        tr2.make_model()
        assert tr2.try_resume()
        assert int(tr2.state["step"]) == step_after
        a = np.asarray(
            tr.state["params"]["x_embedder"]["proj"]["kernel"]
        )
        b = np.asarray(
            tr2.state["params"]["x_embedder"]["proj"]["kernel"]
        )
        assert np.array_equal(a, b)
        # EMA state survives
        assert "0.999" in tr2.state["ema_params"]

    def test_bn_bottleneck_norm_trains_and_resumes(self, tmp_path):
        """bottleneck norm 'bn_b' (BatchNorm, reference bottleneck.py:98-128):
        running stats thread through the jitted GAN step, update on train,
        and round-trip through checkpoints."""
        cfg = _tok_cfg(tmp_path)
        cfg["model"]["args"]["bottleneck"]["args"]["norm"] = "bn_b"
        tr = trainers.make(
            {"name": "larp_tokenizer_trainer"}, args={"cfg": cfg}
        )
        tr.make_datasets()
        tr.n_steps_per_epoch = 4
        tr.epoch = 1
        tr.make_model()
        stats0 = jax.tree_util.tree_leaves(tr.state["batch_stats"])
        assert stats0  # BN collections exist
        before = np.asarray(stats0[0]).copy()
        info = _fetch(tr.train_step(shard_batch(tr.mesh, _batch())))
        assert np.isfinite(info["loss"])
        after = np.asarray(
            jax.tree_util.tree_leaves(tr.state["batch_stats"])[0]
        )
        assert not np.array_equal(before, after)  # running stats updated
        tr.save_checkpoint("epoch-last")

        tr2 = trainers.make(
            {"name": "larp_tokenizer_trainer"}, args={"cfg": cfg}
        )
        tr2.make_datasets()
        tr2.n_steps_per_epoch = 4
        tr2.epoch = 1
        tr2.make_model()
        assert tr2.try_resume()
        np.testing.assert_array_equal(
            after,
            np.asarray(jax.tree_util.tree_leaves(tr2.state["batch_stats"])[0]),
        )

    def test_tp_tokenizer_matches_replicated(self, tmp_path):
        """cfg `mesh_model: 2` + `sequence_parallel: true` on the tokenizer
        GAN trainer: Megatron TP+SP over the ViT stacks
        (parallel/tp.py:vit_param_spec + seq_constraint) reproduces the
        pure-DP loss trajectory, and qkv kernels carry 'model' shardings."""
        losses = {}
        for name, over in (
            ("dp", {}),
            ("tp", {"mesh_model": 2, "sequence_parallel": True}),
        ):
            tr = trainers.make(
                {"name": "larp_tokenizer_trainer"},
                args={"cfg": _tok_cfg(tmp_path / name, **over)},
            )
            tr.make_datasets()
            tr.n_steps_per_epoch = 4
            tr.epoch = 1
            tr.make_model()
            traj = []
            for _ in range(2):
                traj.append(
                    _fetch(tr.train_step(shard_batch(tr.mesh, _batch())))["loss"]
                )
            losses[name] = traj
            if name == "tp":
                assert tr.mesh.shape["model"] == 2
                qkv = tr.state["params"]["encoder"]["blocks_0"][
                    "attn"]["qkv"]["kernel"]
                assert "model" in str(qkv.sharding.spec)
        np.testing.assert_allclose(losses["dp"], losses["tp"], rtol=2e-4)

    def test_fsdp_tp_composed_tokenizer_step(self, tmp_path):
        """param_placement fsdp + mesh_model 2 on the tokenizer GAN trainer:
        ZeRO-3 over 'data' composed with ViT Megatron TP over 'model'."""
        tr = trainers.make(
            {"name": "larp_tokenizer_trainer"},
            args={"cfg": _tok_cfg(
                tmp_path, mesh_model=2, param_placement="fsdp",
                fsdp_min_size=512,
            )},
        )
        tr.make_datasets()
        tr.n_steps_per_epoch = 4
        tr.epoch = 1
        tr.make_model()
        info = _fetch(tr.train_step(shard_batch(tr.mesh, _batch())))
        assert np.isfinite(info["loss"])
        spec = str(jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(
                lambda p: str(p.sharding.spec),
                tr.state["params"]["encoder"]["blocks_0"]["attn"],
            )
        ))
        assert "model" in spec and "data" in spec

    def test_grad_accum_matches_full_batch(self, tmp_path):
        """cfg `grad_accum_steps: 2` on the GAN trainer: with the sources of
        the documented accumulation deviations switched off (discriminator
        gated off, deterministic VQ), two scanned microbatches reproduce the
        full-batch generator loss trajectory."""
        losses = {}
        for name, over in (("full", {}), ("accum", {"grad_accum_steps": 2})):
            cfg = _tok_cfg(tmp_path / name, **over)
            cfg["model"]["args"]["bottleneck"]["args"]["regularizer"]["args"][
                "stochastic"] = False
            cfg["loss"]["args"]["disc_start"] = 100  # D inert -> exact match
            tr = trainers.make(
                {"name": "larp_tokenizer_trainer"}, args={"cfg": cfg}
            )
            tr.make_datasets()
            tr.n_steps_per_epoch = 4
            tr.epoch = 0
            tr.make_model()
            traj = []
            for _ in range(2):
                traj.append(
                    _fetch(tr.train_step(shard_batch(tr.mesh, _batch())))["loss"]
                )
            losses[name] = traj
        np.testing.assert_allclose(losses["full"], losses["accum"], rtol=3e-5)

    def test_grad_accum_gan_step(self, tmp_path):
        """Accumulated step with the discriminator LIVE: both optimizers
        update from the scanned microbatch grads (D gating intact)."""
        cfg = _tok_cfg(tmp_path, grad_accum_steps=2)
        cfg["loss"]["args"]["d_update_loss_threshold"] = -1e9
        tr = trainers.make(
            {"name": "larp_tokenizer_trainer"}, args={"cfg": cfg}
        )
        tr.make_datasets()
        tr.n_steps_per_epoch = 4
        tr.epoch = 1
        tr.make_model()
        disc_before = np.asarray(
            tr.state["loss_params"]["discriminator"]["fc"]["kernel"]
        ).copy()
        gen_before = np.asarray(
            tr.state["params"]["x_embedder"]["proj"]["kernel"]
        ).copy()
        info = _fetch(tr.train_step(shard_batch(tr.mesh, _batch())))
        assert np.isfinite(info["loss"])
        assert "index_usage" in info and "perplexity" in info
        assert not np.array_equal(
            disc_before,
            np.asarray(tr.state["loss_params"]["discriminator"]["fc"]["kernel"]),
        )
        assert not np.array_equal(
            gen_before,
            np.asarray(tr.state["params"]["x_embedder"]["proj"]["kernel"]),
        )

    def test_disc_update_freq_gating(self, tmp_path):
        cfg = _tok_cfg(tmp_path)
        cfg["loss"]["args"]["d_update_freq"] = 1000  # never on these steps
        tr = trainers.make({"name": "larp_tokenizer_trainer"}, args={"cfg": cfg})
        tr.make_datasets()
        tr.n_steps_per_epoch = 4
        tr.epoch = 1
        tr.make_model()
        disc_before = np.asarray(
            tr.state["loss_params"]["discriminator"]["fc"]["kernel"]
        ).copy()
        gen_before = np.asarray(
            tr.state["params"]["x_embedder"]["proj"]["kernel"]
        ).copy()
        tr.state["step"] = tr.state["step"] + 1  # step%freq != 0
        tr.train_step(shard_batch(tr.mesh, _batch()))
        disc_after = np.asarray(
            tr.state["loss_params"]["discriminator"]["fc"]["kernel"]
        )
        gen_after = np.asarray(
            tr.state["params"]["x_embedder"]["proj"]["kernel"]
        )
        assert np.array_equal(disc_before, disc_after)  # gated off
        assert not np.array_equal(gen_before, gen_after)  # generator trained


def _ar_cfg(tmp_path, **over):
    cfg = _tok_cfg(tmp_path)
    cfg["vae"] = {
        "name": "larp_tokenizer", "checkpoint": "",
        "args": cfg["model"]["args"].to_dict(),
    }
    cfg["model"] = {
        "name": "larp_ar",
        "args": {
            "num_classes": 101, "token_dropout_p": 0.0,
            "resid_dropout_p": 0.0, "ffn_dropout_p": 0.0,
            "dim": 64, "n_layer": 1, "n_head": 4,
        },
    }
    cfg["ar"] = {"num_samples": 2, "sample_batch_size": 2, "num_frames": 8}
    cfg["optimizer"] = {
        "name": "adamw", "args": {"lr": 6e-4, "weight_decay": 0.05},
        "lr_type": "cosine", "warmup_epoch": 1, "min_lr_mult": 0.1,
    }
    cfg.update(over)
    return cfg


def _make_ar_trainer(cfg):
    tr = trainers.make({"name": "larp_ar_trainer"}, args={"cfg": cfg})
    tr.make_datasets()
    tr.n_steps_per_epoch = 4
    tr.make_model()
    return tr


class TestARTrainer:
    def test_step(self, tmp_path):
        cfg = _ar_cfg(tmp_path)
        tr = _make_ar_trainer(cfg)
        info = _fetch(tr.train_step(shard_batch(tr.mesh, _batch())))
        assert np.isfinite(info["loss"])
        assert 0.0 <= info["top1"] <= 1.0 and info["top1"] <= info["top5"]
        # AdamW decay mask: kernels decay, norms/embeddings don't — check the
        # labels by running a second step without error
        info2 = _fetch(tr.train_step(shard_batch(tr.mesh, _batch())))
        assert np.isfinite(info2["loss"])

    def test_tp_trainer_matches_replicated(self, tmp_path):
        """cfg `mesh_model: 2` + `sequence_parallel: true`: the trainer's
        (data=4, model=2) TP+SP step reproduces the pure-DP loss trajectory,
        and params actually carry 'model'-axis shardings."""
        losses = {}
        for name, over in (
            ("dp", {}),
            ("tp", {"mesh_model": 2, "sequence_parallel": True}),
        ):
            tr = _make_ar_trainer(_ar_cfg(tmp_path / name, **over))
            traj = []
            for _ in range(2):
                traj.append(
                    _fetch(tr.train_step(shard_batch(tr.mesh, _batch())))["loss"]
                )
            losses[name] = traj
            if name == "tp":
                assert tr.mesh.shape["model"] == 2
                wqkv = tr.state["params"]["layers_0"]["attention"]["wqkv"]["kernel"]
                assert "model" in str(wqkv.sharding.spec)
        np.testing.assert_allclose(losses["dp"], losses["tp"], rtol=2e-4)

    def test_ring_trainer_matches_replicated(self, tmp_path):
        """cfg `mesh_seq: 2`: ring-attention context parallelism on a
        (data=4, seq=2) mesh reproduces the pure-DP loss trajectory — the
        ambient ring_sequence context reroutes the model's attention calls
        with no model changes (parallel/ring.py)."""
        losses = {}
        for name, over in (
            ("dp", {}),
            ("ring", {"mesh_seq": 2}),
        ):
            tr = _make_ar_trainer(_ar_cfg(tmp_path / name, **over))
            traj = []
            for _ in range(2):
                traj.append(
                    _fetch(tr.train_step(shard_batch(tr.mesh, _batch())))["loss"]
                )
            losses[name] = traj
            if name == "ring":
                assert tr.mesh.shape["seq"] == 2
        np.testing.assert_allclose(losses["dp"], losses["ring"], rtol=2e-4)

    def test_grad_accum_matches_full_batch(self, tmp_path):
        """cfg `grad_accum_steps: 2`: two scanned microbatches per optimizer
        update reproduce the full-batch loss trajectory exactly (equal-size
        microbatches, fp32 grad accumulators; dropout/stochastic-VQ are off
        in this cfg so the RNG split difference is inert)."""
        losses = {}
        for name, over in (("full", {}), ("accum", {"grad_accum_steps": 2})):
            tr = _make_ar_trainer(_ar_cfg(tmp_path / name, **over))
            traj = []
            for _ in range(3):
                traj.append(
                    _fetch(tr.train_step(shard_batch(tr.mesh, _batch())))["loss"]
                )
            losses[name] = traj
        np.testing.assert_allclose(losses["full"], losses["accum"], rtol=2e-5)

    def test_pp_trainer_matches_replicated(self, tmp_path):
        """cfg `mesh_pipe: 2`: the trainer's GPipe pipeline step on a
        (data=4, pipe=2) mesh reproduces the pure-DP loss trajectory, and
        the final slim export converts back to the standard param layout
        loadable by from_checkpoint."""
        from video_tokenizer_tpu.utils.model_io import (
            load_model_from_checkpoint,
        )

        losses = {}
        for name, over in (
            ("dp", {}),
            ("pp", {"mesh_pipe": 2, "pp_microbatches": 2}),
        ):
            cfg = _ar_cfg(tmp_path / name, **over)
            cfg["model"]["args"]["n_layer"] = 2
            tr = _make_ar_trainer(cfg)
            traj = []
            for _ in range(2):
                traj.append(
                    _fetch(tr.train_step(shard_batch(tr.mesh, _batch())))["loss"]
                )
            losses[name] = traj
            if name == "pp":
                assert tr.mesh.shape["pipe"] == 2
                assert set(tr.state["params"]) == {"rest", "layers"}
                tr.save_final_checkpoint()
                import os

                final = os.path.join(cfg["save_dir"], "epoch-final")
                model, params = load_model_from_checkpoint(final)
                assert "layers_1" in params  # standard layout restored
        np.testing.assert_allclose(losses["dp"], losses["pp"], rtol=2e-4)

    def test_pp_resume_roundtrip(self, tmp_path):
        """mesh_pipe resume: epoch-last stays in the stacked pipeline
        layout and try_resume re-applies the pipe shardings."""
        cfg = _ar_cfg(tmp_path, mesh_pipe=2, pp_microbatches=2)
        cfg["model"]["args"]["n_layer"] = 2
        tr = _make_ar_trainer(cfg)
        tr.train_step(shard_batch(tr.mesh, _batch()))
        step_after = int(tr.state["step"])
        tr.save_checkpoint("epoch-last")

        tr2 = _make_ar_trainer(cfg)
        assert tr2.try_resume()
        assert int(tr2.state["step"]) == step_after
        layers = tr2.state["params"]["layers"]
        leaf = jax.tree_util.tree_leaves(layers)[0]
        assert "pipe" in str(leaf.sharding.spec)

    def test_fsdp_tp_composed_trainer_step(self, tmp_path):
        """param_placement fsdp + mesh_model 2: ZeRO-3 over 'data' composed
        with Megatron TP over 'model' inside the real trainer."""
        tr = _make_ar_trainer(_ar_cfg(
            tmp_path, mesh_model=2, param_placement="fsdp", fsdp_min_size=512,
        ))
        info = _fetch(tr.train_step(shard_batch(tr.mesh, _batch())))
        assert np.isfinite(info["loss"])
        spec = str(jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(
                lambda p: str(p.sharding.spec),
                tr.state["params"]["layers_0"]["attention"]["wqkv"],
            )
        ))
        assert "model" in spec and "data" in spec


class TestEpochLoop:
    def test_run_full_epoch_uint8_profile_final_ckpt(self, tmp_path):
        """trainer.run(): real loader (uint8 clips), deferred telemetry,
        jax.profiler trace, and the slim epoch-final export reloading via
        load_model_from_checkpoint."""
        import os

        from video_tokenizer_tpu.utils.model_io import load_model_from_checkpoint

        cfg = _tok_cfg(tmp_path, ema_decay="0.999", profile_steps=1)
        # 2 steps/epoch: shrink the fake dataset via batch accounting
        cfg["train_dataset"]["loader"]["batch_size"] = 8
        cfg["latest_interval"] = 10  # never: epoch-final must still appear
        tr = trainers.make({"name": "larp_tokenizer_trainer"}, args={"cfg": cfg})
        tr.make_datasets()
        # keep it cheap: trim the epoch to 2 batches
        full_loader = tr.train_loader

        def short_loader(epoch):
            for i, b in enumerate(full_loader(epoch)):
                if i >= 2:
                    break
                assert b["gt"].dtype == np.uint8  # pipeline ships uint8
                yield b

        tr.train_loader = short_loader
        tr.n_steps_per_epoch = 2
        tr.make_model()
        tr.run()

        assert tr.train_loss and np.isfinite(tr.train_loss[-1])
        prof = os.path.join(cfg["save_dir"], "profile")
        assert os.path.isdir(prof) and os.listdir(prof)  # trace captured
        final = os.path.join(cfg["save_dir"], "epoch-final")
        assert os.path.isdir(final)
        model, params = load_model_from_checkpoint(final)
        out = model.apply(
            {"params": params},
            np.random.rand(1, 3, 8, 32, 32).astype(np.float32),
        )
        assert out["pred_frames"].shape == (1, 3, 8, 32, 32)
        # EMA variant loads too
        _, ema = load_model_from_checkpoint(final, version="ema_0.999")
        assert ema is not None

    def test_preemption_checkpoint_and_resume(self, tmp_path):
        """SIGTERM mid-epoch: a resumable epoch-last is written at the next
        step boundary and the process exits cleanly; resuming replays the
        interrupted epoch."""
        import os
        import signal

        from video_tokenizer_tpu.utils import checkpoint as ckpt_lib

        cfg = _tok_cfg(tmp_path, max_epoch=3)
        tr = trainers.make({"name": "larp_tokenizer_trainer"}, args={"cfg": cfg})
        tr.make_datasets()
        full_loader = tr.train_loader

        def killing_loader(epoch):
            for i, b in enumerate(full_loader(epoch)):
                if i == 1:  # deliver the eviction signal mid-epoch
                    os.kill(os.getpid(), signal.SIGTERM)
                if i >= 3:
                    break
                yield b

        tr.train_loader = killing_loader
        tr.n_steps_per_epoch = 3
        tr.make_model()
        with pytest.raises(SystemExit):
            tr.run()

        path = os.path.join(cfg["save_dir"], "epoch-last")
        meta = ckpt_lib.load_meta(path)
        assert meta["preempted"] and meta["epoch"] == 0  # epoch 1 replays
        # SIGTERM landed before batch 1 was yielded; the flag is honored at
        # the next step boundary -> 2 batches were applied before saving
        assert meta["resume_skip_steps"] == 2

        cfg2 = _tok_cfg(tmp_path, max_epoch=3)
        tr2 = trainers.make(
            {"name": "larp_tokenizer_trainer"}, args={"cfg": cfg2}
        )
        tr2.make_datasets()
        tr2.n_steps_per_epoch = 3
        tr2.make_model()
        assert tr2.try_resume()
        assert tr2.epoch == 0  # next train() pass starts at epoch 1
        assert tr2._resume_skip == 2

        # the replayed epoch consumes the 2 already-applied batches WITHOUT
        # re-applying them (exact resume, no double-trained steps)
        applied = []
        orig_step = tr2.train_step
        tr2.train_step = lambda b: applied.append(1) or orig_step(b)
        full_loader2 = tr2.train_loader

        def limited_loader(epoch):
            for i, b in enumerate(full_loader2(epoch)):
                if i >= 3:
                    break
                yield b

        tr2.train_loader = limited_loader
        tr2.epoch = 1
        tr2.global_step = 0
        tr2.log_buffer = []
        tr2.t_data = tr2.t_model = 0.0
        tr2.train_epoch()
        assert len(applied) == 1  # 3 batches - 2 skipped
        assert tr2._resume_skip == 0  # consumed; later epochs run in full


class TestVisualization:
    def test_visualize_epoch_writes_grid_and_tb(self, tmp_path):
        import os

        cfg = _tok_cfg(tmp_path)
        cfg["test_dataset"] = {
            "name": "video_dataset",
            "args": {
                "root_path": "/tmp", "frame_num": 8, "csv_file": "",
                "crop_size": 32, "cls_vid_num": "-1_-1",
            },
            "csv_paths": {"fake": "null128"},
            "loader": {"batch_size": 4, "num_workers": 0},
        }
        tr = trainers.make({"name": "larp_tokenizer_trainer"}, args={"cfg": cfg})
        tr.make_datasets()
        tr.n_steps_per_epoch = 4
        tr.epoch = 1
        tr.make_model()
        tr.visualize_epoch()
        png = os.path.join(cfg["save_dir"], "vis", "epoch_1.png")
        assert os.path.exists(png), "vis grid not written"
        tb_dir = os.path.join(cfg["save_dir"], "tensorboard")
        assert os.path.isdir(tb_dir) and os.listdir(tb_dir)
        # the vis path must not have swallowed an exception
        log = open(os.path.join(cfg["save_dir"], "log.txt")).read()
        assert "visualize_epoch failed" not in log


class TestTrainerKnobs:
    def test_threshold_gating_clip_grad_step_lr(self, tmp_path):
        """d_update_loss_threshold gates the disc update inside jit;
        clip_grad_max_norm and lr_type=step compose in the same program."""
        cfg = _tok_cfg(tmp_path)
        cfg["loss"]["args"]["d_update_loss_threshold"] = 1.0e9  # never passes
        cfg["clip_grad_max_norm"] = 1.0
        cfg["optimizer"]["lr_type"] = "step"
        tr = trainers.make({"name": "larp_tokenizer_trainer"}, args={"cfg": cfg})
        tr.make_datasets()
        tr.n_steps_per_epoch = 4
        tr.epoch = 1
        tr.make_model()
        disc_before = np.asarray(
            tr.state["loss_params"]["discriminator"]["fc"]["kernel"]
        ).copy()
        gen_before = np.asarray(
            tr.state["params"]["x_embedder"]["proj"]["kernel"]
        ).copy()
        info = _fetch(tr.train_step(shard_batch(tr.mesh, _batch())))
        assert np.isfinite(info["loss"])
        disc_after = np.asarray(
            tr.state["loss_params"]["discriminator"]["fc"]["kernel"]
        )
        gen_after = np.asarray(
            tr.state["params"]["x_embedder"]["proj"]["kernel"]
        )
        # d_loss can never exceed 1e9 -> disc frozen, generator trains
        assert np.array_equal(disc_before, disc_after)
        assert not np.array_equal(gen_before, gen_after)
