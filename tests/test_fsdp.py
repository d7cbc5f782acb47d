"""FSDP/ZeRO sharding: numerics match replicated; state actually shards."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_tokenizer_tpu.models.larp_ar import LARP_AR, ModelArgs
from video_tokenizer_tpu.parallel import MeshConfig, create_mesh
from video_tokenizer_tpu.parallel.fsdp import (
    fsdp_spec,
    shard_like_params,
    shard_params_fsdp,
)
from video_tokenizer_tpu.parallel.tp import larp_ar_param_spec


def _model():
    cfg = ModelArgs(
        dim=64, n_layer=2, n_head=4, n_kv_head=2, vocab_size=64,
        num_classes=5, max_seq_len=16, token_dropout_p=0.0,
        resid_dropout_p=0.0, ffn_dropout_p=0.0,
    )
    model = LARP_AR(cfg)
    idx = jnp.zeros((8, 15), jnp.int32)
    cond = jnp.zeros((8,), jnp.int32)
    tgt = jnp.zeros((8, 16), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, idx, cond)
    return model, variables["params"], (idx, cond, tgt)


class TestFSDPSpec:
    def test_small_tensors_replicated(self):
        assert fsdp_spec((64,), 8) == P()
        assert fsdp_spec((16, 16), 8) == P()

    def test_largest_divisible_dim_sharded(self):
        assert fsdp_spec((1024, 512), 8, min_size=1024) == P("data", None)
        assert fsdp_spec((100, 512), 8, min_size=1024) == P(None, "data")

    def test_respects_tp_axis(self):
        s = fsdp_spec((1024, 512), 4, tp_spec=P(None, "model"), min_size=1024)
        assert s == P("data", "model")

    def test_indivisible_stays_unsharded(self):
        assert fsdp_spec((101, 7), 8, min_size=1) == P()


class TestFSDPTraining:
    def _train_step(self, model, tx):
        def loss_fn(params, batch):
            _, loss = model.apply({"params": params}, *batch[:2], targets=batch[2])
            return loss

        @jax.jit
        def step(params, opt_state, batch):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return step

    def test_fsdp_matches_replicated(self):
        model, params, batch = _model()
        tx = optax.adamw(1e-3)
        step = self._train_step(model, tx)

        p_ref, o_ref, l_ref = step(params, tx.init(params), batch)

        mesh = create_mesh(MeshConfig(data=8))
        p_sh = shard_params_fsdp(params, mesh, min_size=512)
        o_sh = shard_like_params(tx.init(params), p_sh, mesh)
        batch_sh = jax.device_put(batch, NamedSharding(mesh, P("data")))
        p_new, o_new, l_sh = step(p_sh, o_sh, batch_sh)

        assert np.allclose(float(l_ref), float(l_sh), atol=1e-6)
        for a, b in zip(
            jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_new)
        ):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_params_and_adam_state_are_sharded(self):
        model, params, _ = _model()
        mesh = create_mesh(MeshConfig(data=8))
        p_sh = shard_params_fsdp(params, mesh, min_size=512)
        tok = p_sh["tok_embeddings"]["embedding"]  # [64, 64] = 4096 >= 512
        n_dev_bytes = tok.addressable_shards[0].data.size
        assert n_dev_bytes == tok.size // 8  # sharded 8-way

        tx = optax.adamw(1e-3)
        o_sh = shard_like_params(tx.init(params), p_sh, mesh)
        mu = o_sh[0].mu["tok_embeddings"]["embedding"]
        assert mu.addressable_shards[0].data.size == mu.size // 8

    def test_fsdp_plus_tp(self):
        model, params, batch = _model()
        tx = optax.adamw(1e-3)
        step = self._train_step(model, tx)
        p_ref, _, l_ref = step(params, tx.init(params), batch)

        mesh = create_mesh(MeshConfig(data=4, model=2))
        p_sh = shard_params_fsdp(
            params, mesh, tp_spec_fn=larp_ar_param_spec, min_size=512
        )
        # a TP'd matmul weight is sharded on BOTH axes
        wqkv = p_sh["layers_0"]["attention"]["wqkv"]["kernel"]
        assert wqkv.addressable_shards[0].data.size == wqkv.size // 8
        o_sh = shard_like_params(tx.init(params), p_sh, mesh)
        batch_sh = jax.device_put(batch, NamedSharding(mesh, P("data")))
        p_new, _, l_sh = step(p_sh, o_sh, batch_sh)
        assert np.allclose(float(l_ref), float(l_sh), atol=1e-6)
        for a, b in zip(
            jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_new)
        ):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestARTrainerFSDP:
    def test_trainer_param_placement_fsdp(self, tmp_path):
        """AR trainer with cfg param_placement=fsdp: state shards, step runs."""
        from video_tokenizer_tpu.config import ConfigDict
        import video_tokenizer_tpu.trainers  # noqa: F401
        import video_tokenizer_tpu.data  # noqa: F401
        from video_tokenizer_tpu.registry import trainers
        from video_tokenizer_tpu.parallel import shard_batch
        from tests.test_trainers import _tok_cfg, _batch, _fetch

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
        cfg["param_placement"] = "fsdp"
        cfg["fsdp_min_size"] = 512
        tr = trainers.make({"name": "larp_ar_trainer"}, args={"cfg": cfg})
        tr.make_datasets()
        tr.n_steps_per_epoch = 4
        tr.make_model()
        # embeddings are sharded over 'data'
        tok = tr.state["params"]["tok_embeddings"]["embedding"]
        assert tok.addressable_shards[0].data.size < tok.size
        info = _fetch(tr.train_step(shard_batch(tr.mesh, _batch())))
        assert np.isfinite(info["loss"])
        info2 = _fetch(tr.train_step(shard_batch(tr.mesh, _batch())))
        assert np.isfinite(info2["loss"])


class TestFSDPCheckpoint:
    def test_sharded_state_roundtrips_through_orbax(self, tmp_path):
        """FSDP-sharded params save and restore with values intact."""
        from video_tokenizer_tpu.utils import checkpoint as ckpt_lib

        _, params, _ = _model()
        mesh = create_mesh(MeshConfig(data=8))
        p_sh = shard_params_fsdp(params, mesh, min_size=512)
        path = str(tmp_path / "ckpt")
        ckpt_lib.save_checkpoint(path, {"params": p_sh}, {"model": {"name": "x"}})

        # restore into the same sharded layout
        restored = ckpt_lib.restore_checkpoint(path, {"params": p_sh})
        for a, b in zip(
            jax.tree_util.tree_leaves(params),
            jax.tree_util.tree_leaves(restored["params"]),
        ):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=0)
        # and layout is preserved where a target is given
        tok = restored["params"]["tok_embeddings"]["embedding"]
        assert tok.addressable_shards[0].data.size == tok.size // 8

        # restore without a target (host read path, e.g. model_io) still works
        plain = ckpt_lib.restore_checkpoint(path)
        t2 = plain["params"]["tok_embeddings"]["embedding"]
        assert np.allclose(
            np.asarray(t2), np.asarray(params["tok_embeddings"]["embedding"])
        )


class TestTokenizerTrainerFSDP:
    def test_tokenizer_fsdp_step_and_resume(self, tmp_path):
        """Tokenizer GAN trainer with FSDP generator: step runs, resume
        restores into the sharded layout."""
        import video_tokenizer_tpu.trainers  # noqa: F401
        import video_tokenizer_tpu.data  # noqa: F401
        from video_tokenizer_tpu.registry import trainers
        from video_tokenizer_tpu.parallel import shard_batch
        from tests.test_trainers import _tok_cfg, _batch, _fetch

        cfg = _tok_cfg(tmp_path)
        cfg["param_placement"] = "fsdp"
        cfg["fsdp_min_size"] = 512
        tr = trainers.make({"name": "larp_tokenizer_trainer"}, args={"cfg": cfg})
        tr.make_datasets()
        tr.n_steps_per_epoch = 4
        tr.epoch = 1
        tr.make_model()
        pe0 = tr.state["params"]["x_embedder"]["proj"]["kernel"]
        assert pe0.addressable_shards[0].data.size < pe0.size  # sharded
        info = _fetch(tr.train_step(shard_batch(tr.mesh, _batch())))
        assert np.isfinite(info["loss"])
        # the step donates the old state; read the post-step params
        pe = np.asarray(tr.state["params"]["x_embedder"]["proj"]["kernel"])
        tr.save_checkpoint("epoch-last")

        tr2 = trainers.make({"name": "larp_tokenizer_trainer"}, args={"cfg": cfg})
        tr2.make_datasets()
        tr2.n_steps_per_epoch = 4
        tr2.epoch = 1
        tr2.make_model()
        assert tr2.try_resume()
        pe2 = tr2.state["params"]["x_embedder"]["proj"]["kernel"]
        assert pe2.addressable_shards[0].data.size < pe2.size  # still sharded
        assert np.array_equal(pe, np.asarray(pe2))
        info2 = _fetch(tr2.train_step(shard_batch(tr2.mesh, _batch())))
        assert np.isfinite(info2["loss"])
