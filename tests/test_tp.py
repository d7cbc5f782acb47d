"""Tensor-parallel AR prior: TP-sharded loss == replicated loss."""
import jax
import jax.numpy as jnp
import numpy as np

from video_tokenizer_tpu.models.larp_ar import LARP_AR, ModelArgs
from video_tokenizer_tpu.parallel import MeshConfig, create_mesh, replicated_sharding
from video_tokenizer_tpu.parallel.tp import larp_ar_param_spec, shard_params_tp
from jax.sharding import NamedSharding, PartitionSpec as P


def _model_and_data():
    cfg = ModelArgs(
        dim=64, n_layer=2, n_head=4, n_kv_head=2, vocab_size=32,
        num_classes=5, max_seq_len=12, token_dropout_p=0.0,
        resid_dropout_p=0.0, ffn_dropout_p=0.0,
    )
    model = LARP_AR(cfg)
    idx = jax.random.randint(jax.random.PRNGKey(1), (4, 11), 0, 32)
    cond = jnp.array([0, 1, 2, 3])
    tgt = jax.random.randint(jax.random.PRNGKey(2), (4, 12), 0, 32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, idx, cond)
    return model, variables, idx, cond, tgt


class TestTensorParallel:
    def test_param_specs(self):
        model, variables, *_ = _model_and_data()
        specs = jax.tree_util.tree_map_with_path(
            lambda path, leaf: larp_ar_param_spec(path),
            variables["params"],
        )
        layer0 = specs["layers_0"]
        assert layer0["attention"]["wqkv"]["kernel"] == P(None, "model")
        assert layer0["attention"]["wo"]["kernel"] == P("model", None)
        assert layer0["feed_forward"]["w2"]["kernel"] == P("model", None)
        # vocab parallel: embedding rows + head columns over 'model'
        assert specs["tok_embeddings"]["embedding"] == P("model", None)
        assert specs["output"]["kernel"] == P(None, "model")
        # tiny class embedding stays replicated
        assert specs["cls_embedding"]["embedding_table"]["embedding"] == P()

    def test_tp_loss_matches_replicated(self):
        model, variables, idx, cond, tgt = _model_and_data()
        _, loss_ref = model.apply(variables, idx, cond, targets=tgt)

        mesh = create_mesh(MeshConfig(data=4, model=2))
        params_tp = shard_params_tp(variables["params"], mesh)
        idx_s = jax.device_put(idx, NamedSharding(mesh, P("data", None)))
        cond_s = jax.device_put(cond, NamedSharding(mesh, P("data")))
        tgt_s = jax.device_put(tgt, NamedSharding(mesh, P("data", None)))

        @jax.jit
        def loss_fn(params, idx, cond, tgt):
            _, loss = model.apply({"params": params}, idx, cond, targets=tgt)
            return loss

        loss_tp = loss_fn(params_tp, idx_s, cond_s, tgt_s)
        assert np.allclose(float(loss_tp), float(loss_ref), rtol=1e-5)

    def test_tp_grads_match_replicated(self):
        model, variables, idx, cond, tgt = _model_and_data()

        def loss_fn(params):
            _, loss = model.apply({"params": params}, idx, cond, targets=tgt)
            return loss

        g_ref = jax.grad(loss_fn)(variables["params"])
        mesh = create_mesh(MeshConfig(data=4, model=2))
        params_tp = shard_params_tp(variables["params"], mesh)
        g_tp = jax.jit(jax.grad(loss_fn))(params_tp)
        ref_leaf = g_ref["layers_0"]["attention"]["wqkv"]["kernel"]
        tp_leaf = g_tp["layers_0"]["attention"]["wqkv"]["kernel"]
        assert np.allclose(np.asarray(tp_leaf), np.asarray(ref_leaf), atol=1e-5)

    def test_sequence_parallel_matches_replicated(self):
        """SP (inter-block activations sharded over 'model' on the sequence
        dim) must be numerically invisible: loss and grads == replicated."""
        from video_tokenizer_tpu.parallel.tp import sequence_parallel

        model, variables, idx, cond, tgt = _model_and_data()
        _, loss_ref = model.apply(variables, idx, cond, targets=tgt)

        def loss_fn(params):
            _, loss = model.apply({"params": params}, idx, cond, targets=tgt)
            return loss

        g_ref = jax.grad(loss_fn)(variables["params"])

        mesh = create_mesh(MeshConfig(data=4, model=2))
        params_tp = shard_params_tp(variables["params"], mesh)
        idx_s = jax.device_put(idx, NamedSharding(mesh, P("data", None)))
        cond_s = jax.device_put(cond, NamedSharding(mesh, P("data")))
        tgt_s = jax.device_put(tgt, NamedSharding(mesh, P("data", None)))

        @jax.jit
        def sp_loss_and_grad(params, idx, cond, tgt):
            def f(p):
                _, loss = model.apply({"params": p}, idx, cond, targets=tgt)
                return loss

            return jax.value_and_grad(f)(params)

        with sequence_parallel(mesh):  # constraint baked at trace time
            loss_sp, g_sp = sp_loss_and_grad(params_tp, idx_s, cond_s, tgt_s)
        assert np.allclose(float(loss_sp), float(loss_ref), rtol=1e-5)
        ref_leaf = g_ref["layers_0"]["attention"]["wqkv"]["kernel"]
        sp_leaf = g_sp["layers_0"]["attention"]["wqkv"]["kernel"]
        assert np.allclose(np.asarray(sp_leaf), np.asarray(ref_leaf),
                           atol=1e-5)

    def test_tp_generation_runs(self):
        from video_tokenizer_tpu.generation import generate

        model, variables, *_ = _model_and_data()
        mesh = create_mesh(MeshConfig(data=4, model=2))
        params_tp = shard_params_tp(variables["params"], mesh)
        cond = jax.device_put(
            jnp.array([0, 1, 2, 3]), NamedSharding(mesh, P("data"))
        )
        seq = generate(
            model, {"params": params_tp}, cond, 6, jax.random.PRNGKey(0),
            sample_logits=False,
        )
        seq_ref = generate(
            model, variables, jnp.array([0, 1, 2, 3]), 6,
            jax.random.PRNGKey(0), sample_logits=False,
        )
        assert np.array_equal(np.asarray(seq), np.asarray(seq_ref))

    def test_tp_speculative_generation_runs(self):
        """Speculative decoding (self-draft) under TP-sharded params: the
        chunk-verify path's scatter stores and per-row masks must compose
        with GSPMD sharding; greedy output == the replicated generate."""
        from video_tokenizer_tpu.generation import (
            generate, self_draft, speculative_generate,
        )

        model, variables, *_ = _model_and_data()
        # randomize the zero-init head so greedy equality is non-trivial
        params = dict(variables["params"])
        params["output"] = {"kernel": jax.random.normal(
            jax.random.PRNGKey(9), (64, 32)) * 0.5}
        mesh = create_mesh(MeshConfig(data=4, model=2))
        params_tp = shard_params_tp(params, mesh)
        draft, draft_tp = self_draft(model, params_tp, 1)
        cond = jax.device_put(
            jnp.array([0, 1, 2, 3]), NamedSharding(mesh, P("data"))
        )
        seq = speculative_generate(
            model, {"params": params_tp}, draft, {"params": draft_tp},
            cond, 6, jax.random.PRNGKey(0), gamma=2, sample_logits=False,
        )
        seq_ref = generate(
            model, {"params": params}, jnp.array([0, 1, 2, 3]), 6,
            jax.random.PRNGKey(0), sample_logits=False,
        )
        assert np.array_equal(np.asarray(seq), np.asarray(seq_ref))
