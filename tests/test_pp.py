"""Pipeline-parallel AR trunk: GPipe schedule == single-device forward.

The reference has no pipeline parallelism at all (NCCL DDP only,
/root/reference/train.py:162-169) — this pins the beyond-parity
`parallel/pp.py` runner: loss AND grads of the pipelined, microbatched
trunk must equal the plain replicated `LARP_AR.__call__` to fp32 tolerance
on the 8-device virtual CPU mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np

from video_tokenizer_tpu.models.larp_ar import LARP_AR, ModelArgs
from video_tokenizer_tpu.parallel.pp import (
    create_pp_mesh,
    pp_loss_fn,
    shard_params_pp,
    stack_layer_params,
    unstack_layer_params,
)


def _model_and_data(n_layer=4, batch=4):
    cfg = ModelArgs(
        dim=64, n_layer=n_layer, n_head=4, n_kv_head=2, vocab_size=32,
        num_classes=5, max_seq_len=12, token_dropout_p=0.0,
        resid_dropout_p=0.0, ffn_dropout_p=0.0,
    )
    model = LARP_AR(cfg)
    idx = jax.random.randint(jax.random.PRNGKey(1), (batch, 11), 0, 32)
    cond = jnp.arange(batch) % 5
    tgt = jax.random.randint(jax.random.PRNGKey(2), (batch, 12), 0, 32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, idx, cond)
    return model, variables["params"], idx, cond, tgt


def _ref_loss_and_grad(model, params, idx, cond, tgt):
    def f(p):
        return model.apply({"params": p}, idx, cond, targets=tgt)[1]

    return jax.value_and_grad(f)(params)


class TestPipelineParallel:
    def test_stack_roundtrip(self):
        model, params, *_ = _model_and_data()
        rest, stacked = stack_layer_params(params, 4)
        rebuilt = unstack_layer_params(rest, stacked, 4)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(a, b),
            params, rebuilt,
        )

    def test_pp_loss_and_grads_match_replicated(self):
        model, params, idx, cond, tgt = _model_and_data(n_layer=4, batch=4)
        loss_ref, grads_ref = _ref_loss_and_grad(model, params, idx, cond, tgt)

        mesh = create_pp_mesh(data=2, pipe=4)
        pp_params = shard_params_pp(params, mesh, 4)
        fn = pp_loss_fn(model, mesh, n_microbatch=2)
        loss_pp, grads_pp = jax.jit(jax.value_and_grad(fn))(
            pp_params, idx, cond, tgt
        )

        np.testing.assert_allclose(
            float(loss_pp), float(loss_ref), rtol=1e-5
        )
        grads_pp_flat = unstack_layer_params(
            grads_pp["rest"], grads_pp["layers"], 4
        )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
            ),
            grads_pp_flat, grads_ref,
        )

    def test_pp_single_microbatch_pipe8(self):
        # full-device pipeline (pipe=8, no data axis), M=1 degenerate GPipe
        model, params, idx, cond, tgt = _model_and_data(n_layer=8, batch=2)
        loss_ref, _ = _ref_loss_and_grad(model, params, idx, cond, tgt)

        mesh = create_pp_mesh(data=1, pipe=8)
        pp_params = shard_params_pp(params, mesh, 8)
        fn = pp_loss_fn(model, mesh, n_microbatch=1)
        loss_pp = jax.jit(fn)(pp_params, idx, cond, tgt)
        np.testing.assert_allclose(float(loss_pp), float(loss_ref), rtol=1e-5)
