"""Speculative decoding: exactness of the acceptance operator, chunk-forward
parity with the one-token decode path, and end-to-end equivalence with
`generate` (greedy), per generation/speculative.py."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_tokenizer_tpu.generation import generate, speculative_generate
from video_tokenizer_tpu.generation.speculative import (
    residual_dist,
    sampling_dist,
    self_draft,
)
from video_tokenizer_tpu.models.larp_ar import LARP_AR, ModelArgs


def _tiny_ar(seed, dim=64, n_layer=2, n_head=4, n_kv_head=None, vocab=32,
             max_seq_len=12, **kw):
    cfg = ModelArgs(
        dim=dim, n_layer=n_layer, n_head=n_head, n_kv_head=n_kv_head,
        vocab_size=vocab, num_classes=5, max_seq_len=max_seq_len,
        token_dropout_p=0.0, resid_dropout_p=0.0, ffn_dropout_p=0.0, **kw
    )
    model = LARP_AR(cfg)
    cond = jnp.array([0, 1])
    idx = jnp.zeros((2, max_seq_len - 1), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(seed)}, idx, cond)
    # output head is zero-init — randomize it so logits are informative
    params = dict(variables["params"])
    params["output"] = {
        "kernel": jax.random.normal(
            jax.random.PRNGKey(seed + 100), (dim, vocab)
        ) * 0.5
    }
    return model, {"params": params}


class TestAcceptanceOperator:
    def test_rejection_sampling_is_exact(self):
        """The textbook identity: q(x) min(1, p(x)/q(x)) + P(reject) *
        residual(x) == p(x), for arbitrary p, q — i.e. one speculative step
        emits exactly the target distribution."""
        key = jax.random.PRNGKey(0)
        for i in range(5):
            kp, kq, key = jax.random.split(key, 3)
            p = jax.nn.softmax(jax.random.normal(kp, (17,)) * 2.0)
            q = jax.nn.softmax(jax.random.normal(kq, (17,)) * 2.0)
            accept = jnp.minimum(1.0, p / q)
            out = q * accept + jnp.sum(q * (1 - accept)) * residual_dist(p, q)
            np.testing.assert_allclose(np.asarray(out), np.asarray(p),
                                       atol=1e-6)

    def test_residual_dist_degenerate_p_equals_q(self):
        p = jax.nn.softmax(jnp.arange(8.0))
        r = residual_dist(p, p)
        np.testing.assert_allclose(np.asarray(r), np.asarray(p), atol=1e-7)

    def test_residual_dist_zero_q_is_p(self):
        """q = 0 (the all-accepted bonus slot) -> residual == p."""
        p = jax.nn.softmax(jnp.arange(8.0))
        r = residual_dist(p, jnp.zeros_like(p))
        np.testing.assert_allclose(np.asarray(r), np.asarray(p), atol=1e-7)

    def test_sampling_dist_matches_sampler_filtering(self):
        """sampling_dist == softmax of sample_from_logits' filtered logits;
        greedy mode is the one-hot argmax."""
        from video_tokenizer_tpu.generation.generate import (
            top_k_top_p_filtering,
        )

        logits = jax.random.normal(jax.random.PRNGKey(1), (3, 19))
        d = sampling_dist(logits, temperature=0.7, top_k=5, top_p=0.9)
        want = jax.nn.softmax(
            top_k_top_p_filtering(logits / 0.7, top_k=5, top_p=0.9), -1
        )
        np.testing.assert_allclose(np.asarray(d), np.asarray(want), atol=1e-6)
        g = sampling_dist(logits, sample_logits=False)
        assert np.array_equal(np.asarray(jnp.argmax(g, -1)),
                              np.asarray(jnp.argmax(logits, -1)))
        np.testing.assert_allclose(np.asarray(g.sum(-1)), 1.0)


class TestDecodeChunk:
    @pytest.mark.parametrize("cache_dtype", [jnp.float32, jnp.int8])
    def test_chunk_matches_sequential_decode_steps(self, cache_dtype):
        """decode_chunk over G tokens == G single-token decode_steps, for
        logits AND the resulting cache (uniform positions)."""
        model, variables = _tiny_ar(0, n_kv_head=2)
        cond = jnp.array([2, 3])
        toks = jax.random.randint(jax.random.PRNGKey(5), (2, 4), 0, 32)

        cache = model.apply(variables, 2, 12, cache_dtype,
                            method=model.init_cache)
        _, cache_a = model.apply(variables, cond, cache, method=model.prefill)
        cache_b = jax.tree_util.tree_map(lambda x: x, cache_a)

        # sequential: token g at scalar position 1 + g
        step_logits = []
        for g in range(4):
            lg, cache_a = model.apply(
                variables, toks[:, g: g + 1], jnp.int32(1 + g), cache_a,
                method=model.decode_step,
            )
            step_logits.append(lg[:, 0])
        step_logits = jnp.stack(step_logits, axis=1)

        chunk_logits, cache_b = model.apply(
            variables, toks, jnp.full((2,), 1, jnp.int32), cache_b,
            method=model.decode_chunk,
        )
        np.testing.assert_allclose(
            np.asarray(chunk_logits), np.asarray(step_logits),
            atol=2e-5, rtol=2e-5,
        )
        for la, lb in zip(cache_a, cache_b):
            for k in la:
                np.testing.assert_allclose(
                    np.asarray(la[k], np.float32),
                    np.asarray(lb[k], np.float32), atol=1e-6,
                )

    @pytest.mark.parametrize("cache_dtype", [jnp.float32, jnp.int8])
    def test_w2_rewrite_preserves_cache_and_logits(self, cache_dtype):
        """Pins the invariant behind speculative.py's width-2 first draft
        forward (ADVICE r4): re-feeding the ALREADY-CACHED token `last2` at
        its own position pn-1 rewrites that cache slot with IDENTICAL K/V
        (deterministic forward, unchanged prefix), and the new position's
        logits equal the width-1 path's. A future nondeterministic op in
        decode_chunk (dropout, stochastic rounding) breaks this loudly."""
        model, variables = _tiny_ar(3)
        cond = jnp.array([1, 4])
        tokA = jnp.array([[7], [11]], jnp.int32)
        tokB = jnp.array([[3], [29]], jnp.int32)
        pos1 = jnp.full((2,), 1, jnp.int32)

        cache = model.apply(variables, 2, 12, cache_dtype,
                            method=model.init_cache)
        _, cache = model.apply(variables, cond, cache, method=model.prefill)
        # commit tokA at slot 1 (the previous iteration's last proposal)
        _, cache1 = model.apply(variables, tokA, pos1, cache,
                                method=model.decode_chunk)
        # width-1 reference: feed tokB alone at slot 2
        ref_logits, _ = model.apply(variables, tokB, pos1 + 1, cache1,
                                    method=model.decode_chunk)
        # width-2 rewrite: [tokA, tokB] at [1, 2] over the same cache
        w2_logits, cache2 = model.apply(
            variables, jnp.concatenate([tokA, tokB], axis=1), pos1, cache1,
            method=model.decode_chunk,
        )
        np.testing.assert_allclose(
            np.asarray(w2_logits[:, -1]), np.asarray(ref_logits[:, -1]),
            atol=2e-5, rtol=2e-5,
        )
        for la, lb in zip(cache1, cache2):
            for k in la:
                np.testing.assert_array_equal(
                    np.asarray(la[k])[:, 1] if la[k].shape[0] == 2
                    else np.asarray(la[k])[1],  # [S,128] scale planes
                    np.asarray(lb[k])[:, 1] if lb[k].shape[0] == 2
                    else np.asarray(lb[k])[1],
                )

    def test_chunk_per_row_positions(self):
        """Rows at DIFFERENT positions (the speculative steady state): each
        batch row of a chunked forward == the same row run alone."""
        model, variables = _tiny_ar(1)
        cond = jnp.array([2, 3])
        pre = jax.random.randint(jax.random.PRNGKey(6), (2, 5), 0, 32)
        toks = jax.random.randint(jax.random.PRNGKey(7), (2, 3), 0, 32)
        # row 0 has 2 committed tokens, row 1 has 5
        pos = jnp.array([3, 6], jnp.int32)  # T=1, pos = T + n - 1 + 1

        cache = model.apply(variables, 2, 16, jnp.float32,
                            method=model.init_cache)
        _, cache = model.apply(variables, cond, cache, method=model.prefill)
        for g in range(5):
            # grow both rows' prefixes to the max, then chunk reads only
            # each row's live prefix via its own position
            _, cache = model.apply(
                variables, pre[:, g: g + 1], jnp.int32(1 + g), cache,
                method=model.decode_step,
            )
        batched, _ = model.apply(
            variables, toks, pos, cache, method=model.decode_chunk
        )

        for r in range(2):
            cache_r = model.apply(variables, 1, 16, jnp.float32,
                                  method=model.init_cache)
            _, cache_r = model.apply(
                variables, cond[r: r + 1], cache_r, method=model.prefill
            )
            for g in range(int(pos[r]) - 1):
                _, cache_r = model.apply(
                    variables, pre[r: r + 1, g: g + 1], jnp.int32(1 + g),
                    cache_r, method=model.decode_step,
                )
            solo, _ = model.apply(
                variables, toks[r: r + 1], pos[r: r + 1], cache_r,
                method=model.decode_chunk,
            )
            np.testing.assert_allclose(
                np.asarray(batched[r]), np.asarray(solo[0]),
                atol=2e-5, rtol=2e-5,
            )


class TestSpeculativeGenerate:
    def test_greedy_equals_generate(self):
        """Greedy speculative decode must equal plain greedy generate
        token-for-token, regardless of the draft model."""
        model, variables = _tiny_ar(0)
        draft, draft_vars = _tiny_ar(7, dim=32, n_head=2)
        cond = jnp.array([2, 3])
        want = generate(model, variables, cond, 12, jax.random.PRNGKey(0),
                        sample_logits=False)
        for gamma in (1, 3, 5):
            got = speculative_generate(
                model, variables, draft, draft_vars, cond, 12,
                jax.random.PRNGKey(0), gamma=gamma, sample_logits=False,
            )
            assert np.array_equal(np.asarray(got), np.asarray(want)), gamma

    def test_greedy_equals_generate_cfg(self):
        model, variables = _tiny_ar(0)
        draft, draft_vars = _tiny_ar(7, dim=32, n_head=2)
        cond = jnp.array([2, 3])
        want = generate(model, variables, cond, 10, jax.random.PRNGKey(0),
                        cfg_scale=2.0, sample_logits=False)
        got = speculative_generate(
            model, variables, draft, draft_vars, cond, 10,
            jax.random.PRNGKey(0), gamma=3, cfg_scale=2.0,
            sample_logits=False,
        )
        assert np.array_equal(np.asarray(got), np.asarray(want))

    def test_greedy_equals_generate_int8_kv(self):
        """int8 KV caches: the per-row scatter store + chunk dequant path
        must reproduce the scalar-position decode path."""
        model, variables = _tiny_ar(0, dim=128, n_head=2)
        draft, draft_vars = _tiny_ar(7, dim=128, n_head=2)
        cond = jnp.array([2, 3])
        want = generate(model, variables, cond, 10, jax.random.PRNGKey(0),
                        sample_logits=False, cache_dtype=jnp.int8)
        got = speculative_generate(
            model, variables, draft, draft_vars, cond, 10,
            jax.random.PRNGKey(0), gamma=3, sample_logits=False,
            cache_dtype=jnp.int8, draft_cache_dtype=jnp.int8,
        )
        assert np.array_equal(np.asarray(got), np.asarray(want))

    def test_draft_equals_target_accepts_everything(self):
        """With draft == target every proposal is accepted: acceptance rate
        1.0 and ceil((N-1)/(gamma+1)) verification iterations."""
        model, variables = _tiny_ar(0)
        cond = jnp.array([2, 3])
        seq, stats = speculative_generate(
            model, variables, model, variables, cond, 12,
            jax.random.PRNGKey(3), gamma=3, temperature=0.9, top_k=8,
            return_stats=True,
        )
        assert seq.shape == (2, 12)
        assert ((np.asarray(seq) >= 0) & (np.asarray(seq) < 32)).all()
        assert float(stats["acceptance_rate"]) == pytest.approx(1.0)
        assert int(stats["iterations"]) == -(-11 // 4)

    def test_stochastic_runs_and_is_deterministic_per_key(self):
        model, variables = _tiny_ar(0)
        draft, draft_vars = _tiny_ar(7, dim=32, n_head=2)
        cond = jnp.array([1, 4])
        kwargs = dict(gamma=2, cfg_scale=1.5, temperature=0.8, top_k=6,
                      top_p=0.9)
        a = speculative_generate(model, variables, draft, draft_vars, cond,
                                 9, jax.random.PRNGKey(4), **kwargs)
        b = speculative_generate(model, variables, draft, draft_vars, cond,
                                 9, jax.random.PRNGKey(4), **kwargs)
        c = speculative_generate(model, variables, draft, draft_vars, cond,
                                 9, jax.random.PRNGKey(5), **kwargs)
        assert np.array_equal(np.asarray(a), np.asarray(b))
        assert a.shape == (2, 9)
        assert ((np.asarray(a) >= 0) & (np.asarray(a) < 32)).all()
        assert not np.array_equal(np.asarray(a), np.asarray(c))

    def test_self_draft_greedy_equals_generate(self):
        """Early-exit drafting (draft = target's first layer + shared
        embeddings/norm/head, zero extra weights) must still emit the exact
        target sequence under greedy decoding."""
        model, variables = _tiny_ar(0)
        draft, draft_params = self_draft(model, variables["params"], 1)
        assert draft.config.n_layer == 1
        assert "layers_1" not in draft_params
        want = generate(model, variables, jnp.array([2, 3]), 10,
                        jax.random.PRNGKey(0), sample_logits=False)
        got = speculative_generate(
            model, variables, draft, {"params": draft_params},
            jnp.array([2, 3]), 10, jax.random.PRNGKey(0), gamma=3,
            sample_logits=False,
        )
        assert np.array_equal(np.asarray(got), np.asarray(want))

    def test_bench_speculative_tiny(self):
        """bench.py's speculative extra is driver-run on TPU between
        sessions; pin its code path on a tiny CPU geometry. Zero-init output
        heads make both distributions uniform, so acceptance must be ~1.0
        (the ceiling-measurement construction the bench relies on)."""
        import bench

        tok_s, acc = bench.bench_speculative(
            batch_size=2, new_tokens=8, gamma=2,
            target_kw=dict(n_layer=2, n_head=2, dim=64, vocab_size=32,
                           max_seq_len=32),
            draft_kw=dict(n_layer=1, n_head=2, dim=64),
        )
        assert tok_s > 0
        assert acc == pytest.approx(1.0)

    def test_bench_speculative_acceptance_constructions(self):
        """The sub-1.0 acceptance lines: independent sharpened heads must
        measure BELOW the uniform ceiling, and the self-draft path must run
        and report a valid acceptance."""
        import bench

        tiny = dict(n_layer=2, n_head=2, dim=64, vocab_size=32,
                    max_seq_len=64)
        # int8=True exercises the quantize-both-models wiring the TPU
        # bench lines use (weight-only QuantDense on target AND draft)
        _, acc_floor = bench.bench_speculative(
            batch_size=2, new_tokens=16, gamma=2, target_kw=tiny,
            draft_kw=dict(n_layer=1, n_head=2, dim=64), head_std=0.5,
            int8=True,
        )
        assert 0.0 <= acc_floor < 0.999
        _, acc_self = bench.bench_speculative(
            batch_size=2, new_tokens=16, gamma=2, target_kw=tiny,
            head_std=0.5, self_draft_layers=1, int8=True,
        )
        assert 0.0 <= acc_self <= 1.0

    def test_distill_draft_improves_soft_ce(self):
        """The bench's spec_trained section (tools/distill_draft.py): a few
        distillation steps on a tiny pair must run end-to-end, return bf16
        draft params consumable by bench_speculative(draft_params=...), and
        not increase the soft-CE."""
        import sys

        sys.path.insert(0, "tools")
        import bench
        from distill_draft import distill

        common = dict(vocab_size=32, num_classes=101, max_seq_len=32,
                      token_dropout_p=0.0, resid_dropout_p=0.0,
                      ffn_dropout_p=0.0, class_dropout_prob=0.0)
        target = LARP_AR(ModelArgs(n_layer=2, n_head=2, dim=64, **common))
        draft = LARP_AR(ModelArgs(n_layer=1, n_head=2, dim=64, **common))
        idx = jnp.zeros((2, 4), jnp.int32)
        cond = jnp.zeros((2,), jnp.int32)
        tv = target.init({"params": jax.random.PRNGKey(0)}, idx, cond)
        dv = draft.init({"params": jax.random.PRNGKey(1)}, idx, cond)
        tv = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), tv)
        dv = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), dv)
        # zero-init head -> uniform teacher -> zero gradient; sharpen it
        # (exactly what bench_spec_trained's head_std target does)
        p = dict(tv["params"])
        out = dict(p["output"])
        out["kernel"] = 0.5 * jax.random.normal(
            jax.random.PRNGKey(7), out["kernel"].shape, jnp.bfloat16
        )
        p["output"] = out
        tv = {"params": p}
        trained, stats = distill(
            target, tv, draft, dv, jax.random.PRNGKey(2),
            steps=8, batch=2, seq_len=32, lr=1e-2, log=lambda *a: None,
        )
        # a sharpened teacher must pull the uniform draft strictly down
        assert stats["last_loss"] < stats["first_loss"]
        tok_s, acc = bench.bench_speculative(
            batch_size=2, new_tokens=8, gamma=2,
            target_kw=dict(n_layer=2, n_head=2, dim=64, vocab_size=32,
                           max_seq_len=32),
            draft_kw=dict(n_layer=1, n_head=2, dim=64),
            draft_params=trained, int8=True,
        )
        assert tok_s > 0 and 0.0 <= acc <= 1.0

    def test_frame_prediction_mode(self):
        """Frame-prediction prompts ([B, T] token conditioning) ride the
        same machinery; greedy must match generate."""
        cfg = dict(
            dim=64, n_layer=2, n_head=4, vocab_size=32, max_seq_len=8,
            cls_token_num=5, frame_prediction=True, token_dropout_p=0.0,
            resid_dropout_p=0.0, ffn_dropout_p=0.0,
        )
        model = LARP_AR(ModelArgs(**cfg))
        draft = LARP_AR(ModelArgs(**{**cfg, "dim": 32, "n_head": 2}))
        cond = jax.random.randint(jax.random.PRNGKey(0), (2, 5), 0, 32)
        idx = jnp.zeros((2, 7), jnp.int32)

        def init(m, seed, dim):
            variables = m.init({"params": jax.random.PRNGKey(seed)}, idx, cond)
            params = dict(variables["params"])
            params["output"] = {"kernel": jax.random.normal(
                jax.random.PRNGKey(seed + 100), (dim, 32)) * 0.5}
            return {"params": params}

        variables = init(model, 0, 64)
        draft_vars = init(draft, 7, 32)
        want = generate(model, variables, cond, 6, jax.random.PRNGKey(2),
                        sample_logits=False)
        got = speculative_generate(
            model, variables, draft, draft_vars, cond, 6,
            jax.random.PRNGKey(2), gamma=2, sample_logits=False,
        )
        assert np.array_equal(np.asarray(got), np.asarray(want))
