"""Model tests: tokenizer round trips, bottlenecks, AR KV-cache equivalence."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import video_tokenizer_tpu.models  # noqa: F401 (register)
from video_tokenizer_tpu.models import LARPTokenizer
from video_tokenizer_tpu.models.bottleneck import SimpleVectorQuantizer
from video_tokenizer_tpu.models.larp_ar import LARP_AR, ModelArgs
from video_tokenizer_tpu.generation import generate, top_k_top_p_filtering


VQ_SPEC = {
    "name": "bottleneck",
    "args": {
        "bottleneck_dim": 8,
        "norm": "none",
        "regularizer": {
            "name": "vq",
            "args": {
                "codebook_size": 256,
                "l2_normalized": True,
                "stochastic": True,
                "stochastic_temperature": 0.03,
            },
        },
    },
}


def tiny_tokenizer(**kw):
    args = dict(
        bottleneck=VQ_SPEC, prior_model={"name": "none"},
        bottleneck_token_num=16, input_size=32, frame_num=8,
        temporal_patch_size=4, patch_size=8,
        decoder_temporal_patch_size=4, decoder_patch_size=8,
        bottleneck_type="vq", encoder_hidden_size=64, decoder_hidden_size=64,
        encoder_num_heads=4, decoder_num_heads=4,
        encoder_depth=1, decoder_depth=1,
    )
    args.update(kw)
    return LARPTokenizer(**args)


class TestTokenizer:
    @pytest.fixture(scope="class")
    def model_and_params(self):
        model = tiny_tokenizer()
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 8, 32, 32))
        params = model.init(
            {"params": jax.random.PRNGKey(1), "vq": jax.random.PRNGKey(2)},
            x, train=True,
        )
        return model, params, x

    def test_forward_shapes(self, model_and_params):
        model, params, x = model_and_params
        out = model.apply(params, x, train=True, rngs={"vq": jax.random.PRNGKey(3)})
        assert out["pred_frames"].shape == x.shape
        assert out["bottleneck_rep"].shape == (2, 16)
        assert out["bottleneck_rep"].dtype == jnp.int32

    def test_decode_from_bottleneck_consistency(self, model_and_params):
        """decode(encoded) == decode_from_bottleneck(indices) for VQ."""
        model, params, x = model_and_params
        enc = model.apply(params, x, method=model.encode)
        v1 = model.apply(params, enc["encoded"], method=model.decode)
        v2 = model.apply(params, enc["bottleneck_rep"], method=model.decode_from_bottleneck)
        assert np.allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)

    def test_eval_deterministic(self, model_and_params):
        model, params, x = model_and_params
        a = model.apply(params, x, method=model.encode)["bottleneck_rep"]
        b = model.apply(params, x, method=model.encode)["bottleneck_rep"]
        assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_fewer_frames_eval(self, model_and_params):
        model, params, _ = model_and_params
        x4 = jax.random.uniform(jax.random.PRNGKey(5), (2, 3, 4, 32, 32))
        enc = model.apply(params, x4, method=model.encode_eval)
        vid = model.apply(
            params, enc["encoded"], enc["num_x_tokens"], method=model.decode_eval
        )
        assert vid.shape == (2, 3, 4, 32, 32)

    def test_unpatchify_inverts_patchify(self, model_and_params):
        model, params, x = model_and_params
        b, c, t, h, w = x.shape
        import einops

        tokens = einops.rearrange(
            x, "b c (t pt) (h p1) (w p2) -> b (t h w) (pt p1 p2 c)", pt=4, p1=8, p2=8
        )
        back = model.unpatchify(tokens)
        assert np.allclose(np.asarray(back), np.asarray(x))

    def test_grad_flows_to_encoder_through_vq(self, model_and_params):
        model, params, x = model_and_params

        def loss(p):
            out = model.apply(
                {"params": p}, x, train=True, rngs={"vq": jax.random.PRNGKey(3)}
            )
            return jnp.mean(out["pred_frames"] ** 2) + out["loss_q"]

        g = jax.grad(loss)(params["params"])
        gnorm = jnp.sqrt(
            sum(jnp.sum(t**2) for t in jax.tree_util.tree_leaves(g))
        )
        assert np.isfinite(float(gnorm)) and float(gnorm) > 0
        # STE: the patch-embed projection receives gradient despite quantization
        pe_g = g["x_embedder"]["proj"]["kernel"]
        assert float(jnp.abs(pe_g).max()) > 0


class TestTokenizerFSQ:
    def test_fsq_bottleneck_roundtrip(self):
        model = tiny_tokenizer(bottleneck_type="fsq", fsq_levels=(8, 5, 5))
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 8, 32, 32))
        params = model.init(
            {"params": jax.random.PRNGKey(1), "vq": jax.random.PRNGKey(2)}, x
        )
        out = model.apply(params, x)
        assert out["bottleneck_rep"].shape == (1, 16)
        v = model.apply(params, out["bottleneck_rep"], method=model.decode_from_bottleneck)
        assert v.shape == x.shape


class TestVQModule:
    def test_codebook_l2_normalized(self):
        vq = SimpleVectorQuantizer(dim=8, codebook_size=32, l2_normalized=True)
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 8))
        variables = vq.init({"params": jax.random.PRNGKey(1), "vq": jax.random.PRNGKey(2)}, z)
        out = vq.apply(variables, z)
        norms = np.linalg.norm(np.asarray(out["emb"]), axis=-1)
        assert np.allclose(norms, 1.0, atol=1e-5)
        # quantized vectors are unit norm too
        qn = np.linalg.norm(np.asarray(out["regularized_z"]), axis=-1)
        assert np.allclose(qn, 1.0, atol=1e-4)

    def test_commit_loss_positive(self):
        vq = SimpleVectorQuantizer(dim=8, codebook_size=32)
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 8))
        variables = vq.init({"params": jax.random.PRNGKey(1)}, z)
        out = vq.apply(variables, z)
        assert float(out["loss_commit"]) > 0
        assert np.allclose(float(out["loss_commit"]), float(out["loss_codebook"]))


class TestAR:
    @pytest.fixture(scope="class")
    def ar(self):
        cfg = ModelArgs(
            dim=64, n_layer=2, n_head=4, n_kv_head=2, vocab_size=32,
            num_classes=5, max_seq_len=12, token_dropout_p=0.0,
            resid_dropout_p=0.0, ffn_dropout_p=0.0,
        )
        model = LARP_AR(cfg)
        cond = jnp.array([0, 1])
        idx = jnp.zeros((2, 11), jnp.int32)
        variables = model.init({"params": jax.random.PRNGKey(0)}, idx, cond)
        # the output head is zero-init (reference larp_ar.py:285-286), which
        # would make every logit 0 and greedy-decode tests vacuously pass
        # (argmax always 0) — randomize it so decode-parity tests have teeth
        params = dict(variables["params"])
        params["output"] = {
            "kernel": jax.random.normal(jax.random.PRNGKey(9), (64, 32)) * 0.5
        }
        return model, {"params": params}

    def test_train_forward_loss(self, ar):
        model, variables = ar
        idx = jax.random.randint(jax.random.PRNGKey(1), (2, 11), 0, 32)
        tgt = jax.random.randint(jax.random.PRNGKey(2), (2, 12), 0, 32)
        logits, loss = model.apply(variables, idx, jnp.array([0, 1]), targets=tgt)
        assert logits.shape == (2, 12, 32)
        assert np.isfinite(float(loss))

    def test_kv_cache_matches_teacher_forcing(self, ar):
        """Greedy incremental decode == repeated full teacher-forced argmax."""
        model, variables = ar
        cond = jnp.array([2, 3])
        seq = generate(
            model, variables, cond, 8, jax.random.PRNGKey(0), sample_logits=False
        )
        cur = jnp.zeros((2, 0), jnp.int32)
        for _ in range(8):
            lg, _ = model.apply(variables, cur, cond)
            nxt = jnp.argmax(lg[:, -1, :], -1).astype(jnp.int32)
            cur = jnp.concatenate([cur, nxt[:, None]], 1)
        assert np.array_equal(np.asarray(cur), np.asarray(seq))

    def test_cfg_generation_runs(self, ar):
        model, variables = ar
        seq = generate(
            model, variables, jnp.array([1, 4]), 6, jax.random.PRNGKey(1),
            cfg_scale=2.0, top_k=5, top_p=0.9,
        )
        assert seq.shape == (2, 6)
        assert ((np.asarray(seq) >= 0) & (np.asarray(seq) < 32)).all()

    def test_emb_masks_all_ones_is_noop(self):
        """Frame-prediction generation with an all-ones emb_mask must equal
        unmasked generation (reference ar/generate.py:151-160 semantics)."""
        cfg = ModelArgs(
            dim=64, n_layer=2, n_head=4, vocab_size=32, max_seq_len=8,
            cls_token_num=5, frame_prediction=True, token_dropout_p=0.0,
            resid_dropout_p=0.0, ffn_dropout_p=0.0,
        )
        model = LARP_AR(cfg)
        cond = jax.random.randint(jax.random.PRNGKey(0), (2, 5), 0, 32)
        idx = jnp.zeros((2, 7), jnp.int32)
        variables = model.init({"params": jax.random.PRNGKey(1)}, idx, cond)
        # output head is zero-init; randomize it so logits are informative
        params = dict(variables["params"])
        params["output"] = {
            "kernel": jax.random.normal(jax.random.PRNGKey(9), (64, 32)) * 0.1
        }
        variables = {"params": params}
        a = generate(model, variables, cond, 6, jax.random.PRNGKey(2),
                     sample_logits=False)
        b = generate(model, variables, cond, 6, jax.random.PRNGKey(2),
                     sample_logits=False, emb_masks=jnp.ones((2, 5), bool))
        assert np.array_equal(np.asarray(a), np.asarray(b))
        # masking changes the output
        m = jnp.asarray([[True, True, False, True, True]] * 2)
        c = generate(model, variables, cond, 6, jax.random.PRNGKey(2),
                     sample_logits=False, emb_masks=m)
        assert not np.array_equal(np.asarray(a), np.asarray(c))

    def test_valid_mask_loss(self, ar):
        model, variables = ar
        idx = jnp.zeros((2, 11), jnp.int32)
        tgt = jnp.zeros((2, 12), jnp.int32)
        _, loss_all = model.apply(
            variables, idx, jnp.array([0, 1]), targets=tgt,
            valid=jnp.array([1.0, 1.0]),
        )
        _, loss_one = model.apply(
            variables, idx, jnp.array([0, 1]), targets=tgt,
            valid=jnp.array([1.0, 0.0]),
        )
        assert np.isfinite(float(loss_all)) and np.isfinite(float(loss_one))

    def test_int8_quantized_serving(self, ar):
        """quantized=True + quantize_params: teacher-forced logits stay close
        to the float model's and compiled generation runs (the sample.py
        --dtype int8 path)."""
        import dataclasses
        from video_tokenizer_tpu.models.larp_ar import quantize_params

        model, variables = ar
        qmodel = LARP_AR(dataclasses.replace(model.config, quantized=True))
        qvars = {"params": quantize_params(variables["params"])}
        # quantized tree has int8 kernels + scales for every projection
        p = qvars["params"]["layers_0"]["attention"]["wqkv"]
        assert p["kernel"].dtype == jnp.int8 and "scale" in p

        idx = jax.random.randint(jax.random.PRNGKey(1), (2, 11), 0, 32)
        cond = jnp.array([0, 1])
        ref, _ = model.apply(variables, idx, cond)
        got, _ = qmodel.apply(qvars, idx, cond)
        err = float(jnp.max(jnp.abs(got - ref)))
        rng_span = float(jnp.max(jnp.abs(ref))) + 1e-6
        assert err / rng_span < 0.05, (err, rng_span)

        seq = generate(qmodel, qvars, cond, 8, jax.random.PRNGKey(0),
                       sample_logits=False)
        assert seq.shape == (2, 8)

    def test_bf16_cache_matches_fp32_cache(self, ar):
        """bf16 params emit bf16 k/v, so the default bf16 KV cache (the HBM
        halving used by sample.py --dtype bfloat16) is lossless vs an fp32
        cache: greedy decode must be bit-identical under either cache_dtype."""
        model, variables = ar
        bf16 = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16)
            if jnp.issubdtype(p.dtype, jnp.floating) else p,
            variables,
        )
        cond = jnp.array([2, 3])
        auto = generate(model, bf16, cond, 8, jax.random.PRNGKey(0),
                        sample_logits=False)
        forced = generate(model, bf16, cond, 8, jax.random.PRNGKey(0),
                          sample_logits=False, cache_dtype=jnp.float32)
        assert np.array_equal(np.asarray(auto), np.asarray(forced))
        # fp32 params keep the fp32 cache default and still decode == TF
        full = generate(model, variables, cond, 8, jax.random.PRNGKey(0),
                        sample_logits=False)
        assert full.shape == (2, 8)

    def test_int8_cache_matches_fp32_cache(self, ar):
        """int8 KV cache (per-row symmetric quantization, [S, 128] scale
        planes): prefill + decode logits stay close to the fp32-cache path,
        and compiled generation with cache_dtype=int8 runs end-to-end."""
        model, variables = ar
        cond = jnp.array([2, 3])
        S = 16  # covers max_seq_len=12, multiple of 8

        def run(dtype):
            cache = model.apply(
                variables, 2, S, dtype, method=model.init_cache
            )
            logits, cache = model.apply(
                variables, cond, cache, None, method=model.prefill
            )
            outs = [logits[:, -1]]
            tok = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
            for i in range(4):
                logits, cache = model.apply(
                    variables, tok, jnp.int32(1 + i), cache,
                    method=model.decode_step,
                )
                outs.append(logits[:, -1])
                tok = jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32)
            return jnp.stack(outs)

        ref = run(jnp.float32)
        got = run(jnp.int8)
        err = float(jnp.max(jnp.abs(got - ref)))
        span = float(jnp.max(jnp.abs(ref))) + 1e-6
        assert err / span < 0.05, (err, span)
        # int8 cache scale planes exist and are written
        cache = model.apply(variables, 2, S, jnp.int8, method=model.init_cache)
        assert cache[0]["k"].dtype == jnp.int8 and "ks" in cache[0]
        _, cache = model.apply(
            variables, cond, cache, None, method=model.prefill
        )
        assert float(jnp.max(cache[0]["ks"])) > 0.0
        # full compiled generation with the int8 cache
        seq = generate(model, variables, cond, 8, jax.random.PRNGKey(0),
                       sample_logits=False, cache_dtype=jnp.int8)
        assert seq.shape == (2, 8)


class TestTopKTopP:
    def test_top_k(self):
        logits = jnp.array([[1.0, 5.0, 3.0, 2.0]])
        f = top_k_top_p_filtering(logits, top_k=2)
        assert np.asarray(f[0, 1]) == 5.0 and np.asarray(f[0, 2]) == 3.0
        assert np.asarray(f[0, 0]) < -1e9 and np.asarray(f[0, 3]) < -1e9

    def test_top_p_keeps_first_above_threshold(self):
        logits = jnp.log(jnp.array([[0.5, 0.3, 0.15, 0.05]]))
        f = np.asarray(top_k_top_p_filtering(logits, top_p=0.6))
        # 0.5 < 0.6 -> keep; 0.5+0.3=0.8 crosses -> keep first crossing (0.3)
        assert f[0, 0] > -1e9 and f[0, 1] > -1e9
        assert f[0, 2] < -1e9 and f[0, 3] < -1e9

    def test_top_p_one_is_noop(self):
        logits = jax.random.normal(jax.random.PRNGKey(0), (2, 10))
        assert np.allclose(
            np.asarray(top_k_top_p_filtering(logits, top_p=1.0)), np.asarray(logits)
        )


class TestBottleneckConfigMatrix:
    """Every cfg-reachable bottleneck (norm x regularizer) must run under a
    jitted train step — latent-config crashes (like unbound axis names) are
    invisible until someone flips the yaml knob."""

    @pytest.mark.parametrize("norm", ["none", "ln_d", "ln_d_na", "ln_nd",
                                      "bn_bn", "bn_b"])
    @pytest.mark.parametrize("reg", ["vq", "skl", "none"])
    def test_norm_reg_combo_jits(self, norm, reg):
        from video_tokenizer_tpu.models.bottleneck import Bottleneck

        if reg == "vq":
            reg_spec = {"name": "vq", "args": {"codebook_size": 16}}
        elif reg == "skl":
            reg_spec = {"name": "skl", "args": {}}
        else:
            reg_spec = {"name": "none"}
        bn = Bottleneck(
            bottleneck_dim=8, norm=norm, input_dim=32, output_dim=32,
            token_nums=4, regularizer=reg_spec,
        )
        z = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 32))
        rngs = {"params": jax.random.PRNGKey(1), "vq": jax.random.PRNGKey(2)}
        v = bn.init(rngs, z, train=True)

        @jax.jit
        def step(v, z):
            return bn.apply(
                v, z, train=True,
                mutable=["batch_stats"] if "bn" in norm else [],
                rngs={"vq": jax.random.PRNGKey(3)},
            )

        out = step(v, z)
        out0 = out[0] if isinstance(out, tuple) else out
        assert np.isfinite(np.asarray(out0["output"], dtype=np.float32)).all()


class TestLossConfigMatrix:
    """All disc_loss x pixel_loss (+ lecam, R1) combos of the GAN loss run
    under jit. Params are re-initialized per combo (same structure) but the
    matrix is tiny: 8-frame 32x32 clips, 1-layer discriminator."""

    @pytest.mark.parametrize("disc_loss", ["hinge", "ns", "ns_smooth"])
    @pytest.mark.parametrize("pixel_loss", ["l1", "l2"])
    def test_gan_loss_combo(self, disc_loss, pixel_loss):
        from video_tokenizer_tpu.registry import models as model_reg
        import video_tokenizer_tpu.models  # noqa: F401

        loss_mod = model_reg.make({
            "name": "lpips_disc_loss",
            "args": {
                "disc_start": 0, "disc_loss": disc_loss,
                "pixel_loss": pixel_loss, "disc_weight": 0.3,
                "lecam_weight": 0.001, "r1_gp_weight": 0.01,
                "d_update_freq": 1, "disc_tran_hidden_size": 64,
                "disc_tran_n_heads": 4, "disc_tran_n_layers": 1,
                "disc_tran_temporal_patch_size": 4, "disc_tran_patch_size": 8,
                "input_spatial_size": 32, "frame_num": 8,
            },
        })
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 8, 32, 32))
        y = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 8, 32, 32))
        variables = loss_mod.init(
            {"params": jax.random.PRNGKey(2), "gan": jax.random.PRNGKey(3)},
            x, y, method=loss_mod.initialize,
        )

        @jax.jit
        def g_loss(v, x, y):
            out = loss_mod.apply(
                v, x, y, jnp.asarray(0, jnp.int32),
                method=loss_mod.generator_loss,
                rngs={"gan": jax.random.PRNGKey(4)},
            )
            return out

        @jax.jit
        def d_loss(v, x, y):
            out, _ = loss_mod.apply(
                v, x, y, jnp.asarray(0, jnp.int32),
                method=loss_mod.discriminator_loss, train=True,
                mutable=["ema"], rngs={"gan": jax.random.PRNGKey(5)},
            )
            return out

        g = g_loss(variables, x, y)
        d = d_loss(variables, x, y)
        g0 = g[0] if isinstance(g, tuple) else g
        d0 = d[0] if isinstance(d, tuple) else d
        leaves = jax.tree_util.tree_leaves((g0, d0))
        assert all(np.isfinite(np.asarray(l, np.float32)).all() for l in leaves)

    def test_spectral_normalize_params(self):
        """Every kernel leaf has top singular value ~1 after the transform;
        non-kernel leaves untouched (reference apply_spectral_norm wraps only
        Linear/Conv, loss.py:59-64)."""
        from video_tokenizer_tpu.models.loss import spectral_normalize_params

        rng = np.random.RandomState(0)
        params = {
            "blk": {
                "attn": {"kernel": jnp.asarray(
                    10.0 * rng.randn(16, 48), jnp.float32)},
                "bias": jnp.asarray(rng.randn(48), jnp.float32),
            },
            "embed": {"kernel": jnp.asarray(
                5.0 * rng.randn(2, 4, 4, 3, 8), jnp.float32)},
            "cls_token": jnp.asarray(rng.randn(1, 1, 16), jnp.float32),
        }
        out = spectral_normalize_params(params)
        s_attn = np.linalg.svd(
            np.asarray(out["blk"]["attn"]["kernel"]), compute_uv=False)[0]
        s_emb = np.linalg.svd(
            np.asarray(out["embed"]["kernel"]).reshape(-1, 8),
            compute_uv=False)[0]
        assert abs(s_attn - 1.0) < 1e-2, s_attn
        assert abs(s_emb - 1.0) < 1e-2, s_emb
        np.testing.assert_array_equal(
            np.asarray(out["blk"]["bias"]), np.asarray(params["blk"]["bias"]))
        np.testing.assert_array_equal(
            np.asarray(out["cls_token"]), np.asarray(params["cls_token"]))

    def test_gan_loss_spectral_norm(self):
        """spectral_norm: true (reference loss.py:275-276) trains: both loss
        paths finite under jit and the d-loss gradient reaches the
        discriminator kernels through the sigma division."""
        from video_tokenizer_tpu.registry import models as model_reg
        import video_tokenizer_tpu.models  # noqa: F401

        loss_mod = model_reg.make({
            "name": "lpips_disc_loss",
            "args": {
                "disc_start": 0, "disc_loss": "hinge", "disc_weight": 0.3,
                "spectral_norm": True, "d_update_freq": 1,
                "disc_tran_hidden_size": 64, "disc_tran_n_heads": 4,
                "disc_tran_n_layers": 1, "disc_tran_temporal_patch_size": 4,
                "disc_tran_patch_size": 8, "input_spatial_size": 32,
                "frame_num": 8,
            },
        })
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 8, 32, 32))
        y = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 8, 32, 32))
        variables = loss_mod.init(
            {"params": jax.random.PRNGKey(2), "gan": jax.random.PRNGKey(3)},
            x, y, method=loss_mod.initialize,
        )

        @jax.jit
        def d_loss(v, x, y):
            (out, _), _ = loss_mod.apply(
                v, x, y, jnp.asarray(0, jnp.int32),
                method=loss_mod.discriminator_loss, train=True,
                mutable=["ema"], rngs={"gan": jax.random.PRNGKey(5)},
            )
            return out

        d = d_loss(variables, x, y)
        assert np.isfinite(float(d))
        g = jax.grad(lambda v: d_loss(v, x, y))(variables)
        disc_g = g["params"]["discriminator"]
        total = sum(
            float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(disc_g)
        )
        assert np.isfinite(total) and total > 0.0


class TestARConfigMatrix:
    """AR ModelArgs knobs that cfgs can flip must all train + generate."""

    @pytest.mark.parametrize("kw", [
        dict(use_fixed_pe=True),
        dict(n_kv_head=None),
        dict(drop_path_rate=0.1),
        dict(token_dropout_p=0.1, resid_dropout_p=0.1, ffn_dropout_p=0.1),
    ])
    def test_train_and_generate(self, kw):
        base = dict(
            dim=64, n_layer=2, n_head=4, n_kv_head=2, vocab_size=32,
            num_classes=5, max_seq_len=8, token_dropout_p=0.0,
            resid_dropout_p=0.0, ffn_dropout_p=0.0,
        )
        base.update(kw)
        model = LARP_AR(ModelArgs(**base))
        idx = jnp.zeros((2, 7), jnp.int32)
        cond = jnp.array([0, 1])
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            idx, cond,
        )
        tgt = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, 32)

        @jax.jit
        def loss(v, idx, cond, tgt):
            _, l = model.apply(
                v, idx, cond, targets=tgt, train=True,
                rngs={"dropout": jax.random.PRNGKey(3)},
            )
            return l

        l = loss(variables, idx, cond, tgt)
        assert np.isfinite(float(l))
        seq = generate(model, variables, cond, 8, jax.random.PRNGKey(4))
        assert seq.shape == (2, 8)

    @pytest.mark.parametrize("genkw", [
        dict(cfg_scale=1.5, cfg_interval=4),
        dict(temperature=0.7, top_k=3),
        dict(top_p=0.5),
        dict(sample_logits=False, cfg_scale=2.0),
    ])
    def test_generation_knobs(self, genkw):
        cfg = ModelArgs(
            dim=64, n_layer=1, n_head=4, vocab_size=32, num_classes=5,
            max_seq_len=8, token_dropout_p=0.0, resid_dropout_p=0.0,
            ffn_dropout_p=0.0,
        )
        model = LARP_AR(cfg)
        cond = jnp.array([0, 1])
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, 7), jnp.int32), cond
        )
        seq = generate(model, variables, cond, 8, jax.random.PRNGKey(1), **genkw)
        assert seq.shape == (2, 8)
        assert ((np.asarray(seq) >= 0) & (np.asarray(seq) < 32)).all()


class TestRemat:
    def test_ar_remat_matches_baseline(self):
        """remat=True is numerically identical (same params) and halves
        nothing visible — grads must match exactly."""
        base = dict(
            dim=64, n_layer=2, n_head=4, vocab_size=32, num_classes=5,
            max_seq_len=8, token_dropout_p=0.0, resid_dropout_p=0.0,
            ffn_dropout_p=0.0,
        )
        m0 = LARP_AR(ModelArgs(**base))
        m1 = LARP_AR(ModelArgs(remat=True, **base))
        idx = jnp.zeros((2, 7), jnp.int32)
        cond = jnp.array([0, 1])
        v = m0.init({"params": jax.random.PRNGKey(0)}, idx, cond)
        tgt = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 32)

        def loss(model):
            def f(p):
                _, l = model.apply({"params": p}, idx, cond, targets=tgt)
                return l
            return f

        l0, g0 = jax.value_and_grad(loss(m0))(v["params"]), None
        l1 = jax.value_and_grad(loss(m1))(v["params"])
        assert np.allclose(float(l0[0]), float(l1[0]), atol=1e-6)
        for a, b in zip(
            jax.tree_util.tree_leaves(l0[1]), jax.tree_util.tree_leaves(l1[1])
        ):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        # generation still works with the remat flag set
        seq = generate(m1, v, cond, 8, jax.random.PRNGKey(2))
        assert seq.shape == (2, 8)

    def test_tokenizer_remat_matches_baseline(self):
        m0 = tiny_tokenizer()
        m1 = tiny_tokenizer(remat=True)
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 8, 32, 32))
        v = m0.init(
            {"params": jax.random.PRNGKey(1), "vq": jax.random.PRNGKey(2)},
            x, train=True,
        )

        def loss(model):
            def f(p):
                out = model.apply(
                    {"params": p}, x, train=True,
                    rngs={"vq": jax.random.PRNGKey(3)},
                )
                return jnp.mean(out["pred_frames"] ** 2) + out["loss_q"]
            return f

        l0 = jax.value_and_grad(loss(m0))(v["params"])
        l1 = jax.value_and_grad(loss(m1))(v["params"])
        assert np.allclose(float(l0[0]), float(l1[0]), atol=1e-6)
        for a, b in zip(
            jax.tree_util.tree_leaves(l0[1]), jax.tree_util.tree_leaves(l1[1])
        ):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestGPTCPrior:
    """Co-trained continuous AR prior (reference gptc.py; the committed
    reference hard-disables the prior at larp_tokenizer.py:241 — this
    framework keeps the original LARP recipe functional)."""

    def test_cotrained_prior_emits_latent_ce_with_grads(self):
        model = tiny_tokenizer(prior_model={
            "name": "gptc",
            "args": {"n_layer": 1, "n_head": 2, "n_embd": 32},
        })
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 8, 32, 32))
        variables = model.init(
            {"params": jax.random.PRNGKey(1), "vq": jax.random.PRNGKey(2)},
            x, train=True,
        )
        assert "prior" in variables["params"]

        def loss(params):
            out = model.apply(
                {"params": params}, x, train=True,
                rngs={"vq": jax.random.PRNGKey(3)},
            )
            return out["loss_latent_ce"]

        val, grads = jax.value_and_grad(loss)(variables["params"])
        assert np.isfinite(float(val))
        gnorm = sum(
            float(jnp.sum(jnp.abs(g)))
            for g in jax.tree_util.tree_leaves(grads["prior"])
        )
        assert gnorm > 0.0  # the prior actually trains

    def test_bare_gptc_name_builds_from_kwargs(self):
        from video_tokenizer_tpu.registry import models as models_reg

        m = models_reg.make({
            "name": "gptc",
            "args": {"n_layer": 1, "n_head": 2, "n_embd": 32, "n_ind": 8,
                     "max_seq_len": 16},
        })
        x = jnp.zeros((2, 16, 8))
        v = m.init({"params": jax.random.PRNGKey(0)}, x)
        loss = m.apply(v, x, method=m.compute_prior_loss)
        assert np.isfinite(float(loss))

    def test_gptc_incremental_decode(self):
        """Cached decode_step == matching slice of the full forward — the
        TPU-native form of the reference's (dead) layer_past path
        (/root/reference/models/gptc.py:54-76)."""
        from video_tokenizer_tpu.registry import models as models_reg

        m = models_reg.make({
            "name": "gptc",
            "args": {"n_layer": 2, "n_head": 2, "n_embd": 32, "n_ind": 8,
                     "max_seq_len": 16, "embd_pdrop": 0.0,
                     "resid_pdrop": 0.0},
        })
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 8))
        v = m.init({"params": jax.random.PRNGKey(1)}, x)
        full, _ = m.apply(v, x)  # [2, 10, 8]

        cache = m.apply(v, 2, 16, method=m.init_cache)
        # prefill the first 6 positions as one chunk, then step one by one
        pred, cache = m.apply(v, x[:, :6], 0, cache, method=m.decode_step)
        np.testing.assert_allclose(
            np.asarray(pred), np.asarray(full[:, :6]), atol=1e-5
        )
        for t in range(6, 10):
            pred, cache = m.apply(
                v, x[:, t : t + 1], t, cache, method=m.decode_step
            )
            np.testing.assert_allclose(
                np.asarray(pred), np.asarray(full[:, t : t + 1]), atol=1e-5
            )

    def test_prior_with_fsq_bottleneck_rejected(self):
        model = tiny_tokenizer(
            bottleneck_type="fsq",
            bottleneck={"name": "fsq", "args": {"levels": [8, 8, 5]}},
            prior_model={"name": "gptc", "args": {"n_layer": 1}},
        )
        x = jnp.zeros((1, 3, 8, 32, 32))
        with pytest.raises(ValueError, match="vq"):
            model.init(
                {"params": jax.random.PRNGKey(0), "vq": jax.random.PRNGKey(1)},
                x,
            )


class TestStandaloneGANHelpers:
    """The relativistic / noise-GP losses mirror the reference's per-family
    loss modules, which are likewise NOT wired into any trainer (reference
    models/model/losses/loss_module.py imports `model.*` — standalone
    provenance, SURVEY.md row 36). Exercised here so they stay correct."""

    def test_relativistic_losses_oppose(self):
        from video_tokenizer_tpu.models.loss import (
            relativistic_d_loss, relativistic_g_loss,
        )

        real = jnp.asarray([2.0, 1.0])
        fake = jnp.asarray([-1.0, 0.0])
        d = float(relativistic_d_loss(real, fake))
        g = float(relativistic_g_loss(real, fake))
        assert d < np.log(2.0) < g  # correct-ordering side is cheap
        # symmetric when logits swap roles
        assert np.isclose(
            d, float(relativistic_g_loss(fake, real)), atol=1e-6
        )

    def test_noise_gradient_penalty_zero_for_constant_disc(self):
        from video_tokenizer_tpu.models.loss import noise_gradient_penalty

        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8))
        p_const = noise_gradient_penalty(
            lambda v: jnp.ones((v.shape[0], 1)), x, jax.random.PRNGKey(1)
        )
        p_linear = noise_gradient_penalty(
            lambda v: 100.0 * jnp.sum(v, axis=-1, keepdims=True),
            x, jax.random.PRNGKey(1),
        )
        assert float(p_const) == 0.0 and float(p_linear) > 0.0

    def test_measure_perplexity_uniform(self):
        from video_tokenizer_tpu.models.loss import measure_perplexity

        idx = jnp.arange(16) % 4
        perp, used = measure_perplexity(idx, 4)
        assert np.isclose(float(perp), 4.0, rtol=1e-4)
        assert int(used) == 4
