"""Every registered tokenizer family forwards at tiny scale (round-trip)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import video_tokenizer_tpu.models  # noqa: F401
from video_tokenizer_tpu.registry import models

TINY_TEACHER = {
    "teacher_dim": 32, "teacher_depth": 1, "teacher_heads": 4,
    "vjepa2_img_size": 32, "vjepa2_num_frames": 8, "vjepa2_patch_size": 8,
    "vjepa2_tubelet_size": 2, "out_layers": (0,),
}

CASES = [
    ("autoencoder", {"model_size": "tiny", "num_latent_tokens": 8, "input_size": 32, "frame_num": 16}, (1, 3, 16, 32, 32)),
    ("autoencoder_dualpatch", {"model_size": "tiny", "num_latent_tokens": 8, "input_size": 32, "frame_num": 16}, (1, 3, 16, 32, 32)),
    ("autoencoder_first_token", {"model_size": "tiny", "num_latent_tokens": 8, "first_frame_tokens": 4, "input_size": 32, "frame_num": 16}, (1, 3, 16, 32, 32)),
    ("autoencoder_design", {"model_size": "tiny", "num_latent_tokens": 8, "first_frame_tokens": 4, "input_size": 32, "frame_num": 16}, (1, 3, 16, 32, 32)),
    ("autoencoder_convpatchify", {"model_size": "tiny", "num_latent_tokens": 8, "input_size": 32, "frame_num": 8}, (1, 3, 8, 32, 32)),
    ("autoencoder_convpatchify_greatfsq", {"model_size": "tiny", "num_latent_tokens": 8, "input_size": 32, "frame_num": 8}, (1, 3, 8, 32, 32)),
    ("autoencoder_convpatchify_mask2", {"model_size": "tiny", "num_latent_tokens": 8, "input_size": 32, "frame_num": 8}, (1, 3, 8, 32, 32)),
    ("autoencoder_mask3", {"model_size": "tiny", "num_latent_tokens": 8, "input_size": 32, "frame_num": 8}, (1, 3, 8, 32, 32)),
    ("autoencoder_convpatchify_simplytransformer", {"model_size": "tiny", "num_latent_tokens": 8, "input_size": 32, "frame_num": 8}, (1, 3, 8, 32, 32)),
    ("autoencoder_large", {"model_size": "tiny", "num_latent_tokens": 8, "input_size": 32, "frame_num": 8}, (1, 3, 8, 32, 32)),
    ("autoencoder_first_token_f256t512", {"model_size": "tiny", "decoder_model_size": "tiny", "num_latent_tokens": 8, "first_frame_tokens": 4, "input_size": 32, "frame_num": 8}, (1, 3, 8, 32, 32)),
    ("autoencoder_stat", {"model_size": "tiny", "num_latent_tokens": 8, "input_size": 32, "frame_num": 8}, (1, 3, 8, 32, 32)),
    ("titok", {"model_size": "tiny", "num_latent_tokens": 8, "input_size": 32, "frame_num": 8}, (1, 3, 8, 32, 32)),
    ("cosmos", {"base_channels": 8, "latent_dim": 16, "codebook_size": 64}, (1, 3, 9, 32, 32)),
    ("cosmos_fsq", {"base_channels": 8, "latent_dim": 16}, (1, 3, 9, 32, 32)),
    ("autoencoder_cnnvit", {"model_size": "tiny", "num_latent_tokens": 8, "input_size": 32, "frame_num": 16, "cnn_ch": 8}, (1, 3, 16, 32, 32)),
    ("autoencoder_cnnvit_softalign", {"model_size": "tiny", "num_latent_tokens": 8, "input_size": 32, "frame_num": 16, "cnn_ch": 8, "align_num_prototypes": 4, "align_pca_rank": 2, "teacher_dim": 32, "teacher_depth": 1, "teacher_heads": 4, "vjepa2_img_size": 32, "vjepa2_num_frames": 16, "vjepa2_patch_size": 8, "vjepa2_tubelet_size": 2}, (1, 3, 16, 32, 32)),
    ("autoencoder_cnnvit_resnaf", {"model_size": "tiny", "input_size": 32, "frame_num": 16}, (1, 3, 16, 32, 32)),
    ("larp_tokenizer_vfm_noquant", {**TINY_TEACHER, "decoder_hidden_size": 32, "dec_depth": 1, "dec_heads": 4}, (1, 3, 8, 32, 32)),
    ("autoencoder_vfm", {**TINY_TEACHER, "model_size": "tiny", "num_latent_tokens": 4, "pixel_dec_width": 32, "pixel_dec_depth": 1, "pixel_dec_heads": 4}, (1, 3, 8, 32, 32)),
]


@pytest.mark.parametrize("name,args,shape", CASES, ids=[c[0] for c in CASES])
def test_family_forward(name, args, shape):
    m = models.make({"name": name, "args": args})
    x = jax.random.uniform(jax.random.PRNGKey(0), shape)
    rngs = {"params": jax.random.PRNGKey(1), "vq": jax.random.PRNGKey(2),
            "stat": jax.random.PRNGKey(3), "kmeans": jax.random.PRNGKey(4)}
    variables = m.init(rngs, x)
    out = m.apply(
        variables, x,
        rngs={k: v for k, v in rngs.items() if k != "params"},
    )
    assert out["pred_frames"].shape == shape
    assert np.isfinite(np.asarray(out["pred_frames"])).all()


class TestTiTokPaths:
    def test_batched_fast_path_matches_packed_and_protocol_decode(self):
        """Uniform batches run batched [B, L] attention; numerics must
        match the packed [1, B*L] path, and decode_from_bottleneck must
        accept the uniform [B, N] protocol every other family exposes."""
        import numpy as np

        from video_tokenizer_tpu.registry import models as models_reg

        m = models_reg.make({"name": "titok", "args": {
            "model_size": "tiny", "num_latent_tokens": 8,
            "input_size": 16, "frame_num": 4, "patch_size": (2, 8, 8)}})
        x = jax.random.uniform(jax.random.PRNGKey(0), (3, 3, 4, 16, 16))
        v = m.init(jax.random.PRNGKey(1), x)
        out = m.apply(v, x)
        assert out["pred_frames"].shape == x.shape

        xl = [x[i] for i in range(3)]
        enc_b = m.apply(v, xl, [8] * 3, method=m.encode_packed)
        enc_1 = m.apply(v, [xl[0]], [8], method=m.encode_packed)
        np.testing.assert_allclose(
            np.asarray(enc_b[0][:8]), np.asarray(enc_1[0]), atol=2e-5
        )

        vid = m.apply(v, out["bottleneck_rep"], method=m.decode_from_bottleneck)
        assert vid.shape == x.shape


def test_vfm_exposes_trainer_geometry():
    """Both trainers read int(model.frame_num) / int(model.input_size) at
    init (tokenizer_trainer.py:89, ar_trainer.py:115) — the vfm family
    must expose them like every other registered tokenizer."""
    from video_tokenizer_tpu.registry import models as models_reg

    for name in ("larp_tokenizer_vfm_noquant", "larp_tokenizer_vfm"):
        m = models_reg.make({"name": name, "args": {
            "teacher_dim": 32, "teacher_depth": 1, "teacher_heads": 2,
            "vjepa2_img_size": 32, "vjepa2_num_frames": 4,
            "out_layers": (0,)}})
        assert int(m.frame_num) == 4 and int(m.input_size) == 32
