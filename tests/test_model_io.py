"""from_pretrained hub-cache shim (reference sample.py:404-415,
PyTorchModelHubMixin on larp_tokenizer.py:45 / larp_ar.py:233)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import video_tokenizer_tpu.models  # noqa: F401  (registry population)
from video_tokenizer_tpu.utils import checkpoint as ckpt_lib
from video_tokenizer_tpu.utils.model_io import (
    HUB_CACHE_ENV,
    load_model_from_checkpoint,
    load_model_pretrained,
    resolve_pretrained,
)

TINY_SPEC = {
    "name": "larp_tokenizer",
    "args": {
        "bottleneck_token_num": 4,
        "input_size": 32,
        "frame_num": 8,
        "encoder_hidden_size": 32,
        "decoder_hidden_size": 32,
        "encoder_num_heads": 4,
        "decoder_num_heads": 4,
        "encoder_depth": 1,
        "decoder_depth": 1,
        "bottleneck": {"name": "bottleneck", "args": {
            "bottleneck_dim": 8, "regularizer": {"name": "vq", "args": {
                "codebook_size": 16}}}},
        "prior_model": None,
    },
}


def _save_tiny_checkpoint(path):
    from video_tokenizer_tpu import registry

    model = registry.models.make(TINY_SPEC)
    x = jnp.zeros((1, 3, 8, 32, 32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "vq": jax.random.PRNGKey(1)}, x
    )
    ckpt_lib.save_checkpoint(
        str(path), {"params": variables["params"]}, meta={"model": TINY_SPEC}
    )


class TestFromPretrained:
    def test_local_path_passthrough(self, tmp_path):
        ck = tmp_path / "local_ck"
        _save_tiny_checkpoint(ck)
        assert resolve_pretrained(str(ck)) == str(ck)
        model, params = load_model_pretrained(str(ck))
        assert model.bottleneck_token_num == 4

    def test_hub_id_resolves_via_cache(self, tmp_path, monkeypatch):
        cache = tmp_path / "hub"
        _save_tiny_checkpoint(cache / "org--tiny-tokenizer")
        monkeypatch.setenv(HUB_CACHE_ENV, str(cache))
        model, params = load_model_pretrained("org/tiny-tokenizer")
        ref_model, ref_params = load_model_from_checkpoint(
            str(cache / "org--tiny-tokenizer")
        )
        assert model.bottleneck_token_num == ref_model.bottleneck_token_num
        a = jax.tree_util.tree_leaves(params)
        b = jax.tree_util.tree_leaves(ref_params)
        assert all(np.array_equal(x, y) for x, y in zip(a, b))

    def test_classmethod_entry(self, tmp_path, monkeypatch):
        from video_tokenizer_tpu.models.larp_tokenizer import LARPTokenizer

        cache = tmp_path / "hub"
        _save_tiny_checkpoint(cache / "org--tok")
        monkeypatch.setenv(HUB_CACHE_ENV, str(cache))
        model, params = LARPTokenizer.from_pretrained("org/tok")
        out = model.apply(
            {"params": params}, jnp.zeros((1, 3, 8, 32, 32)),
            rngs={"vq": jax.random.PRNGKey(0)},
        )
        assert out["pred_frames"].shape == (1, 3, 8, 32, 32)

    def test_offline_miss_is_clear(self, tmp_path, monkeypatch):
        monkeypatch.setenv(HUB_CACHE_ENV, str(tmp_path / "empty"))
        with pytest.raises(FileNotFoundError, match="network egress"):
            resolve_pretrained("org/absent-model")


class TestAsyncCheckpoint:
    def test_nonblocking_save_commits_and_restores(self, tmp_path):
        """block=False snapshots to host, writes in the background; after
        wait_for_pending the checkpoint is committed and restores exactly.
        A second save to the same path serializes behind the first."""
        state = {
            "params": {"w": jnp.arange(6.0).reshape(2, 3)},
            "step": jnp.asarray(3),
        }
        path = tmp_path / "async-ckpt"
        ckpt_lib.save_checkpoint(
            str(path), state, meta={"epoch": 1}, block=False
        )
        ckpt_lib.wait_for_pending()
        assert ckpt_lib.checkpoint_exists(str(path))
        assert ckpt_lib.load_meta(str(path))["epoch"] == 1
        out = ckpt_lib.restore_checkpoint(str(path), state)
        np.testing.assert_array_equal(
            np.asarray(out["params"]["w"]), np.asarray(state["params"]["w"])
        )

        # overwrite asynchronously; restore (which waits) sees the new value
        state2 = {
            "params": {"w": jnp.full((2, 3), 7.0)},
            "step": jnp.asarray(4),
        }
        ckpt_lib.save_checkpoint(str(path), state2, block=False)
        out2 = ckpt_lib.restore_checkpoint(str(path), state2)
        assert float(np.asarray(out2["params"]["w"])[0, 0]) == 7.0
        assert int(np.asarray(out2["step"])) == 4


class TestReferenceExport:
    """Round-trip: tools/export_reference_tokenizer.py (Flax -> reference
    torch state dict) inverted by tools/convert_reference_tokenizer.py
    must give back the identical param tree — so checkpoints trained here
    load in the upstream reference via its from_checkpoint format."""

    def _assert_trees_equal(self, a, b):
        fa = jax.tree_util.tree_flatten_with_path(a)
        fb = jax.tree_util.tree_flatten_with_path(b)
        assert [p for p, _ in fa[0]] == [p for p, _ in fb[0]]
        for (path, x), (_, y) in zip(fa[0], fb[0]):
            np.testing.assert_array_equal(
                np.asarray(x, np.float32), np.asarray(y, np.float32),
                err_msg=str(path),
            )

    def test_tokenizer_roundtrip(self):
        import sys as _sys
        _sys.path.insert(0, "tools")
        from convert_reference_tokenizer import convert_larp_tokenizer
        from export_reference_tokenizer import export_larp_tokenizer

        from video_tokenizer_tpu import registry

        model = registry.models.make(TINY_SPEC)
        x = jnp.zeros((1, 3, 8, 32, 32))
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "vq": jax.random.PRNGKey(1)}, x
        )
        params = jax.tree_util.tree_map(np.asarray, variables["params"])
        sd = export_larp_tokenizer(model, params)
        # persistent sin-cos buffers present for the reference's strict load
        for buf in ("encoder_patch_pe", "decoder_latent_pe",
                    "decoder_patch_query_embed"):
            assert buf in sd, buf
        back = convert_larp_tokenizer(sd)
        self._assert_trees_equal(params, back)

    def test_ar_roundtrip_and_torch_load(self, tmp_path):
        import sys as _sys
        _sys.path.insert(0, "tools")
        from convert_reference_tokenizer import convert_larp_ar
        from export_reference_tokenizer import export_larp_ar, main as export_main

        from video_tokenizer_tpu.models.larp_ar import LARP_AR, ModelArgs

        cfg = ModelArgs(
            dim=32, n_layer=2, n_head=4, vocab_size=16, num_classes=7,
            class_dropout_prob=0.1, max_seq_len=8, token_dropout_p=0.0,
            resid_dropout_p=0.0, ffn_dropout_p=0.0,
        )
        ar = LARP_AR(cfg)
        idx = jnp.zeros((1, 4), jnp.int32)
        cond = jnp.zeros((1,), jnp.int32)
        variables = ar.init({"params": jax.random.PRNGKey(2)}, idx, cond)
        params = jax.tree_util.tree_map(np.asarray, variables["params"])
        sd = export_larp_ar(ar, params)
        back = convert_larp_ar(sd)
        self._assert_trees_equal(params, back)

        # CLI path: checkpoint dir -> .pth loadable by torch in the
        # reference's {"model": {"name", "args", "sd"}} shape
        torch = pytest.importorskip("torch")
        import dataclasses
        ck = tmp_path / "ar_ckpt"
        ckpt_lib.save_checkpoint(
            str(ck), {"params": params},
            meta={"model": {"name": "larp_ar",
                            "args": dataclasses.asdict(cfg)}},
        )
        out = tmp_path / "ar_ref.pth"
        argv = _sys.argv
        _sys.argv = ["export", "ar", str(ck), str(out)]
        try:
            export_main()
        finally:
            _sys.argv = argv
        blob = torch.load(str(out), map_location="cpu", weights_only=False)
        assert blob["model"]["name"] == "larp_ar"
        assert "layers.1.attention.wqkv.weight" in blob["model"]["sd"]
        w = blob["model"]["sd"]["tok_embeddings.weight"]
        np.testing.assert_array_equal(
            w.numpy(), np.asarray(params["tok_embeddings"]["embedding"])
        )
