"""End-to-end test of the reconstruction-eval CLI
(eval/eval_larp_tokenizer.py, reference eval/eval_larp_tokenizer.py:17-91):
tiny checkpoint -> encode/decode over the fake dataset -> MSE/PSNR/LPIPS/rFVD
dict. I3D/LPIPS are weight-gated (random init), so values are meaningless but
every stage of the evaluator runs.
"""
import sys

import jax
import jax.numpy as jnp

import video_tokenizer_tpu.models  # noqa: F401
from video_tokenizer_tpu import registry
from video_tokenizer_tpu.utils import checkpoint as ckpt_lib

TOK_SPEC = {
    "name": "larp_tokenizer",
    "args": {
        "bottleneck_token_num": 16,
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
                "codebook_size": 32}}}},
        "prior_model": None,
    },
}


def test_eval_cli_end_to_end(tmp_path, monkeypatch, capsys):
    tok = registry.models.make(TOK_SPEC)
    x = jnp.zeros((1, 3, 8, 32, 32))
    variables = tok.init(
        {"params": jax.random.PRNGKey(0), "vq": jax.random.PRNGKey(1)}, x
    )
    tok_dir = tmp_path / "tok"
    ckpt_lib.save_checkpoint(
        str(tok_dir), {"params": variables["params"]},
        meta={"model": TOK_SPEC},
    )

    sys.path.insert(0, "eval")
    import eval_larp_tokenizer as eval_cli

    monkeypatch.setattr(sys, "argv", [
        "eval_larp_tokenizer.py", "--tokenizer", str(tok_dir),
        "--csv_path", "null128", "--frames", "8", "--input_size", "32",
        "--batch_size", "4", "--num_workers", "0", "--max_batches", "2",
    ])
    eval_cli.main()
    out = capsys.readouterr().out
    for key in ("num_samples", "mse", "psnr", "lpips", "fvd"):
        assert f"{key}:" in out, out

    # reference CLI spellings (reference eval_larp_tokenizer.py:19-30):
    # --dataset_csv/--num_frames aliases, --use_amp bf16 cast, --no_fvd,
    # accepted no-ops --compile/--det/--amp_dtype
    monkeypatch.setattr(sys, "argv", [
        "eval_larp_tokenizer.py", "--tokenizer", str(tok_dir),
        "--dataset_csv", "null128", "--num_frames", "8", "--input_size", "32",
        "--batch_size", "4", "--num_workers", "0", "--max_batches", "1",
        "--use_amp", "--amp_dtype", "float16", "--compile", "--det",
        "--no_fvd",
    ])
    eval_cli.main()
    out = capsys.readouterr().out
    for key in ("num_samples", "mse", "psnr", "lpips"):
        assert f"{key}:" in out, out
    assert "fvd:" not in out  # --no_fvd skipped the I3D stage
