"""End-to-end test of the sample.py serving CLI (reference sample.py:391-457):
tiny checkpoints -> class-conditional sampling -> NLL -> decode -> mp4s ->
FeatureStats pkls -> FileLock finalize -> fvd_report.csv. I3D is weight-gated
(random init here), so the FVD value is meaningless but the pipeline is real.
"""
import csv
import dataclasses
import sys

import jax
import jax.numpy as jnp
import pytest

import video_tokenizer_tpu.models  # noqa: F401
from video_tokenizer_tpu import registry
from video_tokenizer_tpu.models.larp_ar import LARP_AR, ModelArgs
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


@pytest.fixture(scope="module")
def checkpoints(tmp_path_factory):
    root = tmp_path_factory.mktemp("sample_cli")
    tok = registry.models.make(TOK_SPEC)
    x = jnp.zeros((1, 3, 8, 32, 32))
    tok_vars = tok.init(
        {"params": jax.random.PRNGKey(0), "vq": jax.random.PRNGKey(1)}, x
    )
    tok_dir = root / "tok"
    ckpt_lib.save_checkpoint(
        str(tok_dir), {"params": tok_vars["params"]},
        meta={"model": TOK_SPEC},
    )

    ar_cfg = ModelArgs(
        dim=32, n_layer=1, n_head=4, vocab_size=32, num_classes=101,
        max_seq_len=16, token_dropout_p=0.0, resid_dropout_p=0.0,
        ffn_dropout_p=0.0,
    )
    ar = LARP_AR(ar_cfg)
    idx = jnp.zeros((1, 8), jnp.int32)
    cond = jnp.zeros((1,), jnp.int32)
    ar_vars = ar.init({"params": jax.random.PRNGKey(2)}, idx, cond)
    ar_dir = root / "ar"
    ckpt_lib.save_checkpoint(
        str(ar_dir), {"params": ar_vars["params"]},
        meta={"model": {"name": "larp_ar",
                        "args": dataclasses.asdict(ar_cfg)}},
    )
    return tok_dir, ar_dir, root


def test_sample_cli_end_to_end(checkpoints, monkeypatch):
    import sample as sample_cli

    tok_dir, ar_dir, root = checkpoints
    out = root / "e2e" / "samples"
    monkeypatch.setattr(sys, "argv", [
        "sample.py",
        "--ar_model", str(ar_dir), "--tokenizer", str(tok_dir),
        "--csv_file", "null128", "--frame_num", "8", "--input_size", "32",
        "--batch_size", "2", "--num_samples", "4", "--top_k", "8",
        "--dtype", "float32", "--save_videos", "--output_dir", str(out),
    ])
    sample_cli.main()

    assert (out / "gen_stats_0.pkl").exists()
    assert (out / "real_stats_0.pkl").exists()
    videos = list((out / "videos").glob("*.mp4"))
    assert len(videos) == 4
    report = out.parent / "fvd_report.csv"
    assert report.exists()
    with open(report) as f:
        rows = list(csv.reader(f))
    assert rows[0][:2] == ["time", "ar_model"]
    assert len(rows) == 2 and rows[1][-1]  # one result row with an FVD value


def test_sample_cli_reference_spellings(checkpoints, monkeypatch):
    """The reference CLI's argument spellings (sample.py:47-67) are accepted
    as drop-in aliases: --dataset_csv/--sample_batch_size/--ns/--cs/--fp,
    --num_samples_total (implies num_jobs), --stats_only, --replace."""
    import sample as sample_cli

    tok_dir, ar_dir, root = checkpoints
    out = root / "refargs" / "samples"
    argv = [
        "sample.py",
        "--ar_model", str(ar_dir), "--tokenizer", str(tok_dir),
        "--dataset_csv", "null128", "--frame_num", "8", "--input_size", "32",
        "--sample_batch_size", "2", "--ns", "4", "--num_samples_total", "4",
        "--cs", "1.5", "--top_k", "8", "--dtype", "float32",
        "--stats_only", "--save_videos",  # stats_only wins
        "--output_dir", str(out),
    ]
    monkeypatch.setattr(sys, "argv", argv)
    sample_cli.main()
    assert (out / "gen_stats_0.pkl").exists()
    assert not (out / "videos").exists()  # --stats_only suppressed mp4s
    with open(out.parent / "fvd_report.csv") as f:
        rows = list(csv.reader(f))
    assert len(rows) == 2
    assert rows[1][3] == "1.5"  # cfg_scale column came from --cs

    # --replace clears the first run's rendezvous artifacts so the rerun
    # produces exactly one fresh shard set and appends a second report row
    monkeypatch.setattr(sys, "argv", argv + ["--replace"])
    sample_cli.main()
    assert len(list(out.glob("gen_stats_*.pkl"))) == 1
    with open(out.parent / "fvd_report.csv") as f:
        rows = list(csv.reader(f))
    assert len(rows) == 3


def test_sample_cli_tp_serving(checkpoints, monkeypatch):
    """--mesh_model 2 serves with Megatron-sharded AR + ViT params on the
    8-device mesh (data=4 x model=2); the pipeline must run end-to-end and
    produce stats shards exactly like single-device serving."""
    import sample as sample_cli

    tok_dir, ar_dir, root = checkpoints
    out = root / "tp" / "samples"
    monkeypatch.setattr(sys, "argv", [
        "sample.py",
        "--ar_model", str(ar_dir), "--tokenizer", str(tok_dir),
        "--csv_file", "null128", "--frame_num", "8", "--input_size", "32",
        "--batch_size", "4", "--num_samples", "4", "--top_k", "8",
        "--dtype", "float32", "--mesh_model", "2",
        "--output_dir", str(out),
    ])
    sample_cli.main()
    assert (out / "gen_stats_0.pkl").exists()
    assert (out / "merged.flag").exists()


def test_sample_cli_multi_job_merge(checkpoints, monkeypatch):
    """Two sharded jobs write per-job stats; the last one merges and appends
    one fvd_report row covering both (reference sample.py:459-517)."""
    import sample as sample_cli

    tok_dir, ar_dir, root = checkpoints
    out = root / "mj" / "multi"
    for start in (0, 2):
        monkeypatch.setattr(sys, "argv", [
            "sample.py",
            "--ar_model", str(ar_dir), "--tokenizer", str(tok_dir),
            "--csv_file", "null128", "--frame_num", "8", "--input_size", "32",
            "--batch_size", "2", "--num_samples", "2", "--num_jobs", "2",
            "--starting_index", str(start), "--top_k", "8",
            "--dtype", "float32", "--output_dir", str(out),
        ])
        sample_cli.main()
    assert len(list(out.glob("gen_stats_*.pkl"))) == 2
    with open(out.parent / "fvd_report.csv") as f:
        rows = list(csv.reader(f))
    assert len(rows) == 2  # header + ONE merged row (first job only waits)
    assert rows[1][7] == "4"  # num_samples column: 2 jobs x 2 merged
