"""Class-conditional / frame-prediction sampling CLI with FVD scoring.

Re-expresses `/root/reference/sample.py`: loads AR prior + tokenizer from
checkpoints, samples class-conditional videos (classes drawn from the eval
dataset's label stream, seeded subset split for multi-job sharding,
sample.py:136-139), decodes codes back to pixels, accumulates I3D
FeatureStats for generated and real clips, writes mp4s asynchronously, and
coordinates multiple jobs via FileLock flag files counting .pkl stat shards —
final FVD from merged stats appended to fvd_report.csv under lock
(sample.py:459-517).

The per-batch pipeline (AR sampling -> decode) is fully compiled: one jitted
prefill+scan program (generation.generate) plus one jitted decode.
"""
from __future__ import annotations

import argparse
import csv as _csv
import math
import os
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from filelock import FileLock

import video_tokenizer_tpu.models  # noqa: F401
import video_tokenizer_tpu.data  # noqa: F401
from video_tokenizer_tpu.generation import generate, speculative_generate
from video_tokenizer_tpu.metrics.fvd import FeatureStats, FVDCalculator
from video_tokenizer_tpu.registry import datasets
from video_tokenizer_tpu.utils.common import video_to_float
from video_tokenizer_tpu.utils.model_io import load_model_pretrained


def write_video_mp4(video_chw: np.ndarray, path: str, fps: int = 25):
    """video: [C, T, H, W] float in [0,1] -> mp4 (cv2)."""
    import cv2

    c, t, h, w = video_chw.shape
    vw = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    for i in range(t):
        frame = np.clip(video_chw[:, i].transpose(1, 2, 0) * 255, 0, 255).astype(
            np.uint8
        )
        vw.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    vw.release()


def _shard_batch(args, x):
    """Place a per-batch array over the serving mesh's data axis (leading
    dim), when --mesh_model/--mesh_data built one and the batch divides it;
    GSPMD then runs the whole sampling program data+tensor parallel."""
    mesh = getattr(args, "_mesh", None)
    if mesh is None or x.shape[0] % mesh.shape["data"]:
        return x
    from jax.sharding import NamedSharding, PartitionSpec

    spec = PartitionSpec("data", *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def sample_videos(args, ar_model, ar_params, tokenizer, tok_params,
                  draft=None):
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    video_dir = out_dir / "videos"
    if args.save_videos:
        video_dir.mkdir(exist_ok=True)

    dataset = datasets.make(
        {
            "name": "video_dataset",
            "args": {
                "root_path": args.root_path,
                "csv_file": args.csv_file,
                "frame_num": args.frame_num,
                "crop_size": args.input_size,
                "cls_vid_num": "-1_-1",
                "split": "test",
                "use_all_frames": args.use_all_frames,
            },
        }
    )
    # seeded subset for multi-job sharding (reference sample.py:136-139)
    rng = np.random.RandomState(args.split_seed)
    order = rng.permutation(len(dataset))
    end = (
        args.starting_index + args.num_samples
        if args.num_samples > 0
        else len(order)
    )
    my_indices = order[args.starting_index : min(end, len(order))]

    fvd = FVDCalculator(args.i3d_weights)
    gen_stats = FeatureStats(capture_mean_cov=True)
    real_stats = FeatureStats(capture_mean_cov=True)

    decode_fn = jax.jit(
        lambda p, seq: jnp.clip(
            tokenizer.apply(p, seq, method=tokenizer.decode_from_bottleneck
                            ).astype(jnp.float32), 0.0, 1.0)
    )
    # teacher-forced NLL of the sampled sequences (reference sample.py:177-184)
    nll_fn = jax.jit(
        lambda p, cond, seq: ar_model.apply(p, seq[:, :-1], cond, targets=seq)[1]
    )
    nlls = []

    executor = ThreadPoolExecutor(max_workers=4)
    futures = []
    key = jax.random.PRNGKey(args.seed)
    n_done = 0
    t_start = time.time()
    bs = args.batch_size
    for i in range(0, len(my_indices), bs):
        idx_chunk = my_indices[i : i + bs]
        # the ragged tail runs at its own (smaller) static shape — one
        # extra compile beats silently dropping up to bs-1 requested
        # samples (and an all-tail job would otherwise save EMPTY stats
        # that crash the multi-job merge)
        items = [dataset[j] for j in idx_chunk]
        labels = _shard_batch(
            args, jnp.asarray([it["label"] for it in items], jnp.int32)
        )
        reals = video_to_float(np.stack([it["gt"] for it in items]))

        key, sub = jax.random.split(key)
        kv_dtype = jnp.int8 if args.kv_dtype == "int8" else None
        if draft is not None:
            seq, spec_stats = speculative_generate(
                ar_model, {"params": ar_params}, draft[0],
                {"params": draft[1]}, labels, ar_model.max_seq_length, sub,
                gamma=args.gamma, cfg_scale=args.cfg_scale,
                temperature=args.temperature, top_k=args.top_k,
                top_p=args.top_p, cache_dtype=kv_dtype,
                draft_cache_dtype=kv_dtype, return_stats=True,
            )
            print(f"  speculative acceptance rate: "
                  f"{float(spec_stats['acceptance_rate']):.3f} "
                  f"({int(spec_stats['iterations'])} verify iterations)")
        else:
            seq = generate(
                ar_model, {"params": ar_params}, labels,
                ar_model.max_seq_length, sub,
                cfg_scale=args.cfg_scale, cfg_interval=args.cfg_interval,
                temperature=args.temperature, top_k=args.top_k,
                top_p=args.top_p, cache_dtype=kv_dtype,
            )
        nlls.append(float(nll_fn({"params": ar_params}, labels, seq)))
        videos = np.asarray(decode_fn({"params": tok_params}, seq))

        gen_stats = fvd.get_feature_stats_for_batch(jnp.asarray(videos), gen_stats)
        real_stats = fvd.get_feature_stats_for_batch(jnp.asarray(reals), real_stats)

        if args.save_videos:
            for b, j in enumerate(idx_chunk):
                path = str(video_dir / f"sample_{int(j):06d}_cls{int(labels[b])}.mp4")
                futures.append(executor.submit(write_video_mp4, videos[b], path))
        n_done += len(idx_chunk)
        sps = n_done / (time.time() - t_start)
        print(f"[{n_done}/{len(my_indices)}] Samples per second: {sps:.3f}")

    for f in futures:
        f.result()
    executor.shutdown()

    job_tag = f"{args.starting_index}"
    gen_stats.save(out_dir / f"gen_stats_{job_tag}.pkl")
    real_stats.save(out_dir / f"real_stats_{job_tag}.pkl")
    # completion flag written only after BOTH shards are durably saved —
    # the finalizer counts these, not the pkls, so it can never merge a
    # gen shard against a missing/partially-written real shard
    (out_dir / f"done_{job_tag}.flag").touch()
    if nlls:
        args.nll_sampled = float(np.mean(nlls))
        print(f"NLL of sampled sequences: {args.nll_sampled:.4f}")
    return gen_stats, real_stats, out_dir


def predict_frames(args, ar_model, ar_params, tokenizer, tok_params,
                   draft=None):
    """Frame-prediction sampling (reference sample.py:227-386): encode the
    first `num_cond_frames` frames (repeated to frame_num) + sep token as the
    prompt, generate the full-clip codes, decode, optionally resize."""
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    video_dir = out_dir / "videos"
    if args.save_videos:
        video_dir.mkdir(exist_ok=True)

    dataset = datasets.make(
        {
            "name": "video_dataset",
            "args": {
                "root_path": args.root_path,
                "csv_file": args.csv_file,
                "frame_num": args.frame_num,
                "crop_size": args.input_size,
                "cls_vid_num": "-1_-1",
                "split": "test",
                "use_all_frames": args.use_all_frames,
            },
        }
    )
    rng = np.random.RandomState(args.split_seed)
    order = rng.permutation(len(dataset))
    end = (
        args.starting_index + args.num_samples
        if args.num_samples > 0
        else len(order)
    )
    my_indices = order[args.starting_index : min(end, len(order))]

    fvd = FVDCalculator(args.i3d_weights)
    gen_stats = FeatureStats(capture_mean_cov=True)
    real_stats = FeatureStats(capture_mean_cov=True)

    from video_tokenizer_tpu.utils.common import repeat_to_m_frames

    encode_fn = jax.jit(
        lambda p, x: tokenizer.apply(
            p, x, method=tokenizer.encode
        )["bottleneck_rep"]
    )
    decode_fn = jax.jit(
        lambda p, seq: jnp.clip(
            tokenizer.apply(p, seq, method=tokenizer.decode_from_bottleneck
                            ).astype(jnp.float32), 0.0, 1.0)
    )

    def resize_video(v, res):
        B, C, T, H, W = v.shape
        if (H, W) == (res, res):
            return v
        return jax.image.resize(v, (B, C, T, res, res), method="bilinear")

    executor = ThreadPoolExecutor(max_workers=4)
    futures = []
    key = jax.random.PRNGKey(args.seed)
    bs = args.batch_size
    n_done = 0
    t_start = time.time()
    for i in range(0, len(my_indices), bs):
        idx_chunk = my_indices[i : i + bs]
        # ragged tail processed at its own static shape (see sample_videos)
        items = [dataset[j] for j in idx_chunk]
        reals = video_to_float(np.stack([it["gt"] for it in items]))
        x = _shard_batch(args, jnp.asarray(reals))
        x_cond = repeat_to_m_frames(
            x[:, :, : args.num_cond_frames], m=args.frame_num
        )
        c = encode_fn({"params": tok_params}, x_cond)
        sep = jnp.full((c.shape[0], 1), tokenizer.codebook_size, c.dtype)
        cond = jnp.concatenate([c, sep], axis=1)

        key, sub = jax.random.split(key)
        kv_dtype = jnp.int8 if args.kv_dtype == "int8" else None
        if draft is not None:
            seq, spec_stats = speculative_generate(
                ar_model, {"params": ar_params}, draft[0],
                {"params": draft[1]}, cond, ar_model.max_seq_length, sub,
                gamma=args.gamma, cfg_scale=1.0,
                temperature=args.temperature, top_k=args.top_k,
                top_p=args.top_p, cache_dtype=kv_dtype,
                draft_cache_dtype=kv_dtype, return_stats=True,
            )
            print(f"  speculative acceptance rate: "
                  f"{float(spec_stats['acceptance_rate']):.3f} "
                  f"({int(spec_stats['iterations'])} verify iterations)")
        else:
            seq = generate(
                ar_model, {"params": ar_params}, cond,
                ar_model.max_seq_length, sub,
                cfg_scale=1.0, temperature=args.temperature,
                top_k=args.top_k, top_p=args.top_p,
                cache_dtype=kv_dtype,
            )
        videos = np.asarray(
            resize_video(decode_fn({"params": tok_params}, seq), args.fp_resolution)
        )
        reals_rs = np.asarray(resize_video(jnp.asarray(reals), args.fp_resolution))
        gen_stats = fvd.get_feature_stats_for_batch(jnp.asarray(videos), gen_stats)
        real_stats = fvd.get_feature_stats_for_batch(jnp.asarray(reals_rs), real_stats)
        if args.save_videos:
            for b, j in enumerate(idx_chunk):
                path = str(video_dir / f"fp_{int(j):06d}.mp4")
                futures.append(executor.submit(write_video_mp4, videos[b], path))
        n_done += len(idx_chunk)
        print(f"[{n_done}/{len(my_indices)}] Samples per second: "
              f"{n_done / (time.time() - t_start):.3f}")

    for f in futures:
        f.result()
    executor.shutdown()
    gen_stats.save(out_dir / f"gen_stats_{args.starting_index}.pkl")
    real_stats.save(out_dir / f"real_stats_{args.starting_index}.pkl")
    (out_dir / f"done_{args.starting_index}.flag").touch()
    return gen_stats, real_stats, out_dir


def finalize_multi_job(args, out_dir: Path):
    """FileLock rendezvous: last job to finish merges all stats -> FVD."""
    lock = FileLock(str(out_dir / "rendezvous.lock"))
    n_jobs = max(args.num_jobs, 1)
    with lock:
        if (out_dir / "merged.flag").exists():
            print("already merged by another job; exiting")
            return None
        done_flags = list(out_dir.glob("done_*.flag"))
        if len(done_flags) < n_jobs:
            print(f"waiting: {len(done_flags)}/{n_jobs} jobs done; exiting")
            return None
        if len(done_flags) > n_jobs:
            print(
                f"WARNING: {len(done_flags)} job shards in {out_dir} but "
                f"num_jobs={n_jobs} — stale shards from a previous run "
                "will be folded into the FVD; use a fresh output_dir"
            )
        gen = None
        real = None
        for p in sorted(out_dir.glob("gen_stats_*.pkl")):
            s = FeatureStats.load(p)
            gen = s if gen is None else gen + s
        for p in sorted(out_dir.glob("real_stats_*.pkl")):
            s = FeatureStats.load(p)
            real = s if real is None else real + s
        fvd_calc = FVDCalculator(args.i3d_weights)
        fvd = fvd_calc.calculate_fvd(gen, real)
        print(f"FVD ({gen.num_items} gen / {real.num_items} real): {fvd:.4f}")

        report = out_dir.parent / "fvd_report.csv"
        with FileLock(str(report) + ".lock"):
            exists = report.exists()
            with open(report, "a", newline="") as f:
                w = _csv.writer(f)
                if not exists:
                    w.writerow(
                        ["time", "ar_model", "tokenizer", "cfg_scale", "top_k",
                         "top_p", "temperature", "num_samples", "nll_sampled",
                         "fvd"]
                    )
                nll = getattr(args, "nll_sampled", None)
                w.writerow(
                    [time.strftime("%Y-%m-%d %H:%M:%S"), args.ar_model,
                     args.tokenizer, args.cfg_scale, args.top_k, args.top_p,
                     args.temperature, gen.num_items,
                     f"{nll:.4f}" if nll is not None else "",
                     f"{fvd:.4f}"]
                )
        (out_dir / "merged.flag").touch()
        return fvd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ar_model", required=True, help="AR checkpoint dir")
    ap.add_argument("--ar_version", default="sd")
    ap.add_argument("--tokenizer", required=True, help="tokenizer checkpoint dir")
    ap.add_argument("--tokenizer_version", default="sd")
    ap.add_argument("--output_dir", default="save/samples")
    ap.add_argument("--root_path", default="data/metadata")
    # --dataset_csv/--dataset_split_seed/--sample_batch_size/--cs/--ns/--fp
    # are the reference CLI's spellings (reference sample.py:47-67), accepted
    # as aliases so its launch commands run unchanged
    ap.add_argument("--csv_file", "--dataset_csv", default="ucf101_val.csv")
    ap.add_argument("--frame_num", type=int, default=16)
    ap.add_argument("--input_size", type=int, default=128)
    ap.add_argument("--batch_size", "--sample_batch_size", type=int,
                    default=16)
    ap.add_argument("--cfg_scale", "--cs", type=float, default=1.25)
    ap.add_argument("--cfg_interval", type=int, default=-1)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--top_k", type=int, default=0)
    ap.add_argument("--top_p", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--split_seed", "--dataset_split_seed", type=int,
                    default=1234)
    ap.add_argument("--starting_index", type=int, default=0)
    ap.add_argument("--num_samples", "--ns", type=int, default=-1,
                    help="samples for THIS job (-1: all)")
    ap.add_argument("--num_jobs", type=int, default=1)
    ap.add_argument("--num_samples_total", type=int, default=None,
                    help="total samples across all parallel jobs; implies "
                         "num_jobs = ceil(total / num_samples) like the "
                         "reference (reference sample.py:400-402)")
    ap.add_argument("--use_all_frames", action="store_true")
    ap.add_argument("--frame_prediction", "--fp", action="store_true")
    ap.add_argument("--num_cond_frames", type=int, default=5)
    ap.add_argument("--fp_resolution", type=int, default=64)
    ap.add_argument("--save_videos", action="store_true")
    ap.add_argument("--stats_only", action="store_true",
                    help="compute FVD stats only, never write mp4s "
                         "(overrides --save_videos; reference sample.py:66)")
    ap.add_argument("--replace", action="store_true",
                    help="clear a previous run's rendezvous artifacts "
                         "(merged.flag, done flags, stats pkls) before "
                         "sampling (reference sample.py:461-466)")
    ap.add_argument("--i3d_weights", default=None)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32", "int8"],
                    help="AR-prior inference dtype. bf16 halves the weight + "
                         "KV-cache HBM traffic of the decode loop (the "
                         "sampling bottleneck on TPU); int8 additionally "
                         "quantizes every projection weight (symmetric "
                         "per-channel; bf16 activations/cache, fused dequant "
                         "in the matmul) for ~1.3x more tokens/s at a small "
                         "accuracy cost; logits/softmax/NLL math stays fp32 "
                         "either way.")
    ap.add_argument("--draft_model", default=None,
                    help="optional draft AR checkpoint dir for speculative "
                         "decoding: the draft proposes --gamma tokens per "
                         "iteration and ONE target-model chunk forward "
                         "verifies them (exact target sampling "
                         "distribution; generation/speculative.py). A "
                         "smaller zoo size (e.g. llama-abs-B drafting for "
                         "llama-abs-3B) multiplies decode throughput by "
                         "roughly the mean accepted length. Incompatible "
                         "with --cfg_interval >= 0.")
    ap.add_argument("--draft_version", default="sd")
    ap.add_argument("--self_draft_layers", type=int, default=0,
                    help="speculative decoding WITHOUT a separate draft "
                         "checkpoint: draft = the target's own first N "
                         "layers + shared embeddings/norm/head (early-exit "
                         "drafting). Exact target distribution either way; "
                         "a weak exit only lowers the acceptance rate. "
                         "Mutually exclusive with --draft_model.")
    ap.add_argument("--gamma", type=int, default=4,
                    help="draft tokens proposed per verification chunk")
    ap.add_argument("--mesh_model", type=int, default=1,
                    help="Megatron tensor-parallel degree for SERVING: "
                         "shards the AR prior (and draft) with the same "
                         "GSPMD specs the trainers use (parallel/tp.py), "
                         "and the tokenizer's ViT stacks for the decode "
                         "pass — serve zoo sizes that exceed one chip's "
                         "HBM (e.g. llama-abs-XXXL 3.9B). The reference "
                         "serves strictly single-GPU.")
    ap.add_argument("--mesh_data", type=int, default=0,
                    help="data-parallel mesh axis for serving; 0 = all "
                         "remaining devices (n_devices / mesh_model). "
                         "--batch_size must divide it.")
    ap.add_argument("--kv_dtype", default="auto", choices=["auto", "int8"],
                    help="KV-cache dtype for the decode loop. auto follows "
                         "the param dtype (bf16/fp32); int8 quantizes every "
                         "cache row symmetrically (per-row scale planes, "
                         "dequant inside the Pallas decode kernel) — halves "
                         "the cache HBM traffic for ~1.27x more tokens/s on "
                         "top of --dtype int8 at a small accuracy cost.")
    args = ap.parse_args()

    if args.stats_only:
        args.save_videos = False
    if args.num_samples_total is not None:
        if args.num_samples <= 0:
            raise SystemExit(
                "--num_samples_total needs a positive per-job --num_samples"
            )
        args.num_jobs = math.ceil(args.num_samples_total / args.num_samples)
    if args.replace:
        out_dir = Path(args.output_dir)
        stale = ["merged.flag", "rendezvous.lock", "done_*.flag",
                 "gen_stats_*.pkl", "real_stats_*.pkl"]
        for pat in stale:
            for p in out_dir.glob(pat):
                p.unlink()

    # local checkpoint dir or hub id (reference sample.py:404-415)
    ar_model, ar_params = load_model_pretrained(args.ar_model, args.ar_version)
    if args.dtype in ("bfloat16", "int8"):
        ar_params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16)
            if jnp.issubdtype(p.dtype, jnp.floating) else p,
            ar_params,
        )
    if args.dtype == "int8":
        import dataclasses as _dc
        from video_tokenizer_tpu.models.larp_ar import LARP_AR, quantize_params
        ar_model = LARP_AR(_dc.replace(ar_model.config, quantized=True))
        ar_params = quantize_params(ar_params)
    mesh = None
    if args.mesh_model > 1 or args.mesh_data > 1:
        from video_tokenizer_tpu.parallel import MeshConfig, create_mesh
        from video_tokenizer_tpu.parallel.tp import shard_params_tp

        n_dev = jax.device_count()
        data = args.mesh_data or max(1, n_dev // args.mesh_model)
        mesh = create_mesh(MeshConfig(data=data, model=args.mesh_model))
        # shard BEFORE self_draft so early-exit draft views inherit the
        # target's placement instead of re-materializing replicated copies
        ar_params = shard_params_tp(ar_params, mesh)
    args._mesh = mesh
    draft = None
    if args.self_draft_layers > 0:
        if args.draft_model is not None:
            raise SystemExit(
                "--self_draft_layers and --draft_model are mutually "
                "exclusive: pick early-exit drafting or an external draft."
            )
        if args.cfg_interval >= 0:
            raise SystemExit(
                "--self_draft_layers is incompatible with --cfg_interval "
                ">= 0 (speculative rows advance unevenly; no shared CFG "
                "cutoff index exists)."
            )
        from video_tokenizer_tpu.generation import self_draft
        draft = self_draft(ar_model, ar_params, args.self_draft_layers)
    if args.draft_model is not None:
        if args.cfg_interval >= 0:
            raise SystemExit(
                "--draft_model is incompatible with --cfg_interval >= 0: "
                "speculative rows advance unevenly, so a shared CFG cutoff "
                "index does not exist; drop one of the two flags."
            )
        draft_model, draft_params = load_model_pretrained(
            args.draft_model, args.draft_version
        )
        if args.dtype in ("bfloat16", "int8"):
            draft_params = jax.tree_util.tree_map(
                lambda p: p.astype(jnp.bfloat16)
                if jnp.issubdtype(p.dtype, jnp.floating) else p,
                draft_params,
            )
        if args.dtype == "int8":
            import dataclasses as _dc
            from video_tokenizer_tpu.models.larp_ar import (
                LARP_AR, quantize_params,
            )
            draft_model = LARP_AR(
                _dc.replace(draft_model.config, quantized=True)
            )
            draft_params = quantize_params(draft_params)
        if bool(draft_model.frame_prediction) != bool(ar_model.frame_prediction):
            raise SystemExit(
                "--draft_model frame_prediction="
                f"{bool(draft_model.frame_prediction)} does not match the "
                f"target's {bool(ar_model.frame_prediction)}"
            )
        if mesh is not None:
            from video_tokenizer_tpu.parallel.tp import shard_params_tp

            draft_params = shard_params_tp(draft_params, mesh)
        draft = (draft_model, draft_params)
    tokenizer, tok_params = load_model_pretrained(
        args.tokenizer, args.tokenizer_version
    )
    if mesh is not None:
        from video_tokenizer_tpu.parallel.tp import shard_params_tp_vit

        tok_params = shard_params_tp_vit(tok_params, mesh)
    if args.frame_prediction != bool(ar_model.frame_prediction):
        raise SystemExit(
            f"--frame_prediction={args.frame_prediction} but the AR "
            f"checkpoint was trained with frame_prediction="
            f"{bool(ar_model.frame_prediction)} — a class-conditional model "
            "cannot consume frame tokens (and vice versa); use the matching "
            "sampling mode or checkpoint."
        )
    if args.frame_prediction:
        args.cfg_scale = 1.0  # predict_frames hardcodes it; report truthfully
        _, _, out_dir = predict_frames(
            args, ar_model, ar_params, tokenizer, tok_params, draft=draft
        )
    else:
        _, _, out_dir = sample_videos(
            args, ar_model, ar_params, tokenizer, tok_params, draft=draft
        )
    finalize_multi_job(args, out_dir)


if __name__ == "__main__":
    main()
