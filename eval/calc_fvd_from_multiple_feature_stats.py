"""Merge FeatureStats .pkl shards from multiple sampling jobs into one FVD.

Re-expresses `/root/reference/eval/calc_fvd_from_multiple_feature_stats.py:18-46`.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from video_tokenizer_tpu.metrics.fvd import FeatureStats, frechet_distance


def merge_stats(paths):
    stats = [FeatureStats.load(p) for p in paths]
    merged = stats[0]
    for s in stats[1:]:
        merged = merged + s
    return merged


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen_stats", nargs="+", default=None)
    ap.add_argument("--real_stats", nargs="+", default=None)
    ap.add_argument("--feature_stats_dir", default=None,
                    help="directory of per-job shards, reference-CLI style "
                         "(reference calc_fvd...py:15): picks up both "
                         "sample.py's gen_stats_*/real_stats_* names and the "
                         "reference's generated_fvd_stats_*/gt_fvd_stats_*")
    args = ap.parse_args()

    if args.feature_stats_dir is not None:
        d = Path(args.feature_stats_dir)
        args.gen_stats = sorted(d.glob("gen_stats_*.pkl")) or sorted(
            d.glob("generated_fvd_stats_*.pkl"))
        args.real_stats = sorted(d.glob("real_stats_*.pkl")) or sorted(
            d.glob("gt_fvd_stats_*.pkl"))
    if not args.gen_stats or not args.real_stats:
        ap.error("pass --gen_stats/--real_stats or a --feature_stats_dir "
                 "containing per-job shards")

    gen = merge_stats(args.gen_stats)
    real = merge_stats(args.real_stats)
    mu_g, cov_g = gen.get_mean_cov()
    mu_r, cov_r = real.get_mean_cov()
    fvd = frechet_distance(mu_g, cov_g, mu_r, cov_r)
    print(f"num_gen: {gen.num_items}, num_real: {real.num_items}")
    print(f"FVD: {fvd:.4f}")


if __name__ == "__main__":
    main()
