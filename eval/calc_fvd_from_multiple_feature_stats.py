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
    ap.add_argument("--gen_stats", nargs="+", required=True)
    ap.add_argument("--real_stats", nargs="+", required=True)
    args = ap.parse_args()

    gen = merge_stats(args.gen_stats)
    real = merge_stats(args.real_stats)
    mu_g, cov_g = gen.get_mean_cov()
    mu_r, cov_r = real.get_mean_cov()
    fvd = frechet_distance(mu_g, cov_g, mu_r, cov_r)
    print(f"num_gen: {gen.num_items}, num_real: {real.num_items}")
    print(f"FVD: {fvd:.4f}")


if __name__ == "__main__":
    main()
