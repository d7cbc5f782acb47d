"""Walk a video directory tree into the `id,path,action,label` CSV index.

Re-expresses `/root/reference/k600.py:5-46`: recursively finds video files,
uses the parent folder name as the action, writes the CSV format consumed by
VideoDataset (data/metadata/*.csv). Optionally derives integer labels from
the sorted set of actions instead of a constant.

Usage:
  python tools/make_video_csv.py /path/to/videos data/metadata/k600_train.csv \
      [--ext .mp4 .avi] [--derive-labels]
"""
from __future__ import annotations

import argparse
import csv
import os


def generate_csv(root_dir, output_file, exts=(".mp4", ".avi"), derive_labels=False):
    rows = []
    vid = 1
    for root, _, files in os.walk(root_dir):
        for f in sorted(files):
            if not f.lower().endswith(tuple(exts)):
                continue
            action = os.path.basename(root)
            rows.append([vid, os.path.join(root, f), action, 0])
            vid += 1
    if derive_labels:
        actions = sorted({r[2] for r in rows})
        a2l = {a: i for i, a in enumerate(actions)}
        for r in rows:
            r[3] = a2l[r[2]]
    os.makedirs(os.path.dirname(os.path.abspath(output_file)), exist_ok=True)
    with open(output_file, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "path", "action", "label"])
        w.writerows(rows)
    print(f"wrote {len(rows)} rows to {output_file}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("root_dir")
    ap.add_argument("output_csv")
    ap.add_argument("--ext", nargs="+", default=[".mp4", ".avi"])
    ap.add_argument("--derive-labels", action="store_true")
    a = ap.parse_args()
    generate_csv(a.root_dir, a.output_csv, tuple(a.ext), a.derive_labels)
