"""Convert HF-style parquet image shards to an ImageFolder layout.

Re-expresses `/root/reference/imagenetconvert.py:23-40`: streams parquet
batches (low memory), writes images into train/val/test class folders.
Requires pyarrow + PIL (both commonly available; gated import).

Usage: python tools/parquet_to_imagefolder.py <parquet_dir> <output_dir>
"""
from __future__ import annotations

import io
import os
import sys


def extract_image_bytes(img_data):
    if isinstance(img_data, bytes):
        return img_data
    if isinstance(img_data, dict):
        for k in ("bytes", "data"):
            if k in img_data:
                return img_data[k]
    if hasattr(img_data, "bytes"):
        return img_data.bytes
    raise ValueError(f"unrecognized image payload: {type(img_data)}")


def parquet_to_folders(parquet_dir, output_dir):
    import pyarrow.parquet as pq
    from PIL import Image

    for split in ("train", "val", "test"):
        os.makedirs(os.path.join(output_dir, split), exist_ok=True)

    files = sorted(f for f in os.listdir(parquet_dir) if f.endswith(".parquet"))
    n = 0
    for file in files:
        subset = "train" if "train" in file else ("val" if "val" in file else "test")
        pf = pq.ParquetFile(os.path.join(parquet_dir, file))
        for batch in pf.iter_batches(batch_size=1000):
            df = batch.to_pandas()
            for _, row in df.iterrows():
                label = str(row.get("label", "unknown"))
                cls_dir = os.path.join(output_dir, subset, label)
                os.makedirs(cls_dir, exist_ok=True)
                img = Image.open(io.BytesIO(extract_image_bytes(row["image"])))
                img.convert("RGB").save(os.path.join(cls_dir, f"{n:09d}.jpg"))
                n += 1
    print(f"wrote {n} images to {output_dir}")


if __name__ == "__main__":
    parquet_to_folders(sys.argv[1], sys.argv[2])
