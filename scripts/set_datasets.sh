#!/bin/bash
# Symlink dataset roots into ./data (reference set_datasets.sh:8-12).
# Edit the source paths to your local dataset locations.

PROJECT_DIR=$(cd "$(dirname "$0")/.." && pwd)
cd "$PROJECT_DIR"
mkdir -p data

# UCF101
ln -sfn path/to/UCF101/videos ./data/ucf101

# Kinetics-600
ln -sfn path/to/kinetics600 ./data/k600
