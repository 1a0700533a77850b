#!/usr/bin/env bash
# Extract the ILSVRC2012 train/val tarballs into the ImageFolder layout
# datasets/imagenet/{train,val}/<wnid>/*.JPEG expected by ImageNetDataset.
# (Reference: apps/vit/scripts/extract_imagenet.sh.)
#
# Usage: bash apps/vit/scripts/extract_imagenet.sh [datasets/imagenet]
set -eu
ROOT="${1:-datasets/imagenet}"

mkdir -p "${ROOT}/train" "${ROOT}/val"

# Train: outer tar contains one tar per class
if [ -f "${ROOT}/ILSVRC2012_img_train.tar" ]; then
  tar -xf "${ROOT}/ILSVRC2012_img_train.tar" -C "${ROOT}/train"
  for f in "${ROOT}"/train/*.tar; do
    d="${f%.tar}"
    mkdir -p "${d}"
    tar -xf "${f}" -C "${d}"
    rm -f "${f}"
  done
fi

# Val: flat tar + the standard devkit ground-truth reorganization script
if [ -f "${ROOT}/ILSVRC2012_img_val.tar" ]; then
  tar -xf "${ROOT}/ILSVRC2012_img_val.tar" -C "${ROOT}/val"
  echo "Val images extracted flat; sort into <wnid>/ subdirs with the usual"
  echo "valprep.sh (soumith/imagenetloader) before use."
fi
