#!/usr/bin/env bash
# Prepare the SBD-augmented PASCAL VOC 2012 benchmark dataset.
#
# Re-design of the reference tooling (reference:
# task/sseg/dataset/PascalVOC/prepare.sh:1-66): download VOC2012 + the SBD
# augmentation labels, verify checksums, merge SBD labels into
# SegmentationClassAug/, and build ImageSets/Segmentation/train_aug.txt.
#
# Usage:  bash prepare.sh [target_dir]    (default: ./VOCdevkit)

set -euo pipefail

SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
TARGET=${1:-./VOCdevkit}
mkdir -p "$TARGET"
cd "$(dirname "$TARGET")"

VOC_URL="http://host.robots.ox.ac.uk/pascal/VOC/voc2012/VOCtrainval_11-May-2012.tar"
VOC_SHA256="e14f763270cf193d0b5f74b169f44157a4b0c6efa708f4dd0ff78ee691763bcb"
# SBD-converted VOC-style label archive used by the semi-supervised
# segmentation community (same as the reference's SegmentationClassAug)
AUG_URL="https://www.dropbox.com/s/oeu149j8qtbs1x0/SegmentationClassAug.zip"

download_and_check() {
    local url=$1 out=$2 sha=$3
    if [ ! -f "$out" ]; then
        echo "downloading $url"
        wget -q --show-progress -O "$out" "$url"
    fi
    if [ -n "$sha" ]; then
        echo "$sha  $out" | sha256sum -c - || {
            echo "checksum mismatch for $out"; exit 1; }
    fi
}

download_and_check "$VOC_URL" VOCtrainval_11-May-2012.tar "$VOC_SHA256"
tar -xf VOCtrainval_11-May-2012.tar

download_and_check "$AUG_URL" SegmentationClassAug.zip ""
unzip -qo SegmentationClassAug.zip -d VOCdevkit/VOC2012/

# build train_aug.txt = names with an aug label that are not in val.txt
python3 "$SCRIPT_DIR/tool/list_augtrain_samples.py" \
    VOCdevkit/VOC2012

# The labeled-subset prefix files the scripts/ configs point at
# (sublabeled_prefix/{1-16,1-8,1-4,1-2}/{0,1,2}.txt) are VENDORED —
# byte-identical to the upstream PixelSSL benchmark splits (reference:
# task/sseg/dataset/PascalVOC/sublabeled_prefix/), so mIoU numbers are
# comparable to the published tables. Only if they are missing, fall back
# to regenerating statistically-equivalent splits (deterministic seed).
if [ ! -f "$SCRIPT_DIR/sublabeled_prefix/1-8/0.txt" ]; then
    echo "vendored splits missing — regenerating (NOT benchmark-comparable)"
    python3 "$SCRIPT_DIR/tool/random_sublabeled_samples.py" \
        VOCdevkit/VOC2012 "$SCRIPT_DIR/sublabeled_prefix" --seed 0
fi

echo "done: VOCdevkit/VOC2012 ready"
