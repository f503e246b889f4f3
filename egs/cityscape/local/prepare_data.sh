#!/bin/bash
# Prepare Cityscapes data: expects the leftImg8bit + gtFine downloads,
# converts polygon annotations to COCO json and symlinks images
# (driver parity with reference prepare_data.sh).

dataset_dir=data/cityscapes_download
out_dir=data

. ./path.sh
. ../../utils/parse_options.sh

mkdir -p $out_dir/annotations

echo "$0: Converting Cityscapes annotations to COCO format..."
python3 local/convert_cityscapes_to_coco.py \
        --dataset-dir $dataset_dir \
        --out-dir $out_dir/annotations || exit 1

echo "$0: Linking image directories..."
for split in train val test; do
  mkdir -p $out_dir/$split
  src=$dataset_dir/leftImg8bit_trainvaltest/leftImg8bit/$split
  if [ -d "$src" ]; then
    find $src -name '*_leftImg8bit.png' | while read f; do
      ln -sf "$(realpath $f)" $out_dir/$split/
    done
  fi
done
echo "$0: Done."
