#!/bin/bash
# Download/link COCO-2017 (driver parity with reference prepare_data.sh).
# Expects train2017/, val2017/ and annotations/ under $download_dir.

download_dir=data/coco_download
out_dir=data

. ./path.sh
. ../../utils/parse_options.sh

mkdir -p $out_dir
for d in train2017 val2017 annotations; do
  if [ -d "$download_dir/$d" ] && [ ! -e "$out_dir/$d" ]; then
    ln -sf "$(realpath $download_dir/$d)" "$out_dir/$d"
  fi
done
echo "$0: Done."
