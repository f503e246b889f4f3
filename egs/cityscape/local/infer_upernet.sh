#!/bin/bash
# UperNet inference pipeline (driver parity with reference
# egs/cityscape/local/infer_upernet.sh): same stages as infer_pspfpnet.sh
# with the upernet arch.

stage=0
dir=exp/upernet50
class_dir=exp/cls/upernet50
offset_dir=exp/ofs/upernet50
class_model=$class_dir/model_best
offset_model=$offset_dir/model_best
decoder=device
num_jobs=1

. ./path.sh
. ../../utils/parse_options.sh

mkdir -p $dir

if [ $stage -le 0 ]; then
  echo "$0: Doing class inference....."
  python3 local/class_infer.py \
          --dir $class_dir --model $class_model \
          --arch upernet --score || exit 1
fi

if [ $stage -le 1 ]; then
  echo "$0: Doing offset inference....."
  python3 local/offset_infer.py \
          --dir $offset_dir --model $offset_model \
          --arch upernet --score || exit 1
fi

segdir=segment_512
mkdir -p $dir/$segdir/img $dir/$segdir/pkl $dir/$segdir/result

if [ $stage -le 2 ]; then
  echo "$0: Doing segmentation...."
  python3 local/segment.py \
          --dir $dir --class-dir $class_dir --offset-dir $offset_dir \
          --segment $segdir --decoder $decoder --visualize || exit 1
fi

if [ $stage -le 3 ]; then
  echo "$0: Doing evaluation..."
  python3 local/evaluate.py --segment-dir $dir/$segdir || exit 1
fi
