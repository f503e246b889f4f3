#!/bin/bash
# Staged inference pipeline: class_infer -> offset_infer -> segment ->
# evaluate -> submit (driver parity with reference infer_pspfpnet.sh).

stage=0
dir=exp/pspfpnet50
class_dir=exp/cls/pspfpnet50
offset_dir=exp/ofs/pspfpnet50
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
          --dir $class_dir \
          --model $class_model \
          --score || exit 1
fi

if [ $stage -le 1 ]; then
  echo "$0: Doing offset inference....."
  python3 local/offset_infer.py \
          --dir $offset_dir \
          --model $offset_model \
          --arch pspfpnet \
          --score || exit 1
fi

segdir=segment_512
mkdir -p $dir/$segdir/img $dir/$segdir/pkl $dir/$segdir/result

if [ $stage -le 2 ]; then
  echo "$0: Doing segmentation...."
  for job in $(seq 1 $num_jobs); do
    python3 local/segment.py \
            --dir $dir \
            --class-dir $class_dir \
            --offset-dir $offset_dir \
            --segment $segdir \
            --decoder $decoder \
            --job $job --num-jobs $num_jobs \
            --visualize || exit 1 &
  done
  wait
fi

if [ $stage -le 3 ]; then
  echo "$0: Doing evaluation..."
  python3 local/evaluate.py \
          --segment-dir $dir/$segdir || exit 1
fi

if [ $stage -le 4 ]; then
  echo "$0: Doing converting..."
  python3 local/submit.py \
          --segment-dir $dir/$segdir \
          --result-dir $dir/$segdir/result || exit 1
fi
