#!/bin/bash
# Train pspfpnet on COCO crops (driver parity with reference
# egs/coco/local/run_pspfpnet_crop.sh).

train_image_size=384
epochs=400
dir=exp/crop/pspfpnet50

. ./path.sh
. ../../utils/parse_options.sh

echo "$0: Training the network....."
python3 local/train.py \
        --epochs $epochs \
        --crop-size $train_image_size \
        --scale 2 \
        --arch pspfpnet \
        --log-freq 100 \
        --pretrain \
        --tensorboard \
        $dir
