#!/bin/bash
# Train the pspfpnet on Cityscapes crops (driver parity with reference
# egs/cityscape/local/run_pspfpnet_crop.sh).

train_image_size=768
epochs=400
dir=exp/crop/pspfpnet50_alpha20

. ./path.sh
. ../../utils/parse_options.sh

echo "$0: Training the network....."
python3 local/train.py \
        --epochs $epochs \
        --crop-size $train_image_size \
        --alpha 20 \
        --arch pspfpnet \
        --log-freq 100 \
        --pretrain \
        --tensorboard \
        --crop \
        $dir
