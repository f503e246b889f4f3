#!/usr/bin/env python3
"""Merge-decode stage (CLI parity with reference
`egs/cityscape/local/segment.py:22-64`): loads per-image class/offset npys,
resizes to seg_size, decodes instances, writes overlay pngs and COCO-result
pkls.  Decoder backends: 'device' (on-TPU parallel merge, default), 'cpp'
(native host greedy), 'python' (reference-faithful greedy).

Idempotent across --job/--num-jobs shards: images with an existing pkl are
skipped (reference segment.py:104-109)."""

import argparse
import os
import pickle
import random

import numpy as np

from mergenet_tpu.utils.visualization import visualize_mask
from mergenet_tpu.data import AllDataset, DataLoader
from mergenet_tpu.data import rle as maskUtils
from mergenet_tpu.utils import generate_offsets

parser = argparse.ArgumentParser(
    description="TPU cityscapes instance segmentation setup")
parser.add_argument("--dir", type=str, required=True)
parser.add_argument("--class-dir", type=str, required=True,
                    help="directory of class output numpy arrays")
parser.add_argument("--offset-dir", type=str, required=True,
                    help="directory of offset output numpy arrays")
parser.add_argument("--img", type=str, default="data/val")
parser.add_argument(
    "--ann", type=str,
    default="data/annotations/instancesonly_filtered_gtFine_val.json")
parser.add_argument("--segment", type=str, default="segment")
parser.add_argument("--num-classes", default=9, type=int)
parser.add_argument("--num-offsets", default=10, type=int)
parser.add_argument("--limits", default=None, type=int)
parser.add_argument("--seg-size", default=None, type=int, nargs=2,
                    help="decode at this (W, H); default 1024 512")
parser.add_argument("--object-merge-factor", type=float, default=None)
parser.add_argument("--same-different-bias", type=float, default=0.0)
parser.add_argument("--merge-logprob-bias", type=float, default=0.0)
parser.add_argument("--prune-threshold", type=float, default=0.0)
parser.add_argument("--decoder", type=str, default="device",
                    choices=["device", "device-exact", "cpp", "python"],
                    help="device = certified on-device hierarchical "
                         "decode (serving path); device-exact = "
                         "progressive exact aggregated Boruvka (parity "
                         "oracle on TPU); cpp/python = host greedy")
parser.add_argument("--job", type=int, default=0)
parser.add_argument("--num-jobs", type=int, default=1)
parser.add_argument("--visualize", action="store_true")
random.seed(0)
np.random.seed(0)


def main():
    global args
    args = parser.parse_args()
    num_classes = args.num_classes
    num_offsets = args.num_offsets

    offset_list = generate_offsets(40, num_offsets)
    print("offsets are: {}".format(offset_list))

    testset = AllDataset(args.img, args.ann, num_classes, offset_list,
                         mode="test", limits=args.limits,
                         job=args.job, num_jobs=args.num_jobs)
    print("Total samples in the dataset to be segmented: {0}".format(
        len(testset)))
    dataloader = DataLoader(testset, batch_size=1)
    catIds = testset.catIds
    segment_dir = os.path.join(args.dir, args.segment)
    seg_size = tuple(args.seg_size) if args.seg_size else (1024, 512)
    segment(dataloader, segment_dir, num_classes, offset_list, seg_size,
            catIds)


def _decode(class_mask, bound_mask, num_classes, offset_list):
    """Dispatch to the selected decoder backend; (C,H,W)/(O,H,W) in."""
    omf = args.object_merge_factor if args.object_merge_factor is not None \
        else 1.0  # reference segment.py:134-136 hardcodes 1
    mlb = args.merge_logprob_bias or 0.03
    if args.decoder in ("device", "device-exact"):
        from mergenet_tpu.decoder.device import run_segmentation_device
        return run_segmentation_device(
            class_mask, bound_mask, num_classes, offset_list,
            same_different_bias=args.same_different_bias,
            object_merge_factor=omf, merge_logprob_bias=mlb,
            mode="hier" if args.decoder == "device" else "exact")
    if args.decoder == "cpp":
        from mergenet_tpu.decoder import csegment
        return csegment.run_segmentation(
            class_mask, bound_mask, num_classes, offset_list,
            args.same_different_bias, omf, mlb)
    from mergenet_tpu.decoder import ObjectSegmenter, SegmenterOptions
    opts = SegmenterOptions(
        same_different_bias=args.same_different_bias,
        object_merge_factor=omf, merge_logprob_bias=mlb, do_prune=False)
    seg = ObjectSegmenter(class_mask, bound_mask, num_classes, offset_list,
                          opts)
    return seg.run_segmentation()


def segment(dataloader, segment_dir, num_classes, offset_list, seg_size,
            catIds):
    import cv2
    img_dir = os.path.join(segment_dir, "img")
    pkl_dir = os.path.join(segment_dir, "pkl")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(pkl_dir, exist_ok=True)
    exist_ids = set(next(os.walk(pkl_dir))[2])

    for i, (image_id, img, size) in enumerate(dataloader):
        image_id = int(image_id[0])
        if str(image_id) + ".pkl" in exist_ids:
            continue
        class_mask = np.load("{}/npy/{}.class.npy".format(
            args.class_dir, image_id))
        bound_mask = np.load("{}/npy/{}.offset.npy".format(
            args.offset_dir, image_id))
        if seg_size:
            class_mask = np.moveaxis(class_mask, 0, -1)
            bound_mask = np.moveaxis(bound_mask, 0, -1)
            class_mask = cv2.resize(class_mask, seg_size)
            bound_mask = cv2.resize(bound_mask, seg_size)
            class_mask = np.ascontiguousarray(
                np.moveaxis(class_mask, -1, 0))
            bound_mask = np.ascontiguousarray(
                np.moveaxis(bound_mask, -1, 0))

        mask, object_class = _decode(class_mask, bound_mask, num_classes,
                                     offset_list)

        if seg_size:
            oh, ow = int(size[0][0]), int(size[0][1])
            mask = cv2.resize(mask.astype(np.int32), (ow, oh),
                              interpolation=cv2.INTER_NEAREST)
        if args.visualize:
            masked_img = visualize_mask(img[0], mask, transparency=0.3)
            cv2.imwrite("{}/{}.png".format(img_dir, image_id),
                        cv2.cvtColor(masked_img, cv2.COLOR_RGB2BGR))

        result = convert_to_coco_result(mask, object_class, image_id,
                                        catIds)
        with open("{}/{}.pkl".format(pkl_dir, image_id), "wb") as fh:
            pickle.dump(result, fh)


def convert_to_coco_result(mask, object_class, image_id, catIds):
    """Instance mask -> list of COCO result dicts (RLE-encoded), reference
    segment.py:165-186."""
    results = []
    num_objects = int(mask.max())
    for i in range(1, num_objects + 1):
        b_mask = (mask == i).astype("uint8")
        class_id = object_class[i - 1]
        category_id = catIds[class_id]
        results.append({
            "image_id": image_id,
            "score": 1,
            "category_id": category_id,
            "segmentation": maskUtils.encode(np.asfortranarray(b_mask)),
        })
    return results


def convert_to_cityscapes_result(mask, object_class, image_id, result_dir,
                                 coco,
                                 labelID=[0, 24, 25, 26, 27, 28, 31, 32,
                                          33]):
    """Write one image's Cityscapes submission txt + per-instance pngs
    (reference segment.py:189-205)."""
    import cv2
    img_name = coco.loadImgs(image_id)[0]["file_name"].split(".")[0]
    txt_path = os.path.join(result_dir, img_name + ".txt")
    with open(txt_path, "w") as fh:
        num_objects = int(mask.max())
        for i in range(1, num_objects + 1):
            b_mask = (mask == i).astype("uint8") * 255
            b_mask_filename = "{}_{}.png".format(img_name, i)
            cv2.imwrite(os.path.join(result_dir, b_mask_filename), b_mask)
            label_id = labelID[object_class[i - 1]]
            fh.write("{} {} {}\n".format(b_mask_filename, label_id, 1.0))


if __name__ == "__main__":
    main()
