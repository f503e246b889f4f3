#!/usr/bin/env python3
"""COCO merge-decode stage (CLI parity with reference
`egs/coco/local/segment.py`), including the **oracle mode** end-to-end
fixture (reference :42-45,99-100,151-153): decode ground-truth class/offset
maps and check the decoder reproduces the annotated instances.  The default
object_merge_factor is 1/num_offsets (reference :155-156)."""

import argparse
import os
import pickle
import random

import numpy as np

from mergenet_tpu.utils.visualization import visualize_mask
from mergenet_tpu.data import COCODataset, DataLoader
from mergenet_tpu.data import rle as maskUtils
from mergenet_tpu.utils import generate_offsets
from mergenet_tpu.decoder import ObjectSegmenter, SegmenterOptions

parser = argparse.ArgumentParser(description="coco segmentation")
parser.add_argument("--dir", type=str, required=True)
parser.add_argument("--mode", type=str, default="val",
                    choices=["val", "oracle"])
parser.add_argument("--class-dir", type=str, default=None)
parser.add_argument("--offset-dir", type=str, default=None)
parser.add_argument("--img", type=str, default="data/val2017")
parser.add_argument("--ann", type=str,
                    default="data/annotations/instances_val2017.json")
parser.add_argument("--segment", type=str, default="segment")
parser.add_argument("--num-classes", default=81, type=int)
parser.add_argument("--num-offsets", default=10, type=int)
parser.add_argument("--scale", default=2, type=int)
parser.add_argument("--limits", default=None, type=int)
parser.add_argument("--object-merge-factor", type=float, default=None)
parser.add_argument("--same-different-bias", type=float, default=0.0)
parser.add_argument("--merge-logprob-bias", type=float, default=0.0)
parser.add_argument("--prune-threshold", type=float, default=200.0)
parser.add_argument("--decoder", type=str, default="python",
                    choices=["device", "device-exact", "cpp", "python"])
parser.add_argument("--job", type=int, default=0)
parser.add_argument("--num-jobs", type=int, default=1)
parser.add_argument("--visualize", action="store_true")
random.seed(0)
np.random.seed(0)


def main():
    global args
    args = parser.parse_args()
    num_classes = args.num_classes
    offset_list = generate_offsets(80 / args.scale, args.num_offsets)
    print("offsets are: {}".format(offset_list))
    if args.object_merge_factor is None:
        args.object_merge_factor = 1.0 / len(offset_list)

    dataset = COCODataset(args.img, args.ann, num_classes, offset_list,
                          scale=args.scale, mode=args.mode,
                          limits=args.limits, job=args.job,
                          num_jobs=args.num_jobs)
    dataloader = DataLoader(dataset, batch_size=1)
    segment_dir = os.path.join(args.dir, args.segment)
    segment(dataloader, segment_dir, num_classes, offset_list,
            dataset.catIds)


def _decode(class_mask, bound_mask, num_classes, offset_list):
    if args.decoder in ("device", "device-exact"):
        from mergenet_tpu.decoder.device import run_segmentation_device
        return run_segmentation_device(
            class_mask, bound_mask, num_classes, offset_list,
            same_different_bias=args.same_different_bias,
            object_merge_factor=args.object_merge_factor,
            merge_logprob_bias=args.merge_logprob_bias,
            do_prune=True, prune_threshold=args.prune_threshold,
            mode="hier" if args.decoder == "device" else "exact")
    if args.decoder == "cpp":
        from mergenet_tpu.decoder import csegment
        return csegment.run_segmentation(
            class_mask, bound_mask, num_classes, offset_list,
            args.same_different_bias, args.object_merge_factor,
            args.merge_logprob_bias, do_prune=True,
            prune_threshold=args.prune_threshold)
    opts = SegmenterOptions(
        same_different_bias=args.same_different_bias,
        object_merge_factor=args.object_merge_factor,
        merge_logprob_bias=args.merge_logprob_bias,
        den_mode="product", remerge_mode="ge",
        prune_threshold=args.prune_threshold)
    seg = ObjectSegmenter(class_mask, bound_mask, num_classes, offset_list,
                          opts)
    return seg.run_segmentation()


def segment(dataloader, segment_dir, num_classes, offset_list, catIds):
    import cv2
    img_dir = os.path.join(segment_dir, "img")
    pkl_dir = os.path.join(segment_dir, "pkl")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(pkl_dir, exist_ok=True)
    exist_ids = set(next(os.walk(pkl_dir))[2])

    for i, batch in enumerate(dataloader):
        if args.mode == "oracle":
            image_id, ori_img, size, target = batch
            image_id = int(image_id[0])
            target = np.asarray(target[0])  # (H, W, C+O)
            class_mask = np.moveaxis(target[..., :num_classes], -1, 0)
            bound_mask = np.moveaxis(target[..., num_classes:], -1, 0)
            img = ori_img[0]
        else:
            image_id, img, size = batch
            image_id = int(image_id[0])
            class_mask = np.load("{}/npy/{}.class.npy".format(
                args.class_dir, image_id))
            bound_mask = np.load("{}/npy/{}.offset.npy".format(
                args.offset_dir, image_id))
            img = img[0]
        if str(image_id) + ".pkl" in exist_ids:
            continue

        mask, object_class = _decode(class_mask, bound_mask, num_classes,
                                     offset_list)
        oh, ow = int(size[0][0]), int(size[0][1])
        if mask.shape != (oh, ow):
            mask = cv2.resize(mask.astype(np.int32), (ow, oh),
                              interpolation=cv2.INTER_NEAREST)
        if args.visualize:
            masked_img = visualize_mask(img, mask, transparency=0.3)
            cv2.imwrite("{}/{}.png".format(img_dir, image_id),
                        cv2.cvtColor(masked_img, cv2.COLOR_RGB2BGR))
        result = convert_to_coco_result(mask, object_class, image_id,
                                        catIds)
        with open("{}/{}.pkl".format(pkl_dir, image_id), "wb") as fh:
            pickle.dump(result, fh)


def convert_to_coco_result(mask, object_class, image_id, catIds):
    results = []
    for i in range(1, int(mask.max()) + 1):
        b_mask = (mask == i).astype("uint8")
        results.append({
            "image_id": image_id,
            "score": 1,
            "category_id": catIds[object_class[i - 1]],
            "segmentation": maskUtils.encode(np.asfortranarray(b_mask)),
        })
    return results


if __name__ == "__main__":
    main()
