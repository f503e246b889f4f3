#!/usr/bin/env python3
"""Evaluation stage (CLI parity with reference
`egs/cityscape/local/evaluate.py:23-73`): collect per-image result pkls,
drop zero-area RLEs, run COCO-style mask AP; optional class subsetting via
a subclass file and single-image debugging via --imgid."""

import argparse
import os
import pickle

from mergenet_tpu.data.coco import COCO
from mergenet_tpu.data.cocoeval import COCOeval
from mergenet_tpu.data import rle as maskUtils

parser = argparse.ArgumentParser(description="scoring script")
parser.add_argument("--segment-dir", type=str, required=True,
                    help="directory holding the pkl/ subdir of results")
parser.add_argument(
    "--val-ann", type=str,
    default="data/annotations/instancesonly_filtered_gtFine_val.json")
parser.add_argument("--class-subset", type=str, default=None,
                    help="text file of class names to restrict scoring to")
parser.add_argument("--imgid", type=int, default=None,
                    help="evaluate a single image id")


def main():
    args = parser.parse_args()
    coco = COCO(args.val_ann)
    catIds = None
    if args.class_subset and os.path.exists(args.class_subset):
        with open(args.class_subset) as f:
            class_nms = [line.strip() for line in f if line.strip()]
        catIds = coco.getCatIds(catNms=class_nms)
        print("Evaluating on a subset: {}".format(class_nms))
    evaluate(coco, args.segment_dir, catIds, args.imgid)


def evaluate(coco, segment_dir, catIds=None, imgid=None):
    pkl_dir = os.path.join(segment_dir, "pkl")
    results = []
    for fname in sorted(os.listdir(pkl_dir)):
        if not fname.endswith(".pkl"):
            continue
        if imgid is not None and fname != "{}.pkl".format(imgid):
            continue
        with open(os.path.join(pkl_dir, fname), "rb") as fh:
            result = pickle.load(fh)
        for ann in result:
            # drop empty segments (reference evaluate.py:51-54)
            if maskUtils.area(ann["segmentation"]) == 0:
                continue
            results.append(ann)
    print("Evaluating {} detections".format(len(results)))
    cocoDt = coco.loadRes(results)
    E = COCOeval(coco, cocoDt, "segm")
    if catIds:
        E.params.catIds = catIds
    if imgid is not None:
        E.params.imgIds = [imgid]
    E.evaluate()
    E.accumulate()
    E.summarize()
    return E.stats


if __name__ == "__main__":
    main()
