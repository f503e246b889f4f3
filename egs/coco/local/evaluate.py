#!/usr/bin/env python3
"""COCO evaluation stage (parity with reference `egs/coco/local/evaluate.py`):
collect result pkls and score COCO-style mask AP."""

import argparse
import os
import pickle

from mergenet_tpu.data.coco import COCO
from mergenet_tpu.data.cocoeval import COCOeval
from mergenet_tpu.data import rle as maskUtils

parser = argparse.ArgumentParser(description="coco scoring")
parser.add_argument("--segment-dir", type=str, required=True)
parser.add_argument("--val-ann", type=str,
                    default="data/annotations/instances_val2017.json")
parser.add_argument("--imgid", type=int, default=None)


def main():
    args = parser.parse_args()
    coco = COCO(args.val_ann)
    pkl_dir = os.path.join(args.segment_dir, "pkl")
    results = []
    for fname in sorted(os.listdir(pkl_dir)):
        if not fname.endswith(".pkl"):
            continue
        if args.imgid is not None and fname != "{}.pkl".format(args.imgid):
            continue
        with open(os.path.join(pkl_dir, fname), "rb") as fh:
            for ann in pickle.load(fh):
                if maskUtils.area(ann["segmentation"]) == 0:
                    continue
                results.append(ann)
    print("Evaluating {} detections".format(len(results)))
    cocoDt = coco.loadRes(results)
    E = COCOeval(coco, cocoDt, "segm")
    if args.imgid is not None:
        E.params.imgIds = [args.imgid]
    E.evaluate()
    E.accumulate()
    E.summarize()


if __name__ == "__main__":
    main()
