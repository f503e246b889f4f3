#!/usr/bin/env python3
"""Generate a synthetic street-like instance-segmentation dataset in COCO
format — lets the full pipeline (train -> infer -> decode -> evaluate) run
end-to-end in environments without the Cityscapes download.

Scenes: textured background + colored rectangles/ellipses per class with
occlusion, color jitter, and noise; class identity is color-coded so the
task is learnable but not trivial."""

import argparse
import json
import os

import numpy as np

from mergenet_tpu.data import rle as maskUtils

# per-class base colors (RGB), class ids 1..8
CLASS_COLORS = [
    (200, 60, 60), (60, 200, 60), (60, 60, 200), (200, 200, 60),
    (200, 60, 200), (60, 200, 200), (230, 140, 40), (140, 90, 40),
]


def class_color(cls, num_classes):
    """Base RGB for class id `cls` (1..num_classes-1).  The hand-picked
    table covers the default 8 instance classes; beyond it (e.g. the
    Cityscapes-like 19-class stress config) colors come from a
    deterministic HSV wheel so every class stays visually distinct."""
    if cls - 1 < len(CLASS_COLORS):
        return np.array(CLASS_COLORS[cls - 1], np.float32)
    import colorsys
    k = cls - 1 - len(CLASS_COLORS)
    n_extra = max(1, num_classes - 1 - len(CLASS_COLORS))
    h = (k / n_extra + 0.07) % 1.0
    v = 0.55 + 0.35 * ((k % 3) / 2.0)
    r, g, b = colorsys.hsv_to_rgb(h, 0.85, v)
    return np.array([r * 255, g * 255, b * 255], np.float32)


def make_scene(rng, H, W, num_classes, max_objects):
    img = np.zeros((H, W, 3), np.float32)
    # background: smooth gradient + texture
    gy = np.linspace(0, 1, H)[:, None]
    gx = np.linspace(0, 1, W)[None, :]
    img[..., 0] = 40 + 30 * gy
    img[..., 1] = 40 + 30 * gx
    img[..., 2] = 50 + 20 * gy * gx
    img += rng.normal(0, 6, img.shape)

    inst = np.zeros((H, W), np.int32)
    anns = []
    n_obj = rng.randint(3, max_objects + 1)
    k = 1
    for _ in range(n_obj):
        cls = rng.randint(1, num_classes)
        color = class_color(cls, num_classes) + rng.normal(0, 12, 3)
        h = rng.randint(H // 8, H // 2)
        w = rng.randint(W // 10, W // 3)
        y = rng.randint(0, H - h)
        x = rng.randint(0, W - w)
        m = np.zeros((H, W), np.uint8)
        if rng.rand() < 0.5:
            m[y:y + h, x:x + w] = 1
        else:
            yy, xx = np.ogrid[:H, :W]
            cy, cx = y + h // 2, x + w // 2
            m[((yy - cy) / (h / 2)) ** 2 +
              ((xx - cx) / (w / 2)) ** 2 <= 1.0] = 1
        visible = m & (inst == 0).astype(np.uint8) if False else m
        # later objects occlude earlier ones
        inst[m > 0] = k
        img[m > 0] = color + rng.normal(0, 5, img[m > 0].shape)
        k += 1
        anns.append((cls, k - 1))

    # rebuild per-instance visible masks after occlusion
    out_anns = []
    for cls, inst_id in anns:
        m = (inst == inst_id).astype(np.uint8)
        if m.sum() < 16:  # fully occluded
            continue
        out_anns.append((cls, m))
    img = np.clip(img + rng.normal(0, 4, img.shape), 0, 255)
    return img.astype(np.uint8), out_anns


def write_split(out_dir, split, n_images, H, W, num_classes, max_objects,
                seed):
    import cv2
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(out_dir, split)
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        img, anns = make_scene(rng, H, W, num_classes, max_objects)
        fname = "{}_{:05d}.png".format(split, i)
        cv2.imwrite(os.path.join(img_dir, fname),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        img_id = i
        images.append({"id": img_id, "file_name": fname,
                       "height": H, "width": W})
        for cls, m in anns:
            r = maskUtils.encode(np.asfortranarray(m))
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": cls,
                "segmentation": {"size": r["size"],
                                 "counts": r["counts"].decode("ascii")},
                "area": int(m.sum()), "iscrowd": 0,
                "bbox": [0, 0, 1, 1]})
            ann_id += 1
    cats = [{"id": c, "name": "class{}".format(c)}
            for c in range(1, num_classes)]
    ann_dir = os.path.join(out_dir, "annotations")
    os.makedirs(ann_dir, exist_ok=True)
    with open(os.path.join(
            ann_dir, "instancesonly_{}.json".format(split)), "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": cats}, f)
    print("{}: {} images, {} annotations".format(
        split, len(images), len(annotations)))


if __name__ == "__main__":
    p = argparse.ArgumentParser(description="synthetic dataset generator")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--train-images", type=int, default=60)
    p.add_argument("--val-images", type=int, default=12)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--num-classes", type=int, default=9,
                   help="incl. background")
    p.add_argument("--max-objects", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    write_split(a.out_dir, "train", a.train_images, a.height, a.width,
                a.num_classes, a.max_objects, a.seed)
    write_split(a.out_dir, "val", a.val_images, a.height, a.width,
                a.num_classes, a.max_objects, a.seed + 1)
