#!/usr/bin/env python3
"""Class-head inference stage (CLI parity with reference
`egs/cityscape/local/class_infer.py`): loads a checkpoint, runs the class
head over the val/test set, writes `<id>.class.npy` probability maps."""

import argparse

import jax
import jax.numpy as jnp

from mergenet_tpu.models import get_model, init_model, tile_predict
from mergenet_tpu.data import ClassDataset, AllDataset, DataLoader
from mergenet_tpu.parallel import make_optimizer, create_train_state
from mergenet_tpu.utils.checkpoint import load_checkpoint
from mergenet_tpu.utils.inference_utils import class_inference
from mergenet_tpu.utils import generate_offsets

parser = argparse.ArgumentParser(description="cityscape class inference")
parser.add_argument("--dir", type=str, required=True,
                    help="experiment directory (output npys go to dir/npy)")
parser.add_argument("--model", type=str, required=True,
                    help="checkpoint directory to load")
parser.add_argument("--img", type=str, default="data/val")
parser.add_argument(
    "--ann", type=str,
    default="data/annotations/instancesonly_filtered_gtFine_val.json")
parser.add_argument("--arch", default="pspfpnet", type=str)
parser.add_argument("--num-classes", default=9, type=int)
parser.add_argument("--batch-size", default=1, type=int)
parser.add_argument("--scale", default=1, type=int)
parser.add_argument("--limits", default=None, type=int)
parser.add_argument("--score", action="store_true")
parser.add_argument("--bf16", action="store_true",
                    help="bf16 net compute (float32 probs out)")
parser.add_argument("--caffe", action="store_true",
                    help="caffe-style preprocessing + tiled prediction")
parser.add_argument("--tile-size", default=None, type=int, nargs=2,
                    help="tile window (sx, sy) for tiled prediction")
parser.add_argument("--caffe-weights", default=None, type=str,
                    help="npz from convert_caffe_to_pytorch.py (released "
                         "PSPNet caffemodel); loads instead of --model "
                         "when arch=pspnet")
parser.add_argument("--job", type=int, default=0)
parser.add_argument("--num-jobs", type=int, default=1)


def main():
    args = parser.parse_args()
    num_classes = args.num_classes

    model = get_model(num_classes, 0, args.arch,
                      dtype=jnp.bfloat16 if args.bf16 else None)
    tx = make_optimizer()
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               (1, 128, 128, 3))
    if args.caffe_weights:
        # released-caffemodel inference path (reference
        # class_infer.py:38-39 used pspnet(version=...) + caffemodel)
        import numpy as np
        from mergenet_tpu.utils.weight_import import apply_caffe_weights
        npz = np.load(args.caffe_weights)
        params, batch_stats, _ = apply_caffe_weights(
            state.params, state.batch_stats, npz,
            layer=101 if args.arch == "pspnet" else 50)
        state = state.replace(params=params, batch_stats=batch_stats)
    else:
        state, meta = load_checkpoint(args.model, state)

    dataset = ClassDataset(args.img, args.ann, scale=args.scale,
                           caffe=args.caffe, mode="val",
                           limits=args.limits, job=args.job,
                           num_jobs=args.num_jobs)
    dataloader = DataLoader(dataset, batch_size=args.batch_size)

    tile_fn = None
    if args.tile_size:
        def apply_fn(x):
            return state.apply_fn(
                {"params": state.params, "batch_stats": state.batch_stats},
                x, train=False)

        def tile_fn(img):
            return tile_predict(apply_fn, img, num_classes,
                                tuple(args.tile_size))

    class_inference(dataloader, args.dir, state, num_classes,
                    args.batch_size, score=args.score,
                    class_nms=dataset.catNms, tile_predict_fn=tile_fn)


if __name__ == "__main__":
    main()
