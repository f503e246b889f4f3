#!/usr/bin/env python3
"""Convert a caffe .caffemodel into a framework-loadable weight archive.

Capability parity with reference
`egs/cityscape/local/convert_caffe_to_pytorch.py:22-34` (which wrapped
`pspnet_caffe.load_pretrained_model` + torch.save): here the caffemodel is
parsed directly from the protobuf wire format (no caffe dependency,
`mergenet_tpu.utils.caffe_import`) and written as an .npz of named arrays
with conv kernels in HWIO layout."""

import argparse

from mergenet_tpu.utils.caffe_import import caffemodel_to_npz

parser = argparse.ArgumentParser(
    description="caffemodel -> npz weight converter")
parser.add_argument("--caffe-model", type=str, required=True)
parser.add_argument("--out", type=str, required=True,
                    help="output .npz path")


def main():
    args = parser.parse_args()
    names = caffemodel_to_npz(args.caffe_model, args.out)
    print("Wrote {} arrays to {}".format(len(names), args.out))
    for n in names[:10]:
        print("  ", n)


if __name__ == "__main__":
    main()
