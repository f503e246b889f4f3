"""Caffemodel wire-format parser: round-trip against a hand-encoded
NetParameter binary (no caffe/protobuf dependency needed to test)."""

import struct

import numpy as np

from mergenet_tpu.utils.caffe_import import (load_caffemodel,
                                             extract_weights,
                                             caffemodel_to_npz)


def _varint(x):
    out = bytearray()
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field, wt):
    return _varint((field << 3) | wt)


def _len_delim(field, payload):
    return _tag(field, 2) + _varint(len(payload)) + payload


def _blob(arr):
    """Encode a BlobProto: shape (field 7) + packed float data (field 5)."""
    arr = np.asarray(arr, np.float32)
    shape_payload = b"".join(_tag(1, 0) + _varint(d) for d in arr.shape)
    shape = _len_delim(7, shape_payload)
    data = _len_delim(5, arr.astype("<f4").tobytes())
    return shape + data


def _layer(name, ltype, blobs, bias_term=None):
    payload = _len_delim(1, name.encode())
    payload += _len_delim(2, ltype.encode())
    for b in blobs:
        payload += _len_delim(7, _blob(b))
    if bias_term is not None:
        conv = _tag(2, 0) + _varint(int(bias_term))
        payload += _len_delim(106, conv)
    return _len_delim(100, payload)  # NetParameter.layer


def _make_caffemodel(tmp_path):
    rng = np.random.RandomState(0)
    conv_w = rng.randn(4, 3, 3, 3).astype(np.float32)  # OIHW
    bn = [rng.randn(4).astype(np.float32) for _ in range(4)]
    net = _layer("conv1", "ConvolutionData", [conv_w], bias_term=False)
    net += _layer("bn1", "BNData", bn)
    net += _layer("relu1", "ReLU", [])  # no blobs: dropped
    path = str(tmp_path / "model.caffemodel")
    with open(path, "wb") as f:
        f.write(net)
    return path, conv_w, bn


def test_parse_caffemodel(tmp_path):
    path, conv_w, bn = _make_caffemodel(tmp_path)
    layers = load_caffemodel(path)
    assert [l["name"] for l in layers] == ["conv1", "bn1", "relu1"]
    weights = extract_weights(layers)
    assert set(weights) == {"conv1", "bn1"}
    np.testing.assert_allclose(weights["conv1"]["blobs"][0], conv_w)
    assert weights["conv1"]["convolution_param"]["bias_term"] is False
    for i in range(4):
        np.testing.assert_allclose(weights["bn1"]["blobs"][i], bn[i])


def test_caffemodel_to_npz(tmp_path):
    path, conv_w, bn = _make_caffemodel(tmp_path)
    npz_path = str(tmp_path / "out.npz")
    names = caffemodel_to_npz(path, npz_path)
    assert "conv1.0" in names and "bn1.3" in names
    data = np.load(npz_path)
    # conv transposed OIHW -> HWIO
    np.testing.assert_allclose(data["conv1.0"],
                               np.transpose(conv_w, (2, 3, 1, 0)))
