"""ctypes bridge to the native C++ merge decoder.

Replaces the reference's Cython bridge (`utils/csegment/c_segment.pyx:30-86`)
with a ctypes binding over a C ABI; the shared library is built on demand
with g++ (no build step required at install time).

Public surface (signature parity with `c_segment.pyx:30-36`):
    run_segmentation(class_pred, adj_pred, num_classes, offset_list,
                     same_different_bias, object_merge_factor,
                     merge_logprob_bias) -> (mask, object_class)
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native", "segment.cc")
_LIB = os.path.join(_HERE, "native", "libmergenet_segment.so")
_lock = threading.Lock()
_lib = None


def _build():
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB) or
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        intp = ctypes.POINTER(ctypes.c_int)
        lib.mn_run_segmentation.argtypes = [
            f32p, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, intp, i32p, i32p,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float]
        lib.mn_run_segmentation.restype = None
        lib.mn_run_segmentation_batch.argtypes = [
            f32p, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, intp, i32p, i32p,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.c_int]
        lib.mn_run_segmentation_batch.restype = None
        _lib = lib
        return lib


def _as_c(arr, dtype):
    a = np.ascontiguousarray(arr, dtype=dtype)
    return a


_DEN_MODES = {"sum": 0, "product": 1}
_REMERGE_MODES = {"eq": 0, "ge": 1}


def run_segmentation(class_pred, adj_pred, num_classes, offset_list,
                     same_different_bias=0.0, object_merge_factor=1.0,
                     merge_logprob_bias=0.0, den_mode="sum",
                     remerge_mode="eq", do_prune=False,
                     prune_threshold=200.0):
    """Decode one image on the host C++ decoder.

    Args:
        class_pred: (num_classes, H, W) float array of class probabilities.
        adj_pred:   (num_offsets, H, W) float array of sameness probabilities.
        num_classes, offset_list: model configuration.
        remaining args: segmenter hyperparameters (see SegmenterOptions).
        Defaults reproduce the reference Cityscapes recipe: 'sum' denominator,
        bias outside the division, merge on exact re-pop equality, no prune
        (reference `segment.cc:145-150,561,568`).

    Returns:
        (mask, object_class): (H, W) int32 instance mask with ids 1..K and a
        length-K list of class ids.
    """
    lib = _load()
    class_pred = _as_c(class_pred, np.float32)
    adj_pred = _as_c(adj_pred, np.float32)
    C, H, W = class_pred.shape
    O = adj_pred.shape[0]
    assert C == num_classes
    assert O == len(offset_list)
    assert adj_pred.shape[1:] == (H, W)
    offsets = _as_c(np.asarray(offset_list), np.int32).astype(np.intc)
    mask = np.zeros((H, W), dtype=np.int32)
    object_class = np.full(H * W, -1, dtype=np.int32)

    lib.mn_run_segmentation(
        class_pred.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), C,
        adj_pred.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), O,
        H, W, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        object_class.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        float(same_different_bias), float(object_merge_factor),
        float(merge_logprob_bias), _DEN_MODES[den_mode],
        _REMERGE_MODES[remerge_mode], int(do_prune), float(prune_threshold))

    classes = []
    for v in object_class:
        if v == -1:
            break
        classes.append(int(v))
    return mask, classes


def run_segmentation_batch(class_pred, adj_pred, num_classes, offset_list,
                           same_different_bias=0.0, object_merge_factor=1.0,
                           merge_logprob_bias=0.0, den_mode="sum",
                           remerge_mode="eq", do_prune=False,
                           prune_threshold=200.0, num_threads=0):
    """Decode a batch (B, C, H, W)/(B, O, H, W); one host thread per image.

    Returns (masks, object_classes): (B, H, W) int32 and a list of B lists.
    """
    lib = _load()
    class_pred = _as_c(class_pred, np.float32)
    adj_pred = _as_c(adj_pred, np.float32)
    B, C, H, W = class_pred.shape
    O = adj_pred.shape[1]
    assert C == num_classes and O == len(offset_list)
    assert adj_pred.shape == (B, O, H, W)
    offsets = _as_c(np.asarray(offset_list), np.int32).astype(np.intc)
    masks = np.zeros((B, H, W), dtype=np.int32)
    object_class = np.full((B, H * W), -1, dtype=np.int32)

    lib.mn_run_segmentation_batch(
        class_pred.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), C,
        adj_pred.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), O,
        B, H, W, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        masks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        object_class.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        float(same_different_bias), float(object_merge_factor),
        float(merge_logprob_bias), _DEN_MODES[den_mode],
        _REMERGE_MODES[remerge_mode], int(do_prune), float(prune_threshold),
        int(num_threads))

    all_classes = []
    for b in range(B):
        classes = []
        for v in object_class[b]:
            if v == -1:
                break
            classes.append(int(v))
        all_classes.append(classes)
    return masks, all_classes
