"""Shim: reference `utils/csegment/c_segment` (Cython) ->
mergenet_tpu.decoder.csegment (ctypes).  Same signature:
run_segmentation(class_pred, adj_pred, num_classes, offset_list,
same_different_bias, object_merge_factor, merge_logprob_bias)."""
from mergenet_tpu.decoder.csegment import (  # noqa: F401
    run_segmentation, run_segmentation_batch)
