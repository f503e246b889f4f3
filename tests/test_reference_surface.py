"""The reference import surface: reference-style code must find every
public symbol at the old `utils.*` / `models.*` paths (SURVEY.md §7
"Keep the public surface")."""

import numpy as np

from helpers import make_instance_scene, oracle_probs


def test_reference_imports():
    from utils.segmenter import ObjectSegmenter, SegmenterOptions
    from utils.train_utils import (train, validate, sample,
                                   save_checkpoint, AverageMeter,
                                   generate_offsets)
    from utils.inference_utils import (class_inference, offset_inference,
                                       save)
    from utils.score import runningScore, offsetIoU
    from utils.loss import (CrossEntropyLossOneHot, SoftDiceLoss,
                            MultiBCEWithLogitsLoss,
                            WeightedBCEWithLogitsLoss)
    from utils.dataset import (AllDataset, OffsetDataset, ClassDataset,
                               COCOTestset, COCODataset)
    from utils.data_io import DataSaver, WaldoDataset, WaldoTestset
    from utils.data_types import (validate_config,
                                  validate_image_with_mask,
                                  validate_combined_image)
    from utils.core_config import CoreConfig
    from utils.data_visualization import visualize_mask
    import utils.csegment.c_segment as cseg
    from models import get_model
    assert callable(cseg.run_segmentation)
    assert callable(get_model)


def test_reference_style_decode():
    """Reference segment.py-style call into the shim
    (egs/coco/local/segment.py:155-164)."""
    from utils.segmenter import ObjectSegmenter, SegmenterOptions
    import utils.csegment.c_segment as cseg

    offsets = [(1, 0), (0, 1), (-2, -1)]
    inst, classes = make_instance_scene()
    cp, sp = oracle_probs(inst, classes, 3, offsets)
    opts = SegmenterOptions(same_different_bias=0.0,
                            object_merge_factor=1.0 / len(offsets),
                            merge_logprob_bias=0.0, do_prune=False)
    seg = ObjectSegmenter(cp, sp, 3, offsets, opts)
    mask, object_class = seg.run_segmentation()
    assert len(object_class) == 2

    mask2, oc2 = cseg.run_segmentation(
        cp, sp, 3, offsets, 0.0, 1.0 / len(offsets), 0.0)
    assert len(oc2) == 2


def test_reference_loss_classes():
    import jax.numpy as jnp
    from utils.loss import SoftDiceLoss, WeightedBCEWithLogitsLoss
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(1, 8, 8, 3).astype(np.float32))
    target = jnp.asarray((rng.rand(1, 8, 8, 3) > 0.5).astype(np.float32))
    crit = SoftDiceLoss(mode="0")
    assert float(crit(logits, target)) > 0
    crit = WeightedBCEWithLogitsLoss(alpha=0.7)
    assert float(crit(logits, target)) > 0
