"""mergenet_tpu — a TPU-native instance-segmentation framework.

A from-scratch JAX/Flax/Pallas re-design of the proposal-free "mergeNet"
method (reference: YiwenShaoStephen/mergeNet): a dense CNN predicts, per
pixel, `num_classes` class probabilities plus `num_offsets` "sameness"
probabilities over a logarithmic-spiral offset set; a merge decoder then
greedily agglomerates pixels into instances by log-likelihood gain.

Layout:
    core/      offsets, CoreConfig, combined-target spec
    models/    Flax conv nets (UNet, FCN-ResNet/VGG, PSPFPNet, UperNet, PSPNet)
    ops/       losses, metrics, device-side target building, Pallas kernels
    decoder/   merge decoders: Python oracle, native C++ (ctypes), on-device JAX
    parallel/  mesh construction, pjit train step, spatial sharding
    data/      COCO-json datasets (torch-free), COCO-lite RLE + eval
    utils/     train/validate loops, inference, checkpointing, visualization
"""

__version__ = "0.1.0"
