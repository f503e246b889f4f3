"""Reference-compatible import surface.

The reference framework exposed its library as top-level `utils` and
`models` packages (`from utils.segmenter import ObjectSegmenter`,
`from models import get_model`, ...).  These shim modules re-export the
mergenet_tpu implementations under the old paths so reference-style code
runs against this framework unchanged."""

from mergenet_tpu.decoder.segmenter import ObjectSegmenter, SegmenterOptions

__all__ = ["ObjectSegmenter", "SegmenterOptions"]
