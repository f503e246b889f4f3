from .segmenter import ObjectSegmenter, SegmenterOptions

__all__ = ["ObjectSegmenter", "SegmenterOptions"]
