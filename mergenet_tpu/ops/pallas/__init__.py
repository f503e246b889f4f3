from .fused_loss import fused_class_offset_bce

__all__ = ["fused_class_offset_bce"]
