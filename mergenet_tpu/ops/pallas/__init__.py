"""Pallas TPU kernels used by the framework.

`absorb.absorb_best_edges` is the production kernel: the decoder's
absorption-round edge scan (wired into `decode_hierarchical`, bit-exact
vs the jnp reference path, measured faster on v5e — docs/benchmarks.md).

A fused class+offset BCE loss kernel was built and validated in round 1
but REMOVED in round 2: at the recipes' channel-minor layout (C+O = 19
lanes) XLA's fusion won (3.3 ms vs 16.4 ms at (8, 768, 768, 19) f32,
2026-08 on v5e) and carrying an unused kernel helps nobody; see
docs/benchmarks.md for the dated record.
"""

from .absorb import absorb_best_edges, absorb_scan_supported

__all__ = ["absorb_best_edges", "absorb_scan_supported"]
