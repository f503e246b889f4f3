"""Microbenchmark: Pallas VMEM lane-gather table lookup vs XLA's gather.

XLA lowers an N-indexed table lookup (out[n] = table[idx[n]]) to a
~3.7 ms scalar loop at N=512k on v5e (docs/benchmarks.md).  For tables
small enough to live in VMEM, the shipped kernel
(ops/pallas/tgather.py) keeps the table resident as (M//128, 128) rows
and resolves each index block with a within-VREG `take_along_axis`
lane gather over every chunk row plus a compare-select on the chunk
id — int32 values pass through exactly (no matmul or float
round-trip, so packed bit-field tables gather bit-exact).  An earlier
one-hot-MXU-matmul design was measured slower and dropped.  Measured
numbers live in the docs/benchmarks.md "Pallas table-gather kernel"
entry.

Usage: python scripts/bench_tgather.py [N] [M ...]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from mergenet_tpu.ops.pallas.tgather import table_gather, \
    table_gather_supported  # noqa: E402


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 512 * 1024
    Ms = [int(m) for m in sys.argv[2:]] or [8192, 65536]
    key = jax.random.PRNGKey(0)
    for M in Ms:
        kt, ki = jax.random.split(jax.random.fold_in(key, M))
        table = jax.random.randint(kt, (M,), 0, M, dtype=jnp.int32)
        idx = jax.random.randint(ki, (N,), 0, M, dtype=jnp.int32)

        xla = jax.jit(lambda t, i: t[i])
        ref = np.asarray(table)[np.asarray(idx)]
        t_xla = timeit(xla, table, idx)

        assert table_gather_supported(N, M), (N, M)
        pal = jax.jit(table_gather)
        got = np.asarray(pal(table, idx))
        assert (got == ref).all(), f"MISMATCH M={M}"
        t_pal = timeit(pal, table, idx)
        print(f"N={N} M={M}: xla {t_xla:.3f} ms  pallas {t_pal:.3f} ms  "
              f"({t_xla / t_pal:.2f}x)")


if __name__ == "__main__":
    main()
