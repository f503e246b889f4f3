"""Microbenchmark: Pallas one-hot-matmul table gather vs XLA's gather.

XLA lowers an N-indexed table lookup (out[n] = table[idx[n]]) to a
~3.7 ms scalar loop at N=512k on v5e (docs/benchmarks.md).  For tables
small enough to live in VMEM, the lookup can instead ride the MXU:
factor idx = hi*128 + lo, build a (B, 128) one-hot of lo, matmul it
against the table reshaped (128, M//128) — giving each index its value
at EVERY chunk hi — then select the right chunk column with a compare
and a row-sum.  f32 matmul keeps int values < 2^24 exact.

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
