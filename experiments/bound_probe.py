#!/usr/bin/env python
"""Is the df64 fourstep conv VPU-compute-bound or HBM-bound on v5e?

Times the production conv against two shape-identical variants:
  - "cheap-arith": same CDF64 pytrees, same stage structure and data
    movement, but add/mul collapsed to 1-2 f32 ops (flops cut ~6x,
    HBM traffic unchanged). If time ~unchanged -> memory-bound; if it
    drops ~proportionally -> compute-bound.
  - f32 engine: flops ~10x lower AND traffic 2x lower (8 vs 16 B/cpoint).

Timing is data-independent (FFT), so wrong math is fine for the probe.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from audio_fir_filter_tpu.ops import fft_core as fc
from audio_fir_filter_tpu.ops import df64 as dd
from audio_fir_filter_tpu.ops.fft_core import ARITH_DF64, ARITH_F32


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fence(y):
    np.asarray(jax.tree.leaves(y)[0].reshape(-1)[:8])


def timeit(fn, *args, reps=20):
    fence(fn(*args))
    t0 = time.perf_counter()
    y = None
    for _ in range(reps):
        y = fn(*args)
    fence(y)
    return (time.perf_counter() - t0) / reps


class _ArithDF64Cheap(fc._ArithDF64):
    """Same pytrees/shapes as df64, ~1-flop add / ~3-flop mul (WRONG math,
    right memory pattern)."""

    name = "df64"  # reuse df64 tables

    @staticmethod
    def add(a, b):
        return dd.CDF64(dd.DF64(a.re.hi + b.re.hi, a.re.lo + b.re.lo),
                        dd.DF64(a.im.hi + b.im.hi, a.im.lo + b.im.lo))

    @staticmethod
    def sub(a, b):
        return dd.CDF64(dd.DF64(a.re.hi - b.re.hi, a.re.lo - b.re.lo),
                        dd.DF64(a.im.hi - b.im.hi, a.im.lo - b.im.lo))

    @staticmethod
    def mul(a, b):
        return dd.CDF64(
            dd.DF64(a.re.hi * b.re.hi - a.im.hi * b.im.hi,
                    a.re.lo + b.re.lo),
            dd.DF64(a.re.hi * b.im.hi + a.im.hi * b.re.hi,
                    a.im.lo + b.im.lo))


def main():
    b = 1 << 18
    chunk = 16
    r, c = fc.fourstep_split(b)
    rng = np.random.default_rng(0)
    h = np.zeros(b)
    h[:38401] = rng.standard_normal(38401) / 38400.0

    blocks = jax.device_put(
        (0.3 * rng.standard_normal((chunk, b))).astype(np.float32))
    fence(blocks)

    for name, arith in [("df64 strict", ARITH_DF64),
                        ("df64 cheap-arith", _ArithDF64Cheap),
                        ("f32", ARITH_F32)]:
        H2 = jax.tree.map(
            jnp.asarray, arith.wrap_np(fc.fourstep_dif_fft_np(h, r, c)))
        fn = jax.jit(lambda x, H=H2, a=arith: fc.fourstep_conv_real_blocks(
            x, H, a))
        t = timeit(fn, blocks)
        log(f"{name:18s}: {t*1e3:7.3f} ms  ({chunk*b/t/1e6:7.1f} Ms/s raw)")


if __name__ == "__main__":
    main()
