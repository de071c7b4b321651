#!/usr/bin/env python
"""A/B: strict vs relaxed df64 in the production fourstep conv.

Times both on the production shape (B=2^18, chunk 16) and checks the
relaxed path's accuracy against a float64 circular-convolution oracle.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from audio_fir_filter_tpu.ops import fft_core as fc
from audio_fir_filter_tpu.ops.fft_core import ARITH_DF64, ARITH_DF64_RELAXED


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fence(y):
    np.asarray(jax.tree.leaves(y)[0].reshape(-1)[:8])


def timeit(fn, *args, reps=30):
    fence(fn(*args))
    t0 = time.perf_counter()
    y = None
    for _ in range(reps):
        y = fn(*args)
    fence(y)
    return (time.perf_counter() - t0) / reps


def main():
    b = 1 << 18
    chunk = 16
    r, c = fc.fourstep_split(b)
    rng = np.random.default_rng(0)
    taps = 38401
    h = np.zeros(b)
    h[:taps] = rng.standard_normal(taps) / np.sqrt(taps)
    H2 = jax.tree.map(jnp.asarray,
                      ARITH_DF64.wrap_np(fc.fourstep_dif_fft_np(h, r, c)))

    blocks_np = (0.3 * rng.standard_normal((chunk, b))).astype(np.float32)
    blocks = jax.device_put(blocks_np)
    fence(blocks)

    # float64 oracle: circular convolution of each block with h
    Hf = np.fft.rfft(h)
    want = np.fft.irfft(np.fft.rfft(blocks_np.astype(np.float64)) * Hf, b)

    for name, arith in [("strict", ARITH_DF64), ("relaxed", ARITH_DF64_RELAXED)]:
        fn = jax.jit(lambda x, a=arith: fc.fourstep_conv_real_blocks(
            x, H2, a))
        y = np.asarray(fn(blocks))
        err = np.max(np.abs(y.astype(np.float64) - want))
        ulp = np.max(np.abs(want)) * 2.0 ** -24
        t = timeit(fn, blocks)
        log(f"{name:8s}: {t*1e3:7.3f} ms ({chunk*b/t/1e6:7.1f} Ms/s raw)  "
            f"max err {err:.3e} = {err/ulp:.2f} ulp32-of-peak")


if __name__ == "__main__":
    main()
