#!/usr/bin/env python
"""Sweep conv_chunk for the fused Pallas engine vs the XLA fourstep engine
(device-generated data, production kernel shapes, both precisions)."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from audio_fir_filter_tpu.ops import fft_core as fc
from audio_fir_filter_tpu.ops import pallas_fft as pf
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


def main():
    b = 1 << 18
    r, c = fc.fourstep_split(b)
    rng = np.random.default_rng(0)
    h = np.zeros(b)
    h[:38401] = rng.standard_normal(38401) / np.sqrt(38401)

    for name, arith in (("df64", ARITH_DF64), ("f32", ARITH_F32)):
        H_four = jax.tree.map(jnp.asarray, arith.wrap_np(
            fc.fourstep_dif_fft_np(h, r, c)))
        H_roll = pf.wrap_spectrum(pf.kernel_spectrum_np(h, b, arith), arith)
        for chunk in (8, 16, 32, 64):
            blocks = jax.jit(lambda n=chunk * b: 0.3 * jnp.sin(
                0.37 * jnp.arange(n, dtype=jnp.float32)
            ).reshape(-1, b))()
            fence(blocks)
            fn_p = jax.jit(lambda x, a=arith, H=H_roll:
                           pf.pallas_conv_real_blocks(x, H, a,
                                                      interpret=False))
            t = timeit(fn_p, blocks)
            log(f"pallas {name} chunk={chunk:3d}: {t*1e3:7.3f} ms "
                f"({chunk*b/t/1e6:7.1f} Ms/s raw)")
        for chunk in (16, 32):
            blocks = jax.jit(lambda n=chunk * b: 0.3 * jnp.sin(
                0.37 * jnp.arange(n, dtype=jnp.float32)
            ).reshape(-1, b))()
            fence(blocks)
            fn_x = jax.jit(lambda x, a=arith, H=H_four:
                           fc.fourstep_conv_real_blocks(x, H, a))
            t = timeit(fn_x, blocks)
            log(f"xla    {name} chunk={chunk:3d}: {t*1e3:7.3f} ms "
                f"({chunk*b/t/1e6:7.1f} Ms/s raw)")


if __name__ == "__main__":
    main()
