#!/usr/bin/env python
"""Head-to-head: XLA fourstep vs Pallas conv at production size, real TPU."""

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
    np.asarray(y.reshape(-1)[:8])


def bench(fn, blocks, label, hop, reps=20):
    y = fn(blocks)
    fence(y)
    t0 = time.perf_counter()
    for _ in range(reps):
        y = fn(blocks)
    fence(y)
    dt = (time.perf_counter() - t0) / reps
    nb, b = blocks.shape
    log(f"{label:32s}: {dt*1e3:8.2f} ms -> raw {nb*b/dt/1e6:8.1f} Ms/s, "
        f"output {nb*hop/dt/1e6:8.1f} Ms/s")


def main():
    m = 38400
    log(f"device {jax.devices()[0]}")
    for lb in (18,):
        b = 1 << lb
        hop = b - m
        r, c = fc.fourstep_split(b)
        rng = np.random.default_rng(0)
        h = np.zeros(b)
        h[: m + 1] = rng.standard_normal(m + 1) / m
        for arith in (ARITH_DF64,):
            H2 = jax.tree.map(jnp.asarray, arith.wrap_np(
                fc.fourstep_dif_fft_np(h, r, c)))
            for chunk in (8, 16):
                blocks = jax.device_put(
                    (0.3 * rng.standard_normal((chunk, b))).astype(np.float32))

                xla = jax.jit(lambda x, H=H2, a=arith:
                              fc.fourstep_conv_real_blocks(x, H, a))
                pal = jax.jit(lambda x, H=H2, a=arith:
                              pf.pallas_conv_real_blocks(x, H, a,
                                                         interpret=False))
                tag = f"B=2^{lb} {arith.name} chunk={chunk}"
                bench(xla, blocks, f"xla-fourstep {tag}", hop)
                bench(pal, blocks, f"pallas       {tag}", hop)


if __name__ == "__main__":
    main()
