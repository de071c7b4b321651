"""Retune block size B and CONV_CHUNK for the unrolled DIF/DIT engine.

The production constants (B = 8*M rounded up, CONV_CHUNK = 8) were tuned
for the fori_loop Pease engine; the unrolled engine has different
working-set and overhead behavior. Metric: throughput in OUTPUT samples
(hop per block), i.e. what the end-to-end pipeline sees.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from audio_fir_filter_tpu.ops import fft_core as fc
from audio_fir_filter_tpu.ops.fft_core import ARITH_DF64


def main():
    m = 38400  # M at 96 kHz defaults
    rng = np.random.default_rng(0)
    print(f"device {jax.devices()[0]}, M={m}")
    for lb in (17, 18, 19, 20):
        b = 1 << lb
        hop = b - m
        r, c = fc.fourstep_split(b)
        h = np.zeros(b)
        h[: m + 1] = rng.standard_normal(m + 1) / m
        H = jax.tree.map(jnp.asarray, ARITH_DF64.wrap_np(
            fc.fourstep_dif_fft_np(h, r, c)))
        for chunk in (4, 8, 16):
            blocks = jax.device_put(
                (0.3 * rng.standard_normal((chunk, b))).astype(np.float32))

            @jax.jit
            def f(x):
                return fc.fourstep_conv_real_blocks(x, H, ARITH_DF64)

            y = f(blocks)
            np.asarray(y[0, :8])
            reps = max(6, (1 << 24) // (chunk * b))
            t0 = time.perf_counter()
            for _ in range(reps):
                y = f(blocks)
            np.asarray(y[0, :8])
            dt = time.perf_counter() - t0
            out_rate = reps * chunk * hop / dt
            print(f"B=2^{lb} chunk={chunk:2d}: conv "
                  f"{reps*chunk*b/dt/1e6:7.1f} Ms/s raw, "
                  f"{out_rate/1e6:7.1f} Ms/s output (hop/B={hop/b:.3f})")


if __name__ == "__main__":
    main()
