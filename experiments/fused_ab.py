#!/usr/bin/env python
"""A/B: fused Pallas kernel vs the XLA fourstep engine, production shape.

B=2^18 df64, chunk 16 real blocks per call. EVERYTHING stays on device —
the dev tunnel moves data at ~1 MB/s, so blocks are generated with
sin(iota) on the chip and only 8-sample fences / scalar diffs ever cross.
Cross-engine max|diff| (pallas vs fourstep, both ~49-bit paths) doubles
as the Mosaic-vs-XLA numerics check; absolute accuracy is oracle-gated by
the interpret-mode tests and bench.py --fidelity.
"""

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

    blocks = jax.jit(lambda: 0.3 * jnp.sin(
        0.37 * jnp.arange(chunk * b, dtype=jnp.float32)).reshape(chunk, b))()
    fence(blocks)

    for name, arith in (("df64", ARITH_DF64), ("f32", ARITH_F32)):
        H_four = jax.tree.map(jnp.asarray, arith.wrap_np(
            fc.fourstep_dif_fft_np(h, r, c)))
        H_roll = pf.wrap_spectrum(pf.kernel_spectrum_np(h, b, arith), arith)

        fn_x = jax.jit(lambda x, a=arith, H=H_four:
                       fc.fourstep_conv_real_blocks(x, H, a))
        fn_p = jax.jit(lambda x, a=arith, H=H_roll:
                       pf.pallas_conv_real_blocks(x, H, a, interpret=False))
        diff = jax.jit(lambda x: jnp.max(jnp.abs(fn_x(x) - fn_p(x))))

        results = {}
        for label, fn in ((f"xla fourstep {name}", fn_x),
                          (f"pallas fused {name}", fn_p)):
            t0 = time.perf_counter()
            fence(fn(blocks))
            log(f"{label:22s}: compile+run {time.perf_counter()-t0:6.1f}s")
            t = timeit(fn, blocks)
            results[label] = t
            log(f"{label:22s}: {t*1e3:7.3f} ms  "
                f"({chunk*b/t/1e6:7.1f} Ms/s raw)")
        d = float(np.asarray(diff(blocks)))
        log(f"cross-engine max|diff| ({name}): {d:.3e} "
            f"({d / 2.0 ** -24:.3f} lsb24 of full scale)")


if __name__ == "__main__":
    main()
