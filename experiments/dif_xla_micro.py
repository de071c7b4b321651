"""Compare fourstep engines on real TPU: Pease fori_loop (production) vs
in-place DIF/DIT rows unrolled as plain XLA (the Pallas kernels' stage
functions, minus pallas_call).

Motivation (trace of the production engine, 3 reps, B=2^19 df64):
  copies 40 ms + reshape 11 ms + pad 5 ms  >  butterfly fusions ~35 ms,
and the nested fori_loop whiles carry heavy per-iteration overhead.
The DIF rows formulation reads/writes contiguous row blocks per stage and
unrolls the ~5+5 stages at trace time (no inner while at all).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from audio_fir_filter_tpu.ops import fft_core as fc
from audio_fir_filter_tpu.ops.fft_core import ARITH_DF64


def tmap(f, *t):
    return jax.tree.map(f, *t)


def dif_conv(blocks, H2, arith=ARITH_DF64):
    """Four-step conv via in-place DIF/DIT rows, pure XLA (no pallas)."""
    nb, b = blocks.shape
    r, c = fc.fourstep_split(b)
    T = tmap(jnp.asarray, arith.wrap_np(fc._fourstep_dif_twiddle_np(r, c)))
    z = arith.from_f32(blocks[0::2], blocks[1::2])
    z = tmap(lambda t: t.reshape(t.shape[:-1] + (r, c)), z)
    z = fc.fft_dif_rows(z, r, arith)
    z = arith.mul(z, T)
    z = tmap(lambda t: jnp.swapaxes(t, -1, -2), z)
    z = fc.fft_dif_rows(z, c, arith)
    z = arith.mul(z, H2)
    z = fc.ifft_dit_rows(z, c, arith)
    z = tmap(lambda t: jnp.swapaxes(t, -1, -2), z)
    z = arith.mul(z, arith.conj(T))
    z = fc.ifft_dit_rows(z, r, arith)
    z = tmap(lambda t: t.reshape(t.shape[:-2] + (b,)), z)
    re, im = arith.to_f32(z)
    return jnp.stack([re, im], axis=1).reshape(nb, b)


def bench(fn, blocks, H, label, reps=30):
    f = jax.jit(lambda x: fn(x, H))
    y = f(blocks); np.asarray(y[0, :8])
    t0 = time.perf_counter()
    for _ in range(reps):
        y = f(blocks)
    np.asarray(y[0, :8])
    dt = time.perf_counter() - t0
    ns = dt / (reps * blocks.size) * 1e9
    print(f"{label:28s} {dt:7.3f}s  {ns:6.3f} ns/sample "
          f"({blocks.size*reps/dt/1e6:7.1f} Ms/s)")
    return y


def main():
    b = 1 << 19
    nb = 8
    rng = np.random.default_rng(0)
    blocks = jax.device_put(
        (0.3 * rng.standard_normal((nb, b))).astype(np.float32))
    h = np.zeros(b); h[:1000] = rng.standard_normal(1000) / 100
    r, c = fc.fourstep_split(b)
    arith = ARITH_DF64

    Hp = tmap(jnp.asarray, arith.wrap_np(fc.fourstep_fft_np(h, r, c)))
    Hd = tmap(jnp.asarray, arith.wrap_np(fc.fourstep_dif_fft_np(h, r, c)))

    print(f"blocks [{nb}, {b}] df64, R={r} C={c}, device {jax.devices()[0]}")
    y1 = bench(lambda x, H: fc.fourstep_conv_real_blocks(x, H, arith),
               blocks, Hp, "pease fori_loop (prod)")
    y2 = bench(dif_conv, blocks, Hd, "dif/dit rows unrolled")
    err = float(np.max(np.abs(np.asarray(y1) - np.asarray(y2))))
    print(f"max |pease - dif| = {err:.3e}")


if __name__ == "__main__":
    main()
