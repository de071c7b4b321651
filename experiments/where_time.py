#!/usr/bin/env python
"""Decompose the fourstep df64 conv's time: stages vs transposes vs muls.

Each piece is jitted separately, so the sum of parts >= the fused whole;
the gap is XLA's cross-stage fusion. Timings are data-independent.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from audio_fir_filter_tpu.ops import fft_core as fc
from audio_fir_filter_tpu.ops.fft_core import ARITH_DF64


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
    arith = ARITH_DF64
    b = 1 << 18
    chunk = 16
    r, c = fc.fourstep_split(b)
    rng = np.random.default_rng(0)
    h = np.zeros(b)
    h[:38401] = rng.standard_normal(38401) / 38400.0
    H2 = jax.tree.map(jnp.asarray,
                      arith.wrap_np(fc.fourstep_dif_fft_np(h, r, c)))
    T = fc._fourstep_dif_twiddle(r, c, arith.name)
    Td = jax.tree.map(jnp.asarray, T)

    blocks = jax.device_put(
        (0.3 * rng.standard_normal((chunk, b))).astype(np.float32))
    z0 = arith.from_f32(blocks[0::2], blocks[1::2])
    z0 = jax.tree.map(lambda t: t.reshape(t.shape[:-1] + (r, c)), z0)
    z0 = jax.block_until_ready(z0)

    full = jax.jit(lambda x: fc.fourstep_conv_real_blocks(x, H2, arith))
    t_full = timeit(full, blocks)
    log(f"full conv                 : {t_full*1e3:7.3f} ms  "
        f"({chunk*b/t_full/1e6:7.1f} Ms/s raw)")

    p1 = jax.jit(lambda z: fc.fft_dif_rows(z, r, arith))
    log(f"phase1 fwd (R rows)       : {timeit(p1, z0)*1e3:7.3f} ms")

    tw = jax.jit(lambda z: arith.mul(z, Td))
    log(f"four-step twiddle mul     : {timeit(tw, z0)*1e3:7.3f} ms")

    tr = jax.jit(lambda z: jax.tree.map(lambda t: jnp.swapaxes(t, -1, -2), z))
    log(f"transpose [R,C]->[C,R]    : {timeit(tr, z0)*1e3:7.3f} ms")

    p2 = jax.jit(lambda z: fc.fft_dif_rows(z, c, arith))
    zT = jax.block_until_ready(tr(z0))
    log(f"phase2 fwd (C rows)       : {timeit(p2, zT)*1e3:7.3f} ms")

    hm = jax.jit(lambda z: arith.mul(z, H2))
    log(f"H mul                     : {timeit(hm, zT)*1e3:7.3f} ms")

    i2 = jax.jit(lambda z: fc.ifft_dit_rows(z, c, arith))
    log(f"phase2 inv                : {timeit(i2, zT)*1e3:7.3f} ms")

    i1 = jax.jit(lambda z: fc.ifft_dit_rows(z, r, arith))
    log(f"phase1 inv                : {timeit(i1, z0)*1e3:7.3f} ms")

    pk = jax.jit(lambda x: arith.from_f32(x[0::2], x[1::2]))
    log(f"pack f32->complex         : {timeit(pk, blocks)*1e3:7.3f} ms")

    def unpack(z):
        re, im = arith.to_f32(z)
        return jnp.stack([re, im], axis=1).reshape(chunk, b)
    up = jax.jit(lambda z: unpack(
        jax.tree.map(lambda t: t.reshape(t.shape[:-2] + (b,)), z)))
    log(f"unpack complex->f32       : {timeit(up, z0)*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
