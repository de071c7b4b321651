#!/usr/bin/env python
"""Is the ~2.9 ms pallas 'copy floor' per-call, per-grid-step, or HBM?

copy_floor_probe measured a passthru pallas kernel (o_ref = x_ref,
grid=8, 32 MB total HBM traffic) at 2.87 ms/call — 11 GB/s effective,
~70x below HBM. Candidates: (a) per-jit-call dispatch latency through
the axon tunnel, (b) per-grid-step launch overhead, (c) throttled
HBM<->VMEM block pipelining. Discriminate by scaling the grid and by
timing non-pallas jit baselines:

  jit_add       y = x + 1 (whole array, XLA only)       [floor (a)]
  jit_tiny      y = x[:8] + 1 on a tiny array           [floor (a)]
  pallas_g{N}   passthru pallas, grid=N (same 2 MB/block)
                — per-step overhead shows as slope in N

MEASURED (v5e, round 3): jit_tiny 1.403 ms, jit_add(16 MB) 1.335 ms,
pallas_g2 1.411 / g8 2.143 / g32 1.490 ms. Verdict: ~1.4 ms PER-CALL
dispatch floor through the dev tunnel (data- and kernel-independent;
variance 1.3-2.9 ms explains all copy_floor_probe spread); device-side
streaming runs near HBM speed (g32 moves 128 MB in <= 0.15 ms of
device time). Consequence: kernel marginals must be measured at large
grids in ONE dispatch, and production segments should amortize the
floor (63-hop segment = ~10%).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from audio_fir_filter_tpu.ops import fft_core as fc

VMEM_LIMIT = 100 * 1024 * 1024


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


def make_passthru(r, c, grid):
    def kernel(x_ref, o_ref):
        o_ref[0, 0] = x_ref[0, 0]
        o_ref[0, 1] = x_ref[0, 1]

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((1, 2, r, c), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 2, r, c), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT),
        )(x)

    return run


def main():
    b = 1 << 18
    r, c = fc.fourstep_split(b)

    xs = {}
    for grid in (2, 8, 32):
        xs[grid] = jax.jit(lambda g=grid: 0.3 * jnp.sin(
            0.37 * jnp.arange(g * 2 * b, dtype=jnp.float32)
        ).reshape(g, 2, r, c))()
        fence(xs[grid])
    tiny = jnp.arange(1024, dtype=jnp.float32)
    fence(tiny)

    t = timeit(jax.jit(lambda x: x[:8] + 1.0), tiny)
    log(f"jit_tiny    : {t*1e3:8.3f} ms")
    t = timeit(jax.jit(lambda x: x + 1.0), xs[8])
    log(f"jit_add g=8 : {t*1e3:8.3f} ms  "
        f"({xs[8].size*4*2/t/1e9:6.1f} GB/s r+w)")

    for grid in (2, 8, 32):
        run = make_passthru(r, c, grid)
        t = timeit(run, xs[grid])
        nsamp = grid * 2 * b
        log(f"pallas_g{grid:<3d}: {t*1e3:8.3f} ms  "
            f"({nsamp/t/1e6:8.1f} Ms/s, {nsamp*4*2/t/1e9:6.1f} GB/s r+w)")


if __name__ == "__main__":
    main()
