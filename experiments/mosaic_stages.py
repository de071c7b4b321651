#!/usr/bin/env python
"""Which radix-stage formulations does Mosaic lower fast?

Round 1's Pallas conv ran 4.5x slower than the fused XLA engine; before
designing the fused kernel, measure the primitives in isolation. Each case
is ONE pallas_call with a resident [512, 512] CDF64 block per grid step
(grid=(8,), i.e. one conv chunk's complex blocks): HBM floor is the 8 MiB
in + 8 MiB out per step (~0.16 ms/call at 819 GB/s), everything else is
Mosaic's lowering of the body.

Cases:
  noop        copy in->out (measures the HBM floor + call overhead)
  r4 d=128    one radix-4 DIF stage, coarse strided rows
  r4 d=16     one stage at 16-row granularity
  r4 d=4      one stage at 4-row granularity (sub-tile)
  r4 d=1      one stage at single-row granularity (worst)
  chain512    the full 5-stage DIF chain for n=512 (prod phase-1 fwd)
  chain512x2  chain + inverse chain (what K-fused phase costs)
  subroll r2  radix-2 stage via pltpu.roll along SUBLANES + select
  laneroll r2 radix-2 stage via pltpu.roll along LANES + select
  transpose   jnp.swapaxes(-1, -2) of the [512, 512] block
  cmul        elementwise CDF64 multiply by a resident [512,512] table

XLA jit equivalents of a few cases print alongside for calibration.
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from audio_fir_filter_tpu.ops import fft_core as fc
from audio_fir_filter_tpu.ops.fft_core import ARITH_DF64

N = 512
BATCH = 8
VMEM_LIMIT = 100 * 1024 * 1024


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


def pallas_block_op(body, z, consts=()):
    """One pallas_call over leaves [BATCH, N, N]; body(zt, *consts_t)."""
    leaves, zdef = jax.tree.flatten(z)
    cleaves = [jax.tree.leaves(c) for c in consts]
    cflat = [l for ls in cleaves for l in ls]
    cdefs = [jax.tree.structure(c) for c in consts]
    nz = len(leaves)

    def kernel(*refs):
        zrefs = refs[:nz]
        crefs = refs[nz : nz + len(cflat)]
        orefs = refs[nz + len(cflat):]
        zt = jax.tree.unflatten(zdef, [rf[0] for rf in zrefs])
        cts = []
        k = 0
        for cd, ls in zip(cdefs, cleaves):
            cts.append(jax.tree.unflatten(cd, [crefs[k + i][...]
                                               for i in range(len(ls))]))
            k += len(ls)
        out = body(zt, *cts)
        for rf, leaf in zip(orefs, jax.tree.leaves(out)):
            rf[0] = leaf

    zspec = pl.BlockSpec((1, N, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    cspecs = [pl.BlockSpec(l.shape, lambda i, _nd=l.ndim: (0,) * _nd,
                           memory_space=pltpu.VMEM) for l in cflat]
    out = pl.pallas_call(
        kernel,
        grid=(BATCH,),
        in_specs=[zspec] * nz + cspecs,
        out_specs=[zspec] * nz,
        out_shape=[jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(*leaves, *cflat)
    return jax.tree.unflatten(zdef, out)


def one_stage(z, kind, d, arith, tabs):
    """A single DIF stage (subset of fc.fft_dif_rows)."""
    plan = ((kind, d),)
    return fc.fft_dif_rows(z, {"r2": 2, "r4": 4}[kind] * d, arith,
                           tabs=tabs, plan=plan)


def roll_r2_stage(z, e, axis, arith, w):
    """Radix-2 DIF butterfly at distance e via circular roll + select.

    y[i] = x[i] + x[i+e]            where (i // e) even
    y[i] = (x[i-e] - x[i]) * w[i]   where (i // e) odd
    """
    def roll(t, s):
        return pltpu.roll(t, s, axis=axis)

    u = jax.tree.map(lambda t: roll(t, -e % (t.shape[axis])), z)
    v = jax.tree.map(lambda t: roll(t, e), z)
    idx = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1 if axis in (-1, 1)
                                   else 0)
    lower = (idx // e) % 2 == 0
    # compute both branches, select (the SIMD cost model case)
    low = arith.add(z, u)
    high = arith.mul(arith.sub(v, z), w)
    return jax.tree.map(lambda a, b: jnp.where(lower, a, b), low, high)


def main():
    arith = ARITH_DF64
    rng = np.random.default_rng(0)
    zr = jnp.asarray(rng.standard_normal((BATCH, N, N)), jnp.float32)
    zi = jnp.asarray(rng.standard_normal((BATCH, N, N)), jnp.float32)
    z = arith.from_f32(zr, zi)
    fence(z)
    samples = BATCH * N * N * 2  # 2 real samples per complex point

    tabs512 = fc.dif_tables(N, arith.name)
    plan512 = fc.dif_plan(N)
    T = jax.tree.map(jnp.asarray,
                     arith.wrap_np(fc._fourstep_dif_twiddle_np(N, N)))
    w_lane = jax.tree.map(
        jnp.asarray,
        arith.wrap_np(np.exp(-2j * np.pi * np.arange(N)[None, :] / 64.0)))

    def run(name, fn, *args):
        t = timeit(fn, *args)
        log(f"{name:22s}: {t*1e3:7.3f} ms  ({samples/t/1e9:6.2f} Gs/s-equiv)")
        return t

    run("noop copy", jax.jit(lambda x: pallas_block_op(lambda zt: zt, x)), z)

    def dev_tabs(n, plan=None):
        return tuple(tuple(jax.tree.map(jnp.asarray, w) for w in ws)
                     for ws in fc.dif_tables(n, arith.name, plan))

    for kind, d in [("r4", 128), ("r4", 16), ("r4", 4), ("r4", 1)]:
        plan = ((kind, d),)
        tb = dev_tabs(4 * d, plan)
        run(f"pallas {kind} d={d}",
            jax.jit(lambda x, t, p=plan: pallas_block_op(
                lambda zt, tt: fc.fft_dif_rows(zt, 0, arith, tabs=tt, plan=p),
                x, consts=(t,))), z, tb)

    tabsN = dev_tabs(N)

    run("pallas chain512",
        jax.jit(lambda x, t: pallas_block_op(
            lambda zt, tt: fc.fft_dif_rows(zt, N, arith, tabs=tt),
            x, consts=(t,))), z, tabsN)

    run("pallas chain512 f+i",
        jax.jit(lambda x, t: pallas_block_op(
            lambda zt, tt: fc.ifft_dit_rows(
                fc.fft_dif_rows(zt, N, arith, tabs=tt), N, arith, tabs=tt),
            x, consts=(t,))), z, tabsN)

    for axis, nm in [(0, "subroll"), (1, "laneroll")]:
        def rbody(zt, w, axis=axis):
            return roll_r2_stage(zt, 8, axis, arith, w)
        run(f"pallas {nm} r2 e=8",
            jax.jit(lambda x, w, b=rbody: pallas_block_op(
                lambda zt, wt: b(zt, wt), x, consts=(w,))), z, w_lane)

    run("pallas transpose",
        jax.jit(lambda x: pallas_block_op(
            lambda zt: jax.tree.map(lambda t: jnp.swapaxes(t, -1, -2), zt),
            x)), z)

    run("pallas cmul(T)",
        jax.jit(lambda x, t: pallas_block_op(
            lambda zt, tt: arith.mul(zt, tt), x, consts=(t,))), z, T)

    # XLA calibration
    run("XLA chain512", jax.jit(lambda x: fc.fft_dif_rows(x, N, arith)), z)
    run("XLA chain512 f+i", jax.jit(
        lambda x: fc.ifft_dit_rows(fc.fft_dif_rows(x, N, arith), N, arith)),
        z)
    run("XLA cmul(T)", jax.jit(lambda x, t: arith.mul(x, t)), z, T)
    run("XLA transpose", jax.jit(
        lambda x: jax.tree.map(lambda t: jnp.swapaxes(t, -1, -2), x)), z)


if __name__ == "__main__":
    main()
