#!/usr/bin/env python
"""Round 2 of the Mosaic/XLA stage probes: where do the wins come from?

  - XLA radix-8 chain (3 stages for n=512) vs radix-4/2 chain (5 stages):
    if r8 stages stay HBM-bound, the conv drops from 20 to 12 stage passes.
  - Pallas: forward chain vs inverse chain (the f+i kernel was 2.2x the
    forward-only cost — find out which half is slow).
  - Pallas r8 chain.
  - Full conv (XLA) with the two [R,C]<->[C,R] transposes replaced by
    Pallas XLU transposes (measured ~7x cheaper than XLA's).
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


def pallas_transpose(z):
    return pallas_block_op(
        lambda zt: jax.tree.map(lambda t: jnp.swapaxes(t, -1, -2), zt), z)


def main():
    arith = ARITH_DF64
    rng = np.random.default_rng(0)
    zr = jnp.asarray(rng.standard_normal((BATCH, N, N)), jnp.float32)
    zi = jnp.asarray(rng.standard_normal((BATCH, N, N)), jnp.float32)
    z = arith.from_f32(zr, zi)
    fence(z)
    samples = BATCH * N * N * 2

    plan_r8 = fc.dif_plan_r8(N)
    plan_r4 = fc.dif_plan(N)
    log(f"n={N}: r4 plan {plan_r4}  r8 plan {plan_r8}")

    def dev_tabs(n, plan=None):
        return tuple(tuple(jax.tree.map(jnp.asarray, w) for w in ws)
                     for ws in fc.dif_tables(n, arith.name, plan))

    tabs_r4 = dev_tabs(N, plan_r4)
    tabs_r8 = dev_tabs(N, plan_r8)

    def run(name, fn, *args):
        t = timeit(fn, *args)
        log(f"{name:26s}: {t*1e3:7.3f} ms  ({samples/t/1e9:6.2f} Gs/s-eq)")
        return t

    run("noop pallas copy",
        jax.jit(lambda x: pallas_block_op(lambda zt: zt, x)), z)

    # --- XLA chains: r4 vs r8, forward and inverse
    run("XLA fwd r4 (5 st)",
        jax.jit(lambda x: fc.fft_dif_rows(x, N, arith, plan=plan_r4)), z)
    run("XLA fwd r8 (3 st)",
        jax.jit(lambda x: fc.fft_dif_rows(x, N, arith, plan=plan_r8)), z)
    run("XLA inv r4",
        jax.jit(lambda x: fc.ifft_dit_rows(x, N, arith, plan=plan_r4)), z)
    run("XLA inv r8",
        jax.jit(lambda x: fc.ifft_dit_rows(x, N, arith, plan=plan_r8)), z)

    # --- Pallas chains
    run("pallas fwd r4",
        jax.jit(lambda x, t: pallas_block_op(
            lambda zt, tt: fc.fft_dif_rows(zt, N, arith, tabs=tt,
                                           plan=plan_r4), x, consts=(t,))),
        z, tabs_r4)
    run("pallas inv r4",
        jax.jit(lambda x, t: pallas_block_op(
            lambda zt, tt: fc.ifft_dit_rows(zt, N, arith, tabs=tt,
                                            plan=plan_r4), x, consts=(t,))),
        z, tabs_r4)
    run("pallas fwd r8",
        jax.jit(lambda x, t: pallas_block_op(
            lambda zt, tt: fc.fft_dif_rows(zt, N, arith, tabs=tt,
                                           plan=plan_r8), x, consts=(t,))),
        z, tabs_r8)
    run("pallas inv r8",
        jax.jit(lambda x, t: pallas_block_op(
            lambda zt, tt: fc.ifft_dit_rows(zt, N, arith, tabs=tt,
                                            plan=plan_r8), x, consts=(t,))),
        z, tabs_r8)

    # --- full conv variants (marginal cost of the real hot path)
    h = np.zeros(N * N)
    h[:38401] = rng.standard_normal(38401) / 38400.0
    b = N * N  # 2^18: BATCH complex FFTs carry 2*BATCH real blocks
    r, c = fc.fourstep_split(b)
    H2 = jax.tree.map(jnp.asarray,
                      arith.wrap_np(fc.fourstep_dif_fft_np(h, r, c)))
    blocks = jax.device_put(
        (0.3 * rng.standard_normal((2 * BATCH, b))).astype(np.float32))
    fence(blocks)

    run("XLA conv (prod)",
        jax.jit(lambda x: fc.fourstep_conv_real_blocks(x, H2, arith)), blocks)

    def conv_ptrans(bl):
        """Production conv with Pallas transposes."""
        T = fc._fourstep_dif_twiddle(r, c, arith.name)
        zz = arith.from_f32(bl[0::2], bl[1::2])
        zz = jax.tree.map(lambda t: t.reshape(t.shape[:-1] + (r, c)), zz)
        zz = fc.fft_dif_rows(zz, r, arith)
        zz = arith.mul(zz, T)
        zz = pallas_transpose(zz)
        zz = fc.fft_dif_rows(zz, c, arith)
        zz = arith.mul(zz, H2)
        zz = fc.ifft_dit_rows(zz, c, arith)
        zz = pallas_transpose(zz)
        zz = arith.mul(zz, jax.tree.map(lambda t: t, arith.conj(T)))
        zz = fc.ifft_dit_rows(zz, r, arith)
        zz = jax.tree.map(lambda t: t.reshape(t.shape[:-2] + (b,)), zz)
        re, im = arith.to_f32(zz)
        return jnp.stack([re, im], axis=1).reshape(2 * BATCH, b)

    t = timeit(jax.jit(conv_ptrans), blocks)
    log(f"{'XLA conv + pallas T-pose':26s}: {t*1e3:7.3f} ms  "
        f"({2*BATCH*b/t/1e9:6.2f} Gs/s raw)")

    def conv_r8(bl):
        T = fc._fourstep_dif_twiddle(r, c, arith.name)
        zz = arith.from_f32(bl[0::2], bl[1::2])
        zz = jax.tree.map(lambda t: t.reshape(t.shape[:-1] + (r, c)), zz)
        zz = fc.fft_dif_rows(zz, r, arith, plan=fc.dif_plan_r8(r))
        zz = arith.mul(zz, T)
        zz = pallas_transpose(zz)
        zz = fc.fft_dif_rows(zz, c, arith, plan=fc.dif_plan_r8(c))
        zz = arith.mul(zz, H2)
        zz = fc.ifft_dit_rows(zz, c, arith, plan=fc.dif_plan_r8(c))
        zz = pallas_transpose(zz)
        zz = arith.mul(zz, jax.tree.map(lambda t: t, arith.conj(T)))
        zz = fc.ifft_dit_rows(zz, r, arith, plan=fc.dif_plan_r8(r))
        zz = jax.tree.map(lambda t: t.reshape(t.shape[:-2] + (b,)), zz)
        re, im = arith.to_f32(zz)
        return jnp.stack([re, im], axis=1).reshape(2 * BATCH, b)

    t = timeit(jax.jit(conv_r8), blocks)
    log(f"{'XLA conv r8 + pallas T':26s}: {t*1e3:7.3f} ms  "
        f"({2*BATCH*b/t/1e9:6.2f} Gs/s raw)")
    # NOTE: conv_r8's H2 layout is r4-plan — output is WRONG numerically;
    # timing only (data-independent). A real r8 engine recomputes H via
    # fourstep_dif_fft_np with the r8 plan.


if __name__ == "__main__":
    main()
