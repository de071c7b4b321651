#!/usr/bin/env python
"""Phase decomposition of the fused conv kernel on hardware (round 3).

The round-2 roofline shows df64r at 67% and f32 at 43% of the VPU
arithmetic bound — consistent with a fixed per-block overhead of
~1.4x the f32 arithmetic time. This probe times the fused kernel with
phases selectively disabled to locate that overhead:

  full        pack + fwdR + T + transpose + fwdC*H*invC + transpose
              + conjT + invR + unpack   (the production kernel)
  no_tr       both [r,c]<->[c,r] plane transposes removed (phase B runs
              on the untransposed planes — wrong math, same op count)
  ac_only     phases A and C only (no transposes, no phase B)
  b_only      phase B only (no A/C butterflies; pack/unpack kept)
  copy        pack + store + load + unpack only (the VMEM copy floor)

Everything stays on device (sin(iota) blocks); only 8-sample fences
cross the tunnel. Times are per chunk of 16 real blocks at B=2^18.
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
from audio_fir_filter_tpu.ops import pallas_fft as pf
from audio_fir_filter_tpu.ops.fft_core import ARITH_DF64, ARITH_F32

VMEM_LIMIT = 100 * 1024 * 1024


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fence(y):
    np.asarray(jax.tree.leaves(y)[0].reshape(-1)[:8])


def timeit(fn, *args, reps=10):
    fence(fn(*args))
    t0 = time.perf_counter()
    y = None
    for _ in range(reps):
        y = fn(*args)
    fence(y)
    return (time.perf_counter() - t0) / reps


def make_variant(b, arith, *, do_a, do_tr, do_b, do_c):
    karith = pf._kernel_arith(arith)
    r, c = fc.fourstep_split(b)
    rng = np.random.default_rng(0)
    h = np.zeros(b)
    h[:38401] = rng.standard_normal(38401) / 196.0
    H2 = pf.wrap_spectrum(pf.kernel_spectrum_np(h, b, arith), arith)
    tabs = pf.conv_tables(b, karith.name)
    cc = dict(tabs, H=H2)
    cleaves, cdef = jax.tree.flatten(cc)
    ncst = len(cleaves)
    zdef = jax.tree.structure(karith.from_f32(jnp.zeros(()), jnp.zeros(())))
    nplanes = zdef.num_leaves
    lt = min(pf.LANE_TILE, c)

    def kernel(x_ref, *refs):
        crefs = refs[:ncst]
        o_ref, zA, zB = refs[ncst], refs[ncst + 1], refs[ncst + 2]
        cc_r = jax.tree.unflatten(cdef, list(crefs))
        tw_r = jax.tree.map(lambda rf: rf[...], cc_r["tw_r"])
        tw_c = jax.tree.map(lambda rf: rf[...], cc_r["tw_c"])

        def store(ref, sl, z):
            for k, leaf in enumerate(jax.tree.leaves(z)):
                ref[k, :, sl] = leaf

        def load(ref, sl):
            return jax.tree.unflatten(
                zdef, [ref[k, :, sl] for k in range(nplanes)])

        def phase_a(j, carry):
            sl = pl.ds(j * lt, lt)
            x0 = x_ref[0, 0, :, sl]
            x1 = x_ref[0, 1, :, sl]
            z = karith.from_f32(x0, x1)
            if do_a:
                z = pf._run_fwd(z, r, tw_r, karith)
                z = karith.mul_const(
                    z, jax.tree.map(lambda rf: rf[:, sl], cc_r["T"]))
            store(zA, sl, z)
            return carry

        jax.lax.fori_loop(0, c // lt, phase_a, 0)

        if do_tr:
            for k in range(nplanes):
                zB[k] = jnp.swapaxes(zA[k], 0, 1)
        else:
            for k in range(nplanes):
                zB[k] = zA[k]

        if do_b:
            lt_r = min(pf.LANE_TILE, r)

            def phase_b(j, carry):
                sl = pl.ds(j * lt_r, lt_r)
                z = load(zB, sl)
                z = pf._run_fwd(z, c, tw_c, karith)
                z = karith.mul_const(
                    z, jax.tree.map(lambda rf: rf[:, sl], cc_r["H"]))
                z = pf._run_inv(z, c, tw_c, karith)
                store(zB, sl, z)
                return carry

            jax.lax.fori_loop(0, r // lt_r, phase_b, 0)

        if do_tr:
            for k in range(nplanes):
                zA[k] = jnp.swapaxes(zB[k], 0, 1)
        else:
            for k in range(nplanes):
                zA[k] = zB[k]

        def phase_c(j, carry):
            sl = pl.ds(j * lt, lt)
            z = load(zA, sl)
            if do_c:
                z = karith.mul_const(
                    z, karith.conj_const(
                        jax.tree.map(lambda rf: rf[:, sl], cc_r["T"])))
                z = pf._run_inv(z, r, tw_r, karith)
                z = karith.mul_pow2(z, 1.0 / b)
            re, im = karith.to_f32(z)
            o_ref[0, 0, :, sl] = re
            o_ref[0, 1, :, sl] = im
            return carry

        jax.lax.fori_loop(0, c // lt, phase_c, 0)

    cspecs = [pl.BlockSpec(cl.shape,
                           lambda *i, _nd=cl.ndim: (0,) * _nd,
                           memory_space=pltpu.VMEM) for cl in cleaves]

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(x.shape[0],),
            in_specs=[pl.BlockSpec((1, 2, r, c), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)] + cspecs,
            out_specs=pl.BlockSpec((1, 2, r, c), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            scratch_shapes=[
                pltpu.VMEM((nplanes, r, c), jnp.float32),
                pltpu.VMEM((nplanes, c, r), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT),
        )(x, *cleaves)

    return run


def main():
    b = 1 << 18
    chunk = 128  # large grid: ~25 ms device time swamps the ~1.4-2.9 ms
                 # per-call tunnel floor (dispatch_floor_probe) that made
                 # the chunk-16 numbers unusable for phase attribution
    r, c = fc.fourstep_split(b)
    x = jax.jit(lambda: 0.3 * jnp.sin(
        0.37 * jnp.arange((chunk // 2) * 2 * b, dtype=jnp.float32)
    ).reshape(chunk // 2, 2, r, c))()
    fence(x)
    nsamp = chunk * b

    variants = {
        "full":    dict(do_a=True, do_tr=True, do_b=True, do_c=True),
        "no_tr":   dict(do_a=True, do_tr=False, do_b=True, do_c=True),
        "ac_only": dict(do_a=True, do_tr=False, do_b=False, do_c=True),
        "b_only":  dict(do_a=False, do_tr=True, do_b=True, do_c=False),
        "copy":    dict(do_a=False, do_tr=False, do_b=False, do_c=False),
    }
    for name, arith in (("df64", ARITH_DF64),):
        times = {}
        for vn, flags in variants.items():
            run = make_variant(b, arith, **flags)
            t = timeit(run, x)
            times[vn] = t
            log(f"{name} {vn:8s}: {t*1e3:8.3f} ms  "
                f"({nsamp/t/1e6:8.1f} Ms/s)")
        tr_cost = times["full"] - times["no_tr"]
        b_cost = times["no_tr"] - times["ac_only"]
        log(f"{name} -> transposes {tr_cost*1e3:.3f} ms, "
            f"phase-B arith {b_cost*1e3:.3f} ms, "
            f"A+C arith {(times['ac_only']-times['copy'])*1e3:.3f} ms, "
            f"copy floor {times['copy']*1e3:.3f} ms")


if __name__ == "__main__":
    main()
