#!/usr/bin/env python
"""Locate the fused kernel's VMEM copy floor (round 3).

fused_phase_decomp measured the no-arithmetic 'copy' variant of the
fused conv kernel at 2.611 ms per 16-block chunk (B=2^18, df64 planes)
— 73% of the full kernel's 3.555 ms, and an effective ~98 GB/s of VMEM
traffic, ~40x below the VPU's load/store bandwidth. This probe times
isolated data-movement variants to find the slow construct:

  v_copy      the production copy path: tile-store zA, whole-plane
              copy zA->zB, tile load+store zB, copy back, tile load
  v_tr        same but the plane copies are swapaxes (production full)
  v_notiles   no tile loops: whole-plane stores/loads (zA[k] = pack,
              copies, unpack) — measures whether dynamic lane-slice
              tiling is the slow part
  v_1buf      tile loops but ONE scratch round-trip: phase-A tiles
              store zA, phase-C tiles load zA (no copies, no phase B)
  v_passthru  o_ref = x_ref planes only (the pallas_call + grid floor)
  v_hint      v_copy with pl.multiple_of alignment hints on lane slices
  v_lt256/512 v_copy at LANE_TILE 256 / 512

All per chunk of 16 real blocks at B=2^18 (grid=8 complex blocks),
4 f32 planes per complex value (df64 layout). Data device-generated.
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
NPLANES = 4


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


def make_variant(b, mode, lt=128, hint=False):
    r, c = fc.fourstep_split(b)
    lt = min(lt, c)

    def kernel(x_ref, o_ref, zA, zB):
        def sl_of(j, width):
            off = j * width
            if hint:
                off = pl.multiple_of(off, width)
            return pl.ds(off, width)

        if mode == "passthru":
            for k in range(2):
                o_ref[0, k] = x_ref[0, k]
            return

        if mode == "notiles":
            # planes: re0, re1, zeros lo planes (pack semantics, no tiles)
            zA[0] = x_ref[0, 0]
            zA[1] = x_ref[0, 1]
            zA[2] = jnp.zeros_like(x_ref[0, 0])
            zA[3] = jnp.zeros_like(x_ref[0, 0])
            for k in range(NPLANES):
                zB[k] = zA[k]
            for k in range(NPLANES):
                zA[k] = zB[k]
            o_ref[0, 0] = zA[0]
            o_ref[0, 1] = zA[1]
            return

        # tile-looped variants
        def phase_a(j, carry):
            sl = sl_of(j, lt)
            x0 = x_ref[0, 0, :, sl]
            x1 = x_ref[0, 1, :, sl]
            zA[0, :, sl] = x0
            zA[1, :, sl] = x1
            zA[2, :, sl] = jnp.zeros_like(x0)
            zA[3, :, sl] = jnp.zeros_like(x0)
            return carry

        jax.lax.fori_loop(0, c // lt, phase_a, 0)

        if mode in ("copy", "tr"):
            for k in range(NPLANES):
                zB[k] = (jnp.swapaxes(zA[k], 0, 1) if mode == "tr"
                         else zA[k])
            lt_r = lt

            def phase_b(j, carry):
                sl = sl_of(j, lt_r)
                for k in range(NPLANES):
                    zB[k, :, sl] = zB[k, :, sl]
                return carry

            jax.lax.fori_loop(0, r // lt_r, phase_b, 0)
            for k in range(NPLANES):
                zA[k] = (jnp.swapaxes(zB[k], 0, 1) if mode == "tr"
                         else zB[k])

        def phase_c(j, carry):
            sl = sl_of(j, lt)
            o_ref[0, 0, :, sl] = zA[0, :, sl]
            o_ref[0, 1, :, sl] = zA[1, :, sl]
            return carry

        jax.lax.fori_loop(0, c // lt, phase_c, 0)

    shapes = {"copy": 1, "tr": 1, "notiles": 1, "1buf": 1, "passthru": 1}
    assert mode in shapes

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(x.shape[0],),
            in_specs=[pl.BlockSpec((1, 2, r, c), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 2, r, c), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            scratch_shapes=[
                pltpu.VMEM((NPLANES, r, c), jnp.float32),
                pltpu.VMEM((NPLANES, c, r), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT),
        )(x)

    return run


def main():
    b = 1 << 18
    chunk = 16
    r, c = fc.fourstep_split(b)
    x = jax.jit(lambda: 0.3 * jnp.sin(
        0.37 * jnp.arange((chunk // 2) * 2 * b, dtype=jnp.float32)
    ).reshape(chunk // 2, 2, r, c))()
    fence(x)
    nsamp = chunk * b

    cases = [
        ("passthru", dict(mode="passthru")),
        ("v_1buf", dict(mode="1buf")),
        ("v_copy", dict(mode="copy")),
        ("v_tr", dict(mode="tr")),
        ("v_notiles", dict(mode="notiles")),
        ("v_hint", dict(mode="copy", hint=True)),
        ("v_lt256", dict(mode="copy", lt=256)),
        ("v_lt512", dict(mode="copy", lt=512)),
    ]
    for name, kw in cases:
        try:
            run = make_variant(b, **kw)
            t = timeit(run, x)
            log(f"{name:10s}: {t*1e3:8.3f} ms  ({nsamp/t/1e6:8.1f} Ms/s)")
        except Exception as e:  # noqa: BLE001 — sweep must survive variants
            log(f"{name:10s}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
