#!/usr/bin/env python
"""Per-kernel timing of the Pallas conv path vs the XLA fourstep engine."""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from audio_fir_filter_tpu.ops import fft_core as fc
from audio_fir_filter_tpu.ops import pallas_fft as pf
from audio_fir_filter_tpu.ops.fft_core import ARITH_DF64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _fence(y):
    np.asarray(jax.tree.leaves(y)[0].reshape(-1)[:8])


def timeit(fn, *args, reps=10):
    _fence(fn(*args))
    t0 = time.perf_counter()
    y = None
    for _ in range(reps):
        y = fn(*args)
    _fence(y)
    return (time.perf_counter() - t0) / reps


def tiled_call(body, z, consts, n, tile, lanes_blocked=()):
    """One pallas_call: z leaves [batch, n, V]; consts loaded whole except
    names in lanes_blocked which are blocked [dim0, tile] along lanes."""
    leaves, zdef = jax.tree.flatten(z)
    citems = jax.tree_util.tree_flatten_with_path(consts)[0]
    cdef = jax.tree.structure(consts)
    cleaves = [cl for _, cl in citems]
    batch, nn, v = leaves[0].shape
    nz, ncst = len(leaves), len(cleaves)

    def kernel(*refs):
        zrefs, crefs = refs[:nz], refs[nz:nz + ncst]
        orefs = refs[nz + ncst:]
        zt = jax.tree.unflatten(zdef, [rf[0] for rf in zrefs])
        cc = jax.tree.unflatten(cdef, [rf[...] for rf in crefs])
        out = body(zt, cc)
        for rf, leaf in zip(orefs, jax.tree.leaves(out)):
            rf[0] = leaf

    zspec = pl.BlockSpec((1, nn, tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)
    cspecs = []
    for path, cl in citems:
        name = path[0].key if hasattr(path[0], "key") else None
        if name in lanes_blocked:
            cspecs.append(pl.BlockSpec((cl.shape[0], tile),
                                       lambda i, j: (0, j),
                                       memory_space=pltpu.VMEM))
        else:
            cspecs.append(pl.BlockSpec(cl.shape,
                                       lambda i, j, _nd=cl.ndim: (0,) * _nd,
                                       memory_space=pltpu.VMEM))
    return jax.tree.unflatten(zdef, pl.pallas_call(
        kernel,
        grid=(batch, max(1, v // tile)),
        in_specs=[zspec] * nz + cspecs,
        out_specs=[zspec] * nz,
        out_shape=[jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=pf._VMEM_LIMIT),
    )(*leaves, *cleaves))


def main():
    B = 1 << 19
    arith = ARITH_DF64
    r, c = fc.fourstep_split(B)
    tabs = pf.conv_tables(B, arith.name)
    rng = np.random.default_rng(0)
    nbc = 4  # complex rows (== 8 real blocks)
    nsamp = nbc * 2 * B
    log(f"B=2^19 R={r} C={c}, batch {nbc} complex rows")

    zr = jnp.asarray(rng.standard_normal((nbc, r, c)), jnp.float32)
    zi = jnp.asarray(rng.standard_normal((nbc, r, c)), jnp.float32)
    z = arith.from_f32(zr, zi)
    zt_r = jnp.asarray(rng.standard_normal((nbc, c, r)), jnp.float32)
    zt = arith.from_f32(zt_r, zt_r)

    H2 = jax.tree.map(
        jnp.asarray,
        arith.wrap_np(fc.fourstep_fft_np(rng.standard_normal(B), r, c)))

    w2r, w4r, w2c, w4c = tabs["w2_r"], tabs["w4_r"], tabs["w2_c"], tabs["w4_c"]

    # K1: phase-1 fwd + T
    c1 = {"w4": w4r, "T": tabs["T"]}
    if w2r is not None:
        c1["w2"] = w2r

    def k1(ztile, cc):
        y = pf._rows_fwd(ztile, r, arith, cc.get("w2"), cc["w4"])
        return arith.mul(y, cc["T"])

    f1 = jax.jit(lambda zz: tiled_call(k1, zz, c1, r, 128, ("T",)))
    log(f"K1 (p1 fwd + T)    : {timeit(f1, z)*1e3:7.2f} ms")

    # transpose
    ft = jax.jit(lambda zz: jax.tree.map(lambda t: jnp.swapaxes(t, -1, -2), zz))
    log(f"transpose          : {timeit(ft, z)*1e3:7.2f} ms")

    # K2 fused
    c2 = {"w4": w4c, "H": H2}
    if w2c is not None:
        c2["w2"] = w2c

    def k2(ztile, cc):
        y = pf._rows_fwd(ztile, c, arith, cc.get("w2"), cc["w4"])
        y = arith.mul(y, cc["H"])
        return pf._rows_inv(y, c, arith, cc.get("w2"), cc["w4"])

    f2 = jax.jit(lambda zz: tiled_call(k2, zz, c2, c, 128, ("H",)))
    log(f"K2 (p2 f*H*inv)    : {timeit(f2, zt)*1e3:7.2f} ms")

    # K2a: only forward part (isolate)
    def k2a(ztile, cc):
        return pf._rows_fwd(ztile, c, arith, cc.get("w2"), cc["w4"])

    c2a = {"w4": w4c}
    if w2c is not None:
        c2a["w2"] = w2c
    f2a = jax.jit(lambda zz: tiled_call(k2a, zz, c2a, c, 128))
    log(f"K2a (p2 fwd only)  : {timeit(f2a, zt)*1e3:7.2f} ms")

    # K3
    def k3(ztile, cc):
        y = arith.mul(ztile, arith.conj(cc["T"]))
        return pf._rows_inv(y, r, arith, cc.get("w2"), cc["w4"])

    f3 = jax.jit(lambda zz: tiled_call(k3, zz, c1, r, 128, ("T",)))
    log(f"K3 (conjT + p1 inv): {timeit(f3, z)*1e3:7.2f} ms")

    # XLA reference pieces
    fx1 = jax.jit(lambda zz: fc.fft_pease_rows(
        jax.tree.map(lambda t: t, zz), r, arith))
    log(f"XLA p1 fwd (rows)  : {timeit(fx1, z)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
