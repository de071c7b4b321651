#!/usr/bin/env python
"""Microbenchmark: decompose the overlap-save hot loop's cost on real TPU.

Variants isolate the three cost hypotheses:
  - arithmetic (df64 vs f32 butterflies/twiddles)
  - data movement (the granularity-1 interleave each Pease stage)
  - HBM traffic (fori_loop stage round trips)

Each variant runs the same [nb/2, B] complex workload as one bench segment
and reports ns/sample so numbers are directly comparable to the headline
(136.7 Msamples/s == 7.3 ns/sample).
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from audio_fir_filter_tpu.ops import fft_core as fc
from audio_fir_filter_tpu.ops.fft_core import ARITH_DF64, ARITH_F32


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _fence(y):
    """This backend's block_until_ready returns early; fetching a few
    samples of the (in-order) last result is the reliable barrier."""
    leaf = jax.tree.leaves(y)[0]
    np.asarray(leaf.reshape(-1)[:8])


def timeit(fn, *args, reps=6):
    _fence(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    y = None
    for _ in range(reps):
        y = fn(*args)
    _fence(y)
    return (time.perf_counter() - t0) / reps


def _tmap(f, *trees):
    return jax.tree.map(f, *trees)


# --- variant: pease loop with twiddle multiplies REMOVED (relayout+add only)
def fft_pease_notwiddle(z, n, arith):
    has_r2, dones = fc._pease_plan(n)
    batch = jax.tree.leaves(z)[0].shape[:-1]
    if has_r2:
        q = n // 2
        a = _tmap(lambda t: t[..., :q], z)
        b = _tmap(lambda t: t[..., q:], z)
        even = arith.add(a, b)
        odd = arith.sub(a, b)
        z = _tmap(lambda e, o: jnp.stack([e, o], axis=-1).reshape(batch + (n,)),
                  even, odd)
    if dones:
        q = n // 4

        def body(s, x):
            a = _tmap(lambda t: t[..., :q], x)
            b = _tmap(lambda t: t[..., q:2*q], x)
            c = _tmap(lambda t: t[..., 2*q:3*q], x)
            d = _tmap(lambda t: t[..., 3*q:], x)
            e0, e1 = arith.add(a, c), arith.sub(a, c)
            e2 = arith.add(b, d)
            e3 = arith.mul_neg_i(arith.sub(b, d))
            r0 = arith.add(e0, e2)
            r1 = arith.add(e1, e3)
            r2 = arith.sub(e0, e2)
            r3 = arith.sub(e1, e3)
            return _tmap(
                lambda p0, p1, p2, p3: jnp.stack(
                    [p0, p1, p2, p3], axis=-1).reshape(batch + (n,)),
                r0, r1, r2, r3)

        z = jax.lax.fori_loop(0, len(dones), body, z)
    return z


# --- variant: pease loop with interleave REPLACED by concat (arith only)
def fft_pease_nointerleave(z, n, arith):
    has_r2, dones = fc._pease_plan(n)
    w2, w4 = fc._pease_tables(n, arith.name)
    if has_r2:
        q = n // 2
        a = _tmap(lambda t: t[..., :q], z)
        b = _tmap(lambda t: t[..., q:], z)
        even = arith.add(a, b)
        odd = arith.mul(arith.sub(a, b), w2)
        z = _tmap(lambda e, o: jnp.concatenate([e, o], axis=-1), even, odd)
    if dones:
        q = n // 4

        def body(s, x):
            ws = fc._index_stage(w4, s)
            a = _tmap(lambda t: t[..., :q], x)
            b = _tmap(lambda t: t[..., q:2*q], x)
            c = _tmap(lambda t: t[..., 2*q:3*q], x)
            d = _tmap(lambda t: t[..., 3*q:], x)
            e0, e1 = arith.add(a, c), arith.sub(a, c)
            e2 = arith.add(b, d)
            e3 = arith.mul_neg_i(arith.sub(b, d))
            r0 = arith.add(e0, e2)
            r1 = arith.mul(arith.add(e1, e3), fc._row(ws, 0))
            r2 = arith.mul(arith.sub(e0, e2), fc._row(ws, 1))
            r3 = arith.mul(arith.sub(e1, e3), fc._row(ws, 2))
            return _tmap(
                lambda p0, p1, p2, p3: jnp.concatenate(
                    [p0, p1, p2, p3], axis=-1),
                r0, r1, r2, r3)

        z = jax.lax.fori_loop(0, len(dones), body, z)
    return z


def main():
    B = 1 << 19
    nbc = 16  # complex rows == 32 real blocks (one bench segment)
    dev = jax.devices()[0]
    log(f"device: {dev}; B=2^19, rows={nbc}")
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((nbc, B)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((nbc, B)), jnp.float32)
    nsamp = nbc * 2 * B  # real samples represented

    results = {}

    def report(name, dt):
        results[name] = dt
        log(f"{name:34s} {dt*1e3:8.2f} ms  {dt/nsamp*1e9:7.3f} ns/sample")

    for arith, tag in ((ARITH_DF64, "df64"), (ARITH_F32, "f32")):
        z = arith.from_f32(xr, xi)

        f_fwd = jax.jit(functools.partial(fc.fft_pease, n=B, arith=arith))
        report(f"pease fwd {tag}", timeit(f_fwd, z))

        f_nt = jax.jit(functools.partial(fft_pease_notwiddle, n=B, arith=arith))
        report(f"pease fwd {tag} NO-TWIDDLE", timeit(f_nt, z))

        f_ni = jax.jit(functools.partial(fft_pease_nointerleave, n=B, arith=arith))
        report(f"pease fwd {tag} NO-INTERLEAVE", timeit(f_ni, z))

        Hp = arith.wrap_np(np.exp(1j * rng.standard_normal(B)))
        f_conv = jax.jit(lambda b_, H_, ar=arith: fc.pease_conv_real_blocks(b_, H_, ar))
        blocks = jnp.concatenate([xr, xi], 0)  # [32, B] real
        report(f"full conv {tag}", timeit(f_conv, blocks, Hp))

    log("\nratios:")
    d = results
    if "pease fwd df64" in d and "pease fwd f32" in d:
        log(f"  df64/f32 fwd: {d['pease fwd df64']/d['pease fwd f32']:.2f}x")
    for tag in ("df64", "f32"):
        t = d.get(f"pease fwd {tag}")
        nt = d.get(f"pease fwd {tag} NO-TWIDDLE")
        ni = d.get(f"pease fwd {tag} NO-INTERLEAVE")
        if t and nt and ni:
            log(f"  {tag}: twiddle share {(t-nt)/t:5.1%}  "
                f"interleave share {(t-ni)/t:5.1%}")


if __name__ == "__main__":
    main()
