#!/usr/bin/env python
"""In-place DIF (fwd) / DIT (inv) radix-4 row transforms: all stage
accesses are contiguous row blocks — no interleave writes (Pease) and no
strided deinterleave reads (Pease inverse). Prototype + timing vs Pease.
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


def _tmap(f, *trees):
    return jax.tree.map(f, *trees)


# -------------------------------------------------------------- stage plan

@functools.lru_cache(maxsize=64)
def dif_plan(n: int):
    """Stages outermost-first: optional leading radix-2, then radix-4.
    Returns tuple of ("r2"|"r4", d) with d the intra-group block length."""
    L = n.bit_length() - 1
    stages = []
    if L % 2 == 1:
        stages.append(("r2", n // 2))
        L -= 1
        n //= 2
    while n > 1:
        stages.append(("r4", n // 4))
        n //= 4
    return tuple(stages)


@functools.lru_cache(maxsize=64)
def dif_tables_np(n: int):
    """Per-stage twiddles: r2 -> (w,) [d,1]; r4 -> (w1,w2,w3) [d,1]."""
    out = []
    for kind, d in dif_plan(n):
        j = np.arange(d, dtype=np.float64)[:, None]
        if kind == "r2":
            out.append((np.exp(-1j * np.pi * j / d),))
        else:
            g = 4 * d
            out.append(tuple(
                np.exp(-2j * np.pi * r * j / g) for r in (1, 2, 3)))
    return tuple(out)


def dif_fft_np(x64: np.ndarray) -> np.ndarray:
    """Host float64 mirror (digit-reversed output order), last axis."""
    x = np.asarray(x64, complex).copy()
    n = x.shape[-1]
    tabs = dif_tables_np(n)
    for (kind, d), ws in zip(dif_plan(n), tabs):
        if kind == "r2":
            v = x.reshape(x.shape[:-1] + (-1, 2, d))
            a, b = v[..., 0, :], v[..., 1, :]
            x = np.stack([a + b, (a - b) * ws[0][:, 0]],
                         axis=-2).reshape(x.shape)
        else:
            v = x.reshape(x.shape[:-1] + (-1, 4, d))
            a, b, c, e = (v[..., i, :] for i in range(4))
            t0, t1 = a + c, a - c
            t2, t3 = b + e, -1j * (b - e)
            x = np.stack([
                t0 + t2,
                (t1 + t3) * ws[0][:, 0],
                (t0 - t2) * ws[1][:, 0],
                (t1 - t3) * ws[2][:, 0],
            ], axis=-2).reshape(x.shape)
    return x


@functools.lru_cache(maxsize=32)
def dif_sigma(n: int) -> np.ndarray:
    x = np.zeros(n)
    if n > 1:
        x[1] = 1.0
        y = dif_fft_np(x)
        sig = np.round(-np.angle(y) * n / (2 * np.pi)).astype(np.int64) % n
    else:
        sig = np.zeros(1, np.int64)
    assert len(np.unique(sig)) == n
    return sig


@functools.lru_cache(maxsize=64)
def dif_tables(n: int, arith_name: str):
    arith = ARITH_F32 if arith_name == "f32" else ARITH_DF64
    return tuple(tuple(arith.wrap_np(w) for w in ws)
                 for ws in dif_tables_np(n))


# ----------------------------------------------------------- device (rows)

def fft_dif_rows(z, n: int, arith=ARITH_DF64, tabs=None):
    """In-place DIF along axis -2 of [..., n, V]; digit-reversed row order
    out. Every stage reads/writes contiguous d-row blocks."""
    if tabs is None:
        tabs = dif_tables(n, arith.name)
    for (kind, d), ws in zip(dif_plan(n), tabs):
        shp = jax.tree.leaves(z)[0].shape

        def back(*parts):
            return _tmap(
                lambda *ps: jnp.stack(ps, axis=-3).reshape(shp), *parts)

        if kind == "r2":
            v = _tmap(lambda t: t.reshape(
                t.shape[:-2] + (-1, 2, d, t.shape[-1])), z)
            a = _tmap(lambda t: t[..., 0, :, :], v)
            b = _tmap(lambda t: t[..., 1, :, :], v)
            z = back(arith.add(a, b), arith.mul(arith.sub(a, b), ws[0]))
        else:
            v = _tmap(lambda t: t.reshape(
                t.shape[:-2] + (-1, 4, d, t.shape[-1])), z)
            a = _tmap(lambda t: t[..., 0, :, :], v)
            b = _tmap(lambda t: t[..., 1, :, :], v)
            c = _tmap(lambda t: t[..., 2, :, :], v)
            e = _tmap(lambda t: t[..., 3, :, :], v)
            t0, t1 = arith.add(a, c), arith.sub(a, c)
            t2 = arith.add(b, e)
            t3 = arith.mul_neg_i(arith.sub(b, e))
            z = back(
                arith.add(t0, t2),
                arith.mul(arith.add(t1, t3), ws[0]),
                arith.mul(arith.sub(t0, t2), ws[1]),
                arith.mul(arith.sub(t1, t3), ws[2]),
            )
    return z


def ifft_dit_rows(y, n: int, arith=ARITH_DF64, tabs=None):
    """Inverse: digit-reversed rows in, natural out, 1/n scaling included."""
    if tabs is None:
        tabs = dif_tables(n, arith.name)
    for (kind, d), ws in zip(reversed(dif_plan(n)), reversed(tabs)):
        shp = jax.tree.leaves(y)[0].shape

        def back(*parts):
            return _tmap(
                lambda *ps: jnp.stack(ps, axis=-3).reshape(shp), *parts)

        if kind == "r2":
            v = _tmap(lambda t: t.reshape(
                t.shape[:-2] + (-1, 2, d, t.shape[-1])), y)
            a = _tmap(lambda t: t[..., 0, :, :], v)
            b = arith.mul(_tmap(lambda t: t[..., 1, :, :], v),
                          arith.conj(ws[0]))
            y = back(arith.add(a, b), arith.sub(a, b))
        else:
            v = _tmap(lambda t: t.reshape(
                t.shape[:-2] + (-1, 4, d, t.shape[-1])), y)
            u0 = _tmap(lambda t: t[..., 0, :, :], v)
            u1 = arith.mul(_tmap(lambda t: t[..., 1, :, :], v),
                           arith.conj(ws[0]))
            u2 = arith.mul(_tmap(lambda t: t[..., 2, :, :], v),
                           arith.conj(ws[1]))
            u3 = arith.mul(_tmap(lambda t: t[..., 3, :, :], v),
                           arith.conj(ws[2]))
            s0, d0 = arith.add(u0, u2), arith.sub(u0, u2)
            s1, d1 = arith.add(u1, u3), arith.sub(u1, u3)
            id1 = arith.mul_neg_i(arith.mul_pow2(d1, -1.0))  # i * d1
            y = back(
                arith.add(s0, s1), arith.add(d0, id1),
                arith.sub(s0, s1), arith.sub(d0, id1),
            )
    return arith.mul_pow2(y, 1.0 / n)


# ------------------------------------------------------------------ checks

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


def main():
    rng = np.random.default_rng(0)

    # correctness: host mirror is a permuted DFT; device fwd matches mirror;
    # fwd->inv roundtrip is identity.
    for n in (8, 64, 512):
        z = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        sig = dif_sigma(n)
        np.testing.assert_allclose(
            dif_fft_np(z), np.fft.fft(z)[sig], rtol=1e-9, atol=1e-9)
    log("host mirror OK")

    arith = ARITH_DF64
    n, v = 512, 256
    xr = rng.standard_normal((2, n, v)).astype(np.float32)
    xi = rng.standard_normal((2, n, v)).astype(np.float32)
    z = arith.from_f32(jnp.asarray(xr), jnp.asarray(xi))
    Z = jax.jit(lambda t: fft_dif_rows(t, n, arith))(z)
    got = np.asarray(Z.re.hi + Z.re.lo) + 1j * np.asarray(Z.im.hi + Z.im.lo)
    want = dif_fft_np((xr + 1j * xi).transpose(0, 2, 1)).transpose(0, 2, 1)
    err = np.abs(got - want).max() / np.abs(want).max()
    log(f"device fwd vs mirror: rel err {err:.2e}")
    assert err < 1e-6
    back = jax.jit(lambda t: ifft_dit_rows(fft_dif_rows(t, n, arith), n, arith))(z)
    err = np.abs(np.asarray(back.re.hi + back.re.lo) - xr).max()
    log(f"roundtrip: abs err {err:.2e}")
    assert err < 1e-6
    log("device OK\n")

    # ---- timing vs pease rows at production shapes
    for (nn, vv, batch) in ((1024, 512, 4), (512, 1024, 4)):
        xr = rng.standard_normal((batch, nn, vv)).astype(np.float32)
        z = arith.from_f32(jnp.asarray(xr), jnp.asarray(xr))
        nsamp = batch * nn * vv * 2
        f1 = jax.jit(functools.partial(fft_dif_rows, n=nn, arith=arith))
        f2 = jax.jit(functools.partial(fc.fft_pease_rows, n=nn, arith=arith))
        f3 = jax.jit(functools.partial(ifft_dit_rows, n=nn, arith=arith))
        f4 = jax.jit(functools.partial(fc.ifft_pease_rows, n=nn, arith=arith))
        for name, f in (("dif fwd", f1), ("pease fwd", f2),
                        ("dit inv", f3), ("pease inv", f4)):
            dt = timeit(f, z)
            log(f"[{nn}x{vv}] {name:10s}: {dt*1e3:7.2f} ms "
                f"{dt/nsamp*1e9:6.3f} ns/cplx")


if __name__ == "__main__":
    main()
