#!/usr/bin/env python
"""Prototype: four-step (2-D) constant-geometry FFT with all butterflies
along the SUBLANE axis (axis -2), lane axis a pure batch.

Hypothesis from fft_micro.py: the granularity-1 lane interleave is ~60% of
the Pease FFT's cost. Here every stage's interleave moves whole rows
(lane-aligned runs), and the only lane-crossing op is ONE transpose.

Factorization B = R*C, n = C*n1 + n2, k = k1 + R*k2:
  phase 1: DFT_R over n1 (axis -2 of [R, C])  -> rows permuted sigma_R
  twiddle: T[i, n2] = W_B^(sigma_R(i) * n2)
  transpose [R, C] -> [C, R]
  phase 2: DFT_C over n2 (axis -2 of [C, R])  -> rows permuted sigma_C
Output layout Y[j, i] = X[sigma_R(i) + R*sigma_C(j)] — fixed permutation,
mirrored on host for H; the inverse consumes it and emits natural order.
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


# ------------------------------------------------------------ host mirrors

@functools.lru_cache(maxsize=32)
def pease_sigma(n: int) -> np.ndarray:
    """Permutation sigma with pease_fft_np(x)[i] == DFT(x)[sigma(i)]."""
    x = np.zeros(n)
    x[1] = 1.0  # X[k] = exp(-2i pi k / n)
    y = fc.pease_fft_np(x)
    sig = np.round(-np.angle(y) * n / (2 * np.pi)).astype(np.int64) % n
    assert len(np.unique(sig)) == n
    return sig


@functools.lru_cache(maxsize=8)
def _twiddle2_np(r: int, c: int) -> np.ndarray:
    sig = pease_sigma(r)
    i = sig[:, None].astype(np.float64)
    n2 = np.arange(c, dtype=np.float64)[None, :]
    return np.exp(-2j * np.pi * i * n2 / (r * c))


def pease2_fft_np(x64: np.ndarray, r: int, c: int) -> np.ndarray:
    """Host float64 mirror of the device four-step layout: [.., B] -> [.., C, R]."""
    a = np.asarray(x64, complex).reshape(x64.shape[:-1] + (r, c))
    ahat = np.swapaxes(fc.pease_fft_np(np.swapaxes(a, -1, -2)), -1, -2)
    m = ahat * _twiddle2_np(r, c)
    return np.swapaxes(fc.pease_fft_np(m), -1, -2)


# --------------------------------------------------- device row-axis pease

@functools.lru_cache(maxsize=64)
def _pease_tables_rows(n: int, arith_name: str):
    """Twiddles shaped [q, 1] to broadcast over the lane batch."""
    arith = ARITH_F32 if arith_name == "f32" else ARITH_DF64
    w2, w4 = fc._pease_tables_np(n)
    w2r = None if w2 is None else arith.wrap_np(w2[:, None])
    w4r = None if w4 is None else arith.wrap_np(w4[..., None])
    return w2r, w4r


def fft_pease_rows(z, n: int, arith):
    """Pease FFT along axis -2 of [..., n, V] (permuted row order out)."""
    w2, w4 = _pease_tables_rows(n, arith.name)
    has_r2, dones = fc._pease_plan(n)
    shp = lambda t: t.shape[:-2] + (n, t.shape[-1])

    if has_r2:
        q = n // 2
        a = _tmap(lambda t: t[..., :q, :], z)
        b = _tmap(lambda t: t[..., q:, :], z)
        even = arith.add(a, b)
        odd = arith.mul(arith.sub(a, b), w2)
        z = _tmap(lambda e, o: jnp.stack([e, o], axis=-2).reshape(shp(e)),
                  even, odd)

    if dones:
        q = n // 4

        def body(s, x):
            ws = fc._index_stage(w4, s)  # [3, q, 1]
            a = _tmap(lambda t: t[..., 0 * q : 1 * q, :], x)
            b = _tmap(lambda t: t[..., 1 * q : 2 * q, :], x)
            c = _tmap(lambda t: t[..., 2 * q : 3 * q, :], x)
            d = _tmap(lambda t: t[..., 3 * q : 4 * q, :], x)
            e0, e1 = arith.add(a, c), arith.sub(a, c)
            e2 = arith.add(b, d)
            e3 = arith.mul_neg_i(arith.sub(b, d))
            r0 = arith.add(e0, e2)
            r1 = arith.mul(arith.add(e1, e3), fc._row(ws, 0))
            r2 = arith.mul(arith.sub(e0, e2), fc._row(ws, 1))
            r3 = arith.mul(arith.sub(e1, e3), fc._row(ws, 2))
            return _tmap(
                lambda p0, p1, p2, p3: jnp.stack(
                    [p0, p1, p2, p3], axis=-2).reshape(shp(p0)),
                r0, r1, r2, r3)

        z = jax.lax.fori_loop(0, len(dones), body, z)
    return z


def ifft_pease_rows(y, n: int, arith):
    """Inverse of fft_pease_rows (permuted rows in, natural rows out)."""
    w2, w4 = _pease_tables_rows(n, arith.name)
    has_r2, dones = fc._pease_plan(n)

    if dones:
        q = n // 4
        S = len(dones)

        def body(i, x):
            ws = fc._index_stage(w4, S - 1 - i)
            v = _tmap(lambda t: t.reshape(t.shape[:-2] + (q, 4, t.shape[-1])), x)
            u0 = _tmap(lambda t: t[..., 0, :], v)
            u1 = arith.mul(_tmap(lambda t: t[..., 1, :], v),
                           arith.conj(fc._row(ws, 0)))
            u2 = arith.mul(_tmap(lambda t: t[..., 2, :], v),
                           arith.conj(fc._row(ws, 1)))
            u3 = arith.mul(_tmap(lambda t: t[..., 3, :], v),
                           arith.conj(fc._row(ws, 2)))
            e0, e2m = arith.add(u0, u2), arith.sub(u0, u2)
            e1, e3m = arith.add(u1, u3), arith.sub(u1, u3)
            ie3m = arith.mul_neg_i(arith.mul_pow2(e3m, -1.0))
            return _tmap(
                lambda p0, p1, p2, p3: jnp.concatenate(
                    [p0, p1, p2, p3], axis=-2),
                arith.add(e0, e1), arith.add(e2m, ie3m),
                arith.sub(e0, e1), arith.sub(e2m, ie3m))

        y = jax.lax.fori_loop(0, S, body, y)

    if has_r2:
        q = n // 2
        v = _tmap(lambda t: t.reshape(t.shape[:-2] + (q, 2, t.shape[-1])), y)
        e = _tmap(lambda t: t[..., 0, :], v)
        o = arith.mul(_tmap(lambda t: t[..., 1, :], v), arith.conj(w2))
        y = _tmap(lambda p, qq: jnp.concatenate([p, qq], axis=-2),
                  arith.add(e, o), arith.sub(e, o))

    return arith.mul_pow2(y, 1.0 / n)


# ----------------------------------------------------------- 2-D composite

@functools.lru_cache(maxsize=8)
def _twiddle2(r: int, c: int, arith_name: str):
    arith = ARITH_F32 if arith_name == "f32" else ARITH_DF64
    return arith.wrap_np(_twiddle2_np(r, c))


def fft_pease2(z, r: int, c: int, arith):
    """[.., B] complex -> [.., C, R] permuted-layout spectrum."""
    z = _tmap(lambda t: t.reshape(t.shape[:-1] + (r, c)), z)
    z = fft_pease_rows(z, r, arith)
    z = arith.mul(z, _twiddle2(r, c, arith.name))
    z = _tmap(lambda t: jnp.swapaxes(t, -1, -2), z)
    return fft_pease_rows(z, c, arith)


def ifft_pease2(y, r: int, c: int, arith):
    """[.., C, R] permuted-layout spectrum -> [.., B] natural complex."""
    y = ifft_pease_rows(y, c, arith)
    y = _tmap(lambda t: jnp.swapaxes(t, -1, -2), y)
    y = arith.mul(y, arith.conj(_twiddle2(r, c, arith.name)))
    y = ifft_pease_rows(y, r, arith)
    return _tmap(lambda t: t.reshape(t.shape[:-2] + (r * c,)), y)


def conv2_real_blocks(blocks, H2, r, c, arith):
    nb, b = blocks.shape
    z = arith.from_f32(blocks[0::2], blocks[1::2])
    Z = fft_pease2(z, r, c, arith)
    Y = arith.mul(Z, H2)
    y = ifft_pease2(Y, r, c, arith)
    re, im = arith.to_f32(y)
    return jnp.stack([re, im], axis=1).reshape(nb, b)


# ------------------------------------------------------------------ driver

def _fence(y):
    leaf = jax.tree.leaves(y)[0]
    np.asarray(leaf.reshape(-1)[:8])


def timeit(fn, *args, reps=6):
    _fence(fn(*args))
    t0 = time.perf_counter()
    y = None
    for _ in range(reps):
        y = fn(*args)
    _fence(y)
    return (time.perf_counter() - t0) / reps


def main():
    B = 1 << 19
    nbreal = 32
    rng = np.random.default_rng(0)
    log(f"device: {jax.devices()[0]}")

    # --- correctness: small size, vs numpy circular convolution
    for (r, c) in ((64, 32),):
        n = r * c
        x = rng.standard_normal((4, n)).astype(np.float32)
        h = rng.standard_normal(n)
        H = np.fft.fft(h)
        want = np.fft.ifft(np.fft.fft(x.astype(np.float64)) * H).real
        H2 = pease2_fft_np(h, r, c)
        for arith, tag, tol in ((ARITH_DF64, "df64", 2e-6), (ARITH_F32, "f32", 2e-4)):
            got = np.asarray(conv2_real_blocks(
                jnp.asarray(x), jax.tree.map(jnp.asarray, arith.wrap_np(H2)),
                r, c, arith))
            err = np.abs(got - want).max() / np.abs(want).max()
            log(f"correctness {tag} (R={r},C={c}): rel err {err:.2e}")
            assert err < tol, (tag, err)

    # --- speed at production size
    blocks = jnp.asarray(rng.standard_normal((nbreal, B)), jnp.float32)
    nsamp = nbreal * B
    for (r, c) in ((2048, 256), (1024, 512), (512, 1024)):
        H2 = pease2_fft_np(rng.standard_normal(B), r, c)
        for arith, tag in ((ARITH_DF64, "df64"), (ARITH_F32, "f32")):
            H2a = jax.tree.map(jnp.asarray, arith.wrap_np(H2))
            f = jax.jit(functools.partial(
                conv2_real_blocks, r=r, c=c, arith=arith))
            t0 = time.perf_counter()
            dt = timeit(f, blocks, H2a)
            log(f"conv2 {tag} R={r:5d} C={c:5d}: {dt*1e3:8.2f} ms  "
                f"{dt/nsamp*1e9:6.3f} ns/sample   "
                f"(compile+warm {time.perf_counter()-t0-6*dt:.1f}s)")


if __name__ == "__main__":
    main()
