"""Generic Stockham FFT over pluggable complex arithmetic.

XLA's native FFT op is *unimplemented* on the target TPU backend (probed
empirically: every ``jnp.fft.rfft`` call fails at runtime with
UNIMPLEMENTED), so this framework carries its own FFT for all precisions:

- ``ARITH_F32``:  complex as a (re, im) float32 pair — the fast path.
- ``ARITH_DF64``: complex as a pair of double-floats (:mod:`.df64`) —
  the high-precision path (<= 1 LSB @ 24-bit, BASELINE.md north star).

The algorithm is a radix-2 decimation-in-frequency Stockham autosort FFT:
self-sorting (no bit-reversal gather, which is TPU-hostile), every stage a
pure elementwise butterfly over a [.., eta, s] view — VPU-friendly and fully
fusable by XLA. The stage loop is unrolled at trace time (log2 n stages).
Real transforms use the standard two-for-one packing (pack even/odd samples
into a complex signal of half length, then untangle).

Complex dtypes are never used — TPU complex support is also unreliable on
this backend, and explicit pairs let the same code serve double-float.

Accuracy (measured, fused end-to-end rfft*H->irfft, vs float64 NumPy):
- TPU (target hardware): df64 path = 0.50 ulp32 of the output scale — i.e.
  the unavoidable final float32 rounding; the FFT itself contributes ~1e-12.
  f32 path = ~4.5 ulp32.
- CPU (test backend only): df64 path degrades to ~1.5 ulp32 because XLA:CPU's
  LLVM emitter evaluates fused f32 chains with excess intermediate precision,
  which neutralizes error-free transformations (two_sum compensation terms
  collapse). Verified empirically: materializing any intermediate restores
  0.50 ulp; no XLA flag (--xla_allow_excess_precision=false,
  --xla_cpu_enable_fast_math=false) changes it. CPU tests therefore use a
  relaxed (but still sub-3-LSB@24-bit) tolerance; the 1-LSB@24-bit
  BASELINE.md gate is asserted on TPU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import df64 as dd


def _tmap(f, *trees):
    return jax.tree.map(f, *trees)


# --------------------------------------------------------------- arithmetic

class C32(NamedTuple):
    """Plain complex-as-pair-of-float32 (a JAX pytree)."""

    re: jnp.ndarray
    im: jnp.ndarray


class _ArithF32:
    """Complex ops on C32. Cheap, ~24-bit mantissa."""

    name = "f32"
    T = C32

    @staticmethod
    def wrap_np(z64: np.ndarray):
        z64 = np.asarray(z64, np.complex128)
        return C32(z64.real.astype(np.float32), z64.imag.astype(np.float32))

    @staticmethod
    def from_f32(re, im):
        return C32(jnp.asarray(re, jnp.float32), jnp.asarray(im, jnp.float32))

    @staticmethod
    def to_f32(z):
        return z.re, z.im

    @staticmethod
    def add(a, b):
        return C32(a.re + b.re, a.im + b.im)

    @staticmethod
    def sub(a, b):
        return C32(a.re - b.re, a.im - b.im)

    @staticmethod
    def mul(a, b):
        return C32(a.re * b.re - a.im * b.im, a.re * b.im + a.im * b.re)

    @staticmethod
    def conj(a):
        return C32(a.re, -a.im)

    @staticmethod
    def mul_neg_i(a):
        """(re, im) * -i = (im, -re)."""
        return C32(a.im, -a.re)

    @staticmethod
    def mul_pow2(a, c: float):
        c = jnp.float32(c)
        return C32(a.re * c, a.im * c)


class _ArithDF64:
    """Complex ops on CDF64 (double-float pairs, ~49-bit mantissa)."""

    name = "df64"
    T = dd.CDF64

    wrap_np = staticmethod(dd.csplit_np)
    add = staticmethod(dd.cadd)
    sub = staticmethod(dd.csub)
    mul = staticmethod(dd.cmul)
    conj = staticmethod(dd.cconj)
    mul_pow2 = staticmethod(dd.cmul_pow2)

    @staticmethod
    def from_f32(re, im):
        return dd.cfrom_f32(re, im)

    @staticmethod
    def to_f32(z):
        return z.re.hi + z.re.lo, z.im.hi + z.im.lo

    @staticmethod
    def mul_neg_i(a):
        return dd.cneg_im(a)


ARITH_F32 = _ArithF32
ARITH_DF64 = _ArithDF64


# ----------------------------------------------------------------- twiddles

@functools.lru_cache(maxsize=64)
def _stage_twiddles(n: int, arith_name: str):
    """Per-stage DIF twiddles w[p] = exp(-2*pi*i*p/eta), shape [eta2, 1].

    Cached as NumPy-backed values: device arrays created inside a jit trace
    would leak tracers through this cache; NumPy constants are re-embedded
    safely in every trace.
    """
    arith = ARITH_F32 if arith_name == "f32" else ARITH_DF64
    stages = []
    eta = n
    while eta > 1:
        eta2 = eta // 2
        p = np.arange(eta2, dtype=np.float64)
        w = np.exp(-2j * np.pi * p / eta).reshape(eta2, 1)
        stages.append(arith.wrap_np(w))
        eta = eta2
    return tuple(stages)


@functools.lru_cache(maxsize=64)
def _untangle_twiddles(n: int, arith_name: str):
    """W1[k] = exp(-2*pi*i*k/n), k = 0..n/2, and its conjugate."""
    arith = ARITH_F32 if arith_name == "f32" else ARITH_DF64
    k = np.arange(n // 2 + 1, dtype=np.float64)
    w1 = np.exp(-2j * np.pi * k / n)
    return arith.wrap_np(w1), arith.wrap_np(np.conj(w1))


# ---------------------------------------------------------------- the FFTs

def fft(z, n: int, arith=ARITH_DF64):
    """Complex DIF Stockham FFT over the last axis (natural order in/out)."""
    batch = jax.tree.leaves(z)[0].shape[:-1]
    x = z
    eta, s = n, 1
    for w in _stage_twiddles(n, arith.name):
        eta2 = eta // 2
        xv = _tmap(lambda a: a.reshape(batch + (eta, s)), x)
        a_ = _tmap(lambda t: t[..., :eta2, :], xv)
        b_ = _tmap(lambda t: t[..., eta2:, :], xv)
        even = arith.add(a_, b_)
        odd = arith.mul(arith.sub(a_, b_), w)
        x = _tmap(
            lambda e, o: jnp.stack([e, o], axis=-2).reshape(batch + (eta2, 2 * s)),
            even, odd,
        )
        eta, s = eta2, 2 * s
    return _tmap(lambda a: a.reshape(batch + (n,)), x)


def ifft(z, n: int, arith=ARITH_DF64):
    """Inverse complex FFT: conj(fft(conj(z))) / n (n a power of two)."""
    y = fft(arith.conj(z), n, arith)
    return arith.mul_pow2(arith.conj(y), 1.0 / n)


def _reverse(z):
    return _tmap(lambda a: a[..., ::-1], z)


def _ext(z):
    """Append bin 0 at the end (Z[n2] = Z[0] for the untangle step)."""
    return _tmap(lambda a: jnp.concatenate([a, a[..., :1]], axis=-1), z)


def rfft(x: jnp.ndarray, arith=ARITH_DF64):
    """Real float32 [.., n] -> spectrum [.., n/2+1] via two-for-one packing."""
    n = x.shape[-1]
    n2 = n // 2
    z = arith.from_f32(x[..., 0::2], x[..., 1::2])
    Z = fft(z, n2, arith)
    Zext = _ext(Z)
    Zrev = arith.conj(_reverse(Zext))
    E = arith.mul_pow2(arith.add(Zext, Zrev), 0.5)
    O = arith.mul_neg_i(arith.mul_pow2(arith.sub(Zext, Zrev), 0.5))
    w1, _ = _untangle_twiddles(n, arith.name)
    return arith.add(E, arith.mul(w1, O))


def irfft(X, n: int, arith=ARITH_DF64) -> jnp.ndarray:
    """Spectrum [.., n/2+1] -> real float32 [.., n]."""
    n2 = n // 2
    Xrev = arith.conj(_reverse(X))
    E = arith.mul_pow2(arith.add(X, Xrev), 0.5)
    _, w1c = _untangle_twiddles(n, arith.name)
    O = arith.mul(arith.mul_pow2(arith.sub(X, Xrev), 0.5), w1c)
    # Z = E + i*O, dropping the redundant Nyquist bin.
    Zi = _zip_ei(E, O, n2, arith)
    z = ifft(Zi, n2, arith)
    re, im = arith.to_f32(z)
    return jnp.stack([re, im], axis=-1).reshape(re.shape[:-1] + (n,))


def _zip_ei(E, O, n2: int, arith):
    """Z = E + i*O, truncated to n2 bins, in the arith's representation."""
    iO = arith.mul_neg_i(arith.mul_pow2(O, -1.0))  # i*O = -(-i*O)
    Z = arith.add(E, iO)
    return _tmap(lambda a: a[..., :n2], Z)


def rfft_multiply_irfft(blocks: jnp.ndarray, H, arith=ARITH_DF64) -> jnp.ndarray:
    """Fused overlap-save spectral step: irfft(rfft(blocks) * H).

    blocks: float32 [.., B]; H in the arith's representation, [B/2+1].
    The equivalent of the reference's entire hot loop
    (/root/reference/FilterCore.h:64-69) for one block.
    """
    n = blocks.shape[-1]
    X = rfft(blocks, arith)
    Y = arith.mul(X, H)
    return irfft(Y, n, arith)
