"""Interleaved A/B of DIF stage plans on real TPU: the production r2+r4
plan (fc.dif_plan) vs radix-8 greedy (fc.dif_plan_r8), d==1 twiddle-skip
in both.

Single process, both variants compiled up front, then alternating timing
rounds (A, B, A, B, ...) to cancel device/tunnel drift — separate-process
runs of the identical binary were observed to differ by up to 40% here.
Data is generated ON DEVICE (dev tunnel is ~1 MB/s).

Result (v5e, B=2^18, 16 blocks, df64, 5x30 reps, 2026-08):
    r4: 0.702 ns/sample (1424 Ms/s raw)
    r8: 1.154 ns/sample ( 866 Ms/s raw)
Radix-8 has 3 stages per 512-phase instead of 5 and ~10% fewer flops, yet
runs 1.64x slower — the engine is not bound by per-stage HBM passes; XLA
fuses across the narrow r4 stage chain and the r8 butterfly's wide live
set breaks that schedule. Hence dif_plan stays r2+r4.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from audio_fir_filter_tpu.ops import fft_core as fc


def conv_with_plan(blocks, H2, T, r, c, plan_fn, arith):
    """fourstep_conv_real_blocks with an explicit stage-plan choice."""
    import jax
    import jax.numpy as jnp

    def tmap(f, *t):
        return jax.tree.map(f, *t)

    nb, b = blocks.shape
    z = arith.from_f32(blocks[0::2], blocks[1::2])
    z = tmap(lambda t: t.reshape(t.shape[:-1] + (r, c)), z)
    z = fc.fft_dif_rows(z, r, arith, plan=plan_fn(r))
    z = arith.mul(z, T)
    z = tmap(lambda t: jnp.swapaxes(t, -1, -2), z)
    z = fc.fft_dif_rows(z, c, arith, plan=plan_fn(c))
    z = arith.mul(z, H2)
    z = fc.ifft_dit_rows(z, c, arith, plan=plan_fn(c))
    z = tmap(lambda t: jnp.swapaxes(t, -1, -2), z)
    z = arith.mul(z, arith.conj(T))
    z = fc.ifft_dit_rows(z, r, arith, plan=plan_fn(r))
    z = tmap(lambda t: t.reshape(t.shape[:-2] + (b,)), z)
    re, im = arith.to_f32(z)
    return jnp.stack([re, im], axis=1).reshape(nb, b)


def fourstep_np_with_plan(x64, r, c, plan_fn):
    a = np.asarray(x64, complex).reshape(x64.shape[:-1] + (r, c))
    ahat = np.swapaxes(
        fc.dif_fft_np(np.swapaxes(a, -1, -2), plan_fn(r)), -1, -2)
    sig = fc.dif_sigma(r, plan_fn(r))
    i = sig[:, None].astype(np.float64)
    n2 = np.arange(c, dtype=np.float64)[None, :]
    T = np.exp(-2j * np.pi * i * n2 / (r * c))
    return np.swapaxes(fc.dif_fft_np(ahat * T, plan_fn(c)), -1, -2), T


def main():
    import jax
    import jax.numpy as jnp
    from audio_fir_filter_tpu.ops.fft_core import ARITH_DF64

    arith = ARITH_DF64
    print(f"device {jax.devices()[0]}", file=sys.stderr)
    b = 1 << 18
    m = 38400
    nb = 16
    r, c = fc.fourstep_split(b)
    rng = np.random.default_rng(0)
    h = np.zeros(b)
    h[: m + 1] = rng.standard_normal(m + 1) / m

    blocks = jax.jit(
        lambda k: 0.3 * jax.random.normal(k, (nb, b), jnp.float32)
    )(jax.random.key(0))
    np.asarray(blocks[0, :4])

    fns = {}
    for mode, plan_fn in (("r4", fc.dif_plan), ("r8", fc.dif_plan_r8)):
        print(f"{mode}: plan({r}) = {plan_fn(r)}", file=sys.stderr)
        H2_np, T_np = fourstep_np_with_plan(h, r, c, plan_fn)
        H2 = jax.tree.map(jnp.asarray, arith.wrap_np(H2_np))
        T = jax.tree.map(jnp.asarray, arith.wrap_np(T_np))
        f = jax.jit(lambda x, H=H2, Tt=T, p=plan_fn:
                    conv_with_plan(x, H, Tt, r, c, p, arith))
        t0 = time.perf_counter()
        y = f(blocks)
        np.asarray(y[0, :8])
        print(f"{mode}: compile+first {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        xs = np.asarray(blocks[0]).astype(np.float64)
        ref = np.fft.irfft(np.fft.rfft(xs) * np.fft.rfft(h), b)
        err = np.abs(np.asarray(y[0]) - ref).max() / np.abs(ref).max()
        print(f"{mode}: rel err {err:.2e}", file=sys.stderr)
        fns[mode] = f

    reps, rounds = 30, 5
    times = {m_: [] for m_ in fns}
    for _ in range(rounds):
        for mode, f in fns.items():
            t0 = time.perf_counter()
            y = None
            for _ in range(reps):
                y = f(blocks)
            np.asarray(y[0, :8])
            times[mode].append(time.perf_counter() - t0)
    for mode, ts in times.items():
        med = float(np.median(ts))
        ns = med / (reps * nb * b) * 1e9
        print(f"{mode}: rounds {['%.3f' % t for t in ts]} -> median "
              f"{ns:.3f} ns/sample ({nb*b*reps/med/1e6:.0f} Ms/s raw)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
