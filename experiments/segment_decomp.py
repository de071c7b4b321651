#!/usr/bin/env python
"""Decompose the production segment path's time: block gather vs conv vs
reassembly, per engine. All data device-generated."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from audio_fir_filter_tpu.ops import kernel_design as kd
from audio_fir_filter_tpu.ops import overlap_save as osv


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fence(y):
    np.asarray(jax.tree.leaves(y)[0].reshape(-1)[:8])


def timeit(fn, *args, reps=15):
    fence(fn(*args))
    t0 = time.perf_counter()
    y = None
    for _ in range(reps):
        y = fn(*args)
    fence(y)
    return (time.perf_counter() - t0) / reps


def main():
    fs = 96000.0
    ws = kd.WindowedSinc(15.0 / fs, 10.0 / fs).make_low_cut()
    seg_blocks = 63
    for engine, chunk in (("fourstep", 16), ("pallas", 16), ("pallas", 32)):
        plan = osv.make_plan(ws.taps, precision="high", engine=engine,
                             conv_chunk=chunk)
        b, hop, m = plan.block_size, plan.hop, plan.m
        seg = seg_blocks * hop
        c = 2
        xe = jax.jit(lambda: 0.3 * jnp.sin(
            0.37 * jnp.arange(c * (seg + m), dtype=jnp.float32)
        ).reshape(c, seg + m))()
        fence(xe)
        samples = c * seg

        t_full = timeit(lambda x: osv.extended_filter(x, plan, seg), xe)
        log(f"[{engine} chunk={chunk}] full extended_filter: "
            f"{t_full*1e3:7.2f} ms ({samples/t_full/1e6:7.1f} Ms/s)")

        # Stage 1: pad + gather blocks (same math as _same_filter_impl).
        n = seg + m
        nb = -(-n // hop)
        nb += nb & 1
        k = -(-b // hop)
        pad_right = (nb + k - 1) * hop - plan.mo2 - n

        @jax.jit
        def gather(x):
            xp = jnp.pad(x, ((0, 0), (plan.mo2, pad_right)))
            blocks = jax.vmap(
                lambda xc: osv._blocks_from_padded(xc, nb, hop, b))(xp)
            return blocks.reshape(c * nb, b)

        t_gather = timeit(gather, xe)
        blocks = jax.block_until_ready(gather(xe))
        log(f"  gather {c*nb}x{b} blocks        : {t_gather*1e3:7.2f} ms")

        # Stage 2: conv + valid-slice.
        fb = jax.jit(lambda bl: osv._filter_blocks(
            bl, plan.H, m, plan.precision, engine, chunk))
        t_conv = timeit(fb, blocks)
        log(f"  conv+slice ({nb*c} blocks)      : {t_conv*1e3:7.2f} ms "
            f"({samples/t_conv/1e6:7.1f} Ms/s-eq)")

        # Stage 3: reassembly (unfold) alone.
        yb = jax.block_until_ready(fb(blocks))

        @jax.jit
        def unfold(yy):
            return yy.reshape(c, nb * hop)[:, :n]

        t_un = timeit(unfold, yb)
        log(f"  unfold                          : {t_un*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
