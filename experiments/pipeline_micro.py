#!/usr/bin/env python
"""Where do 3.54 - 2.16 ns/sample go between the conv core and the full
overlap-save pipeline? Time each layer at the bench's exact shapes."""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from audio_fir_filter_tpu.ops import fft_core as fc
from audio_fir_filter_tpu.ops import kernel_design as kd
from audio_fir_filter_tpu.ops import overlap_save as osv
from audio_fir_filter_tpu.ops.fft_core import ARITH_DF64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _fence(y):
    leaf = jax.tree.leaves(y)[0]
    np.asarray(leaf.reshape(-1)[:8])


def timeit(fn, *args, reps=8):
    _fence(fn(*args))
    t0 = time.perf_counter()
    y = None
    for _ in range(reps):
        y = fn(*args)
    _fence(y)
    return (time.perf_counter() - t0) / reps


def main():
    fs = 96000.0
    ws = kd.WindowedSinc(15.0 / fs, 10.0 / fs).make_low_cut()
    plan = osv.make_plan(ws.taps, precision=osv.HIGH)
    b, hop, m = plan.block_size, plan.hop, plan.m
    seg = 32 * hop
    ch = 2
    log(f"B={b} hop={hop} M={m} seg={seg}")
    rng = np.random.default_rng(0)

    # full pipeline: [C, seg + M] extended filter (bench headline path)
    xe = jnp.asarray(rng.standard_normal((ch, seg + m)) * 0.3, jnp.float32)
    nsamp = ch * seg
    f_full = jax.jit(functools.partial(
        osv._same_filter_jit, plan_static=plan.static, H=plan.H))
    dt = timeit(lambda x: f_full(x), xe)
    log(f"full extended_filter     : {dt*1e3:8.2f} ms  {dt/nsamp*1e9:6.3f} ns/sample")

    # conv core only at the same total real-block count
    nb = -(-(seg + m) // hop)
    nb += nb & 1
    blocks = jnp.asarray(rng.standard_normal((ch * nb, b)), jnp.float32)
    f_core = jax.jit(lambda bl: fc.fourstep_conv_real_blocks(bl, plan.H, ARITH_DF64))
    dt2 = timeit(f_core, blocks)
    log(f"conv core [{ch*nb},B]      : {dt2*1e3:8.2f} ms  {dt2/nsamp*1e9:6.3f} ns/sample")

    # blocking only (gather into overlapped blocks)
    k = -(-b // hop)
    pad_right = (nb + k - 1) * hop - m // 2 - seg
    xp = jnp.asarray(rng.standard_normal((ch, (nb + k - 1) * hop + m)), jnp.float32)

    @jax.jit
    def f_blocks(xpad):
        return jax.vmap(
            lambda x1: osv._blocks_from_padded(x1, nb, hop, b))(xpad)

    dt3 = timeit(f_blocks, xp[:, : (nb + k - 1) * hop])
    log(f"blocking gather only     : {dt3*1e3:8.2f} ms  {dt3/nsamp*1e9:6.3f} ns/sample")

    # channels folded into one batch vs vmap: conv on [2*nb, B] vs vmap [2][nb, B]
    blocks2 = blocks.reshape(ch, nb, b)

    @jax.jit
    def f_vmap(bl):
        return jax.vmap(lambda bb: fc.fourstep_conv_real_blocks(
            bb, plan.H, ARITH_DF64))(bl)

    dt4 = timeit(f_vmap, blocks2)
    log(f"conv core vmap over ch   : {dt4*1e3:8.2f} ms  {dt4/nsamp*1e9:6.3f} ns/sample")


if __name__ == "__main__":
    main()
