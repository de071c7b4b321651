#!/usr/bin/env python
"""Standalone DMA bandwidth microbench (round 5).

The segment kernel's floor probes measured ~77 GB/s aggregate for its
per-step HBM<->VMEM copies while plain-XLA saxpy reaches ~173 GB/s on the
same part. This kernel does NOTHING but pipelined DMA: grid of steps,
each step DMAs a [rows, 512] f32 chunk HBM->VMEM and an equal chunk
VMEM->HBM, double-buffered, sweeping chunk size and concurrency — to pin
per-direction and aggregate DMA throughput outside the conv kernel.

Usage: python experiments/dma_bw_micro.py [--rows N]...
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bw_kernel(nsteps: int, rows: int, c: int, nsplit: int, mode: str):
    """mode: 'in' (HBM->VMEM only), 'out' (VMEM->HBM only), 'both'."""
    chunk = -(-rows // (8 * nsplit)) * 8
    chunks = []
    off = 0
    while off < rows:
        ln = min(chunk, rows - off)
        chunks.append((off, ln))
        off += ln

    def kernel(x_ref, o_ref, buf, isem, osem):
        s = pl.program_id(0)

        def issue_in(step, slot):
            for j, (off, ln) in enumerate(chunks):
                pltpu.make_async_copy(
                    x_ref.at[step, pl.ds(off, ln)],
                    buf.at[slot, pl.ds(off, ln)], isem.at[slot, j]).start()

        if mode in ("in", "both"):
            @pl.when(s == 0)
            def _():
                issue_in(s, 0)

            @pl.when(jnp.logical_and(s + 1 < nsteps, (s + 1) % 2 == 0))
            def _():
                issue_in(s + 1, 0)

            @pl.when(jnp.logical_and(s + 1 < nsteps, (s + 1) % 2 == 1))
            def _():
                issue_in(s + 1, 1)

            for slot in (0, 1):
                @pl.when(s % 2 == slot)
                def _(slot=slot):
                    for j, (off, ln) in enumerate(chunks):
                        pltpu.make_async_copy(
                            x_ref.at[0, pl.ds(0, ln)],
                            buf.at[slot, pl.ds(off, ln)],
                            isem.at[slot, j]).wait()

        if mode in ("out", "both"):
            # Wait the copy issued 2 steps ago on this slot, then issue.
            for slot in (0, 1):
                @pl.when(jnp.logical_and(s >= 2, s % 2 == slot))
                def _(slot=slot):
                    for j, (off, ln) in enumerate(chunks):
                        pltpu.make_async_copy(
                            buf.at[slot, pl.ds(off, ln)],
                            o_ref.at[0, pl.ds(0, ln)],
                            osem.at[slot, j]).wait()
            for slot in (0, 1):
                @pl.when(s % 2 == slot)
                def _(slot=slot):
                    for j, (off, ln) in enumerate(chunks):
                        pltpu.make_async_copy(
                            buf.at[slot, pl.ds(off, ln)],
                            o_ref.at[s, pl.ds(off, ln)],
                            osem.at[slot, j]).start()
            for slot in ((0, 1) if nsteps >= 2 else (0,)):
                @pl.when(s == nsteps - 1)
                def _(slot=slot):
                    for j, (off, ln) in enumerate(chunks):
                        pltpu.make_async_copy(
                            buf.at[slot, pl.ds(off, ln)],
                            o_ref.at[0, pl.ds(0, ln)],
                            osem.at[slot, j]).wait()

    if mode == "none":
        # Pure grid-sequencing probe: no DMA, trivial body, tiny auto-out.
        def none_kernel(x_ref, o_ref):
            o_ref[...] = jnp.float32(1.0) + jnp.zeros((1, 8, c), jnp.float32)

        xt = jax.jit(lambda: jnp.ones((nsteps, 8, c), jnp.float32))()
        fn = pl.pallas_call(
            none_kernel,
            grid=(nsteps,),
            in_specs=[pl.BlockSpec((1, 8, c), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, 8, c), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((nsteps, 8, c), jnp.float32),
        )
        y = fn(xt)
        np.asarray(y[0, :1, :8])
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            y = fn(xt)
        np.asarray(y[0, :1, :8])
        dt = (time.perf_counter() - t0) / reps
        return dt, 0.0

    x = jax.jit(lambda: jnp.ones((nsteps, rows, c), jnp.float32))()
    fn = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((nsteps, rows, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, rows, c), jnp.float32),
            pltpu.SemaphoreType.DMA((2, len(chunks))),
            pltpu.SemaphoreType.DMA((2, len(chunks))),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    y = fn(x)
    np.asarray(y[0, :1, :8])
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        y = fn(x)
    np.asarray(y[0, :1, :8])
    dt = (time.perf_counter() - t0) / reps
    bytes_dir = nsteps * rows * c * 4
    dirs = 2 if mode == "both" else 1
    return dt, bytes_dir * dirs / dt / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=128)
    args = ap.parse_args()
    c = 512
    for mode in ("none", "in", "out", "both"):
        for rows in ((512,) if mode == "none" else (512, 1024, 2048)):
            for nsplit in ((1,) if mode == "none" else (1, 4)):
                try:
                    dt, bw = bw_kernel(args.steps, rows, c, nsplit, mode)
                    log(f"mode={mode:4s} rows={rows:5d} split={nsplit}: "
                        f"{dt*1e3:8.3f} ms  {bw:7.1f} GB/s moved")
                except Exception as e:
                    log(f"mode={mode:4s} rows={rows:5d} split={nsplit}: "
                        f"FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
