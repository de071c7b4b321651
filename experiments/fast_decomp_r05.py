#!/usr/bin/env python
"""Round-5 decomposition of the fused segment kernel's per-step overhead.

Round-4 artifacts show BOTH ariths carry the SAME unmodeled ~30 us per
complex-block grid step (f32: 53.6 us/step measured vs 23.7 us arithmetic
bound; df40: 153.6 vs 123.1) — i.e. the "fast path at 44% of bound" and
"high path at 81%" are ONE plane-count-independent phenomenon. This
experiment times the PRODUCTION segment path (bench.py's exact
measurement loop) under LOWCUT_ABLATE variants (ops/pallas_fft._ABLATE)
to locate that overhead on hardware:

  full                 production kernel
  dma                  window DMA skipped (stale scratch read)
  tr                   straight plane copy instead of the two transposes
  mul                  T/H/conj-T/1/B constant multiplies skipped
  rolls / strided      one stage family skipped
  phaseb               phase-B arithmetic skipped (tile load/store kept)
  fft,mul              copy floor: pack/store/transpose/load/unpack only
  dma,tr,fft,mul       + no DMA, no transposes: grid + VMEM copy floor

Each variant runs in a SUBPROCESS (the ablation knob and kernel tables
are import-time state). Outputs are numerically wrong under ablation by
design; only times matter. Everything stays on device; 8-sample fences.

Usage: python experiments/fast_decomp_r05.py [--reps N] [--blocks K]
       (parent); child mode is internal (--child VARIANT PRECISION).
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = [
    "", "dma", "tr", "mul", "rolls", "strided", "phaseb",
    "fft,mul", "dma,tr,fft,mul",
]

# Round-2 probe set: decompose the ~48 us/step bare-copy-pipeline floor
# the first sweep exposed (see the r05 log): output writeback (out8),
# misaligned-source store relayout (alignedsrc), input tile reads
# (noreadx), scratch stores/loads, and the everything-off loop skeleton.
FLOOR_VARIANTS = [
    "", "out8", "alignedsrc", "noreadx,dma",
    "dma,tr,fft,mul,out8",
    "dma,tr,fft,mul,noreadx,nostores,noloads,out8",
]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def child(variant: str, precision: str, reps: int, blocks: int,
          block_size: int = 0) -> None:
    sys.path.insert(0, REPO)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audio_fir_filter_tpu.ops import kernel_design as kd
    from audio_fir_filter_tpu.ops import overlap_save as osv

    fs, channels = 96000.0, 2
    ws = kd.WindowedSinc(15.0 / fs, 10.0 / fs).make_low_cut()
    plan = osv.make_plan(ws.taps, precision=precision, engine="pallas",
                         block_size=block_size)
    seg = blocks * plan.hop
    xd = jax.jit(lambda: 0.3 * jnp.sin(
        0.37 * jnp.arange(channels * (seg + plan.m), dtype=jnp.float32)
    ).reshape(channels, seg + plan.m))()
    np.asarray(xd[0, :8])
    y = osv.extended_filter(xd, plan, seg)
    np.asarray(y[0, :8])  # warm (compile)
    t0 = time.perf_counter()
    for _ in range(reps):
        y = osv.extended_filter(xd, plan, seg)
    np.asarray(y[0, :8])  # fence only; values are wrong under ablation
    dt = time.perf_counter() - t0
    samples = reps * channels * seg
    # complex-block grid steps actually executed per rep:
    from audio_fir_filter_tpu.ops import pallas_fft as pf
    mr, delta, hp = pf._segment_framing(plan.m, plan.block_size)
    nb = -(-(seg + 0) // hp)
    nb += nb & 1
    steps = channels * (nb // 2) * reps
    print(json.dumps({
        "variant": variant or "full", "precision": precision,
        "rate_ms": samples / dt / 1e6, "us_per_step": dt / steps * 1e6,
        "reps": reps, "blocks": blocks, "hop": hp, "B": plan.block_size,
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", nargs=2, metavar=("VARIANT", "PRECISION"))
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--blocks", type=int, default=504)
    ap.add_argument("--block-size", type=int, default=0)
    ap.add_argument("--precisions", default="fast,high")
    ap.add_argument("--floor", action="store_true",
                    help="run the round-2 floor-decomposition set")
    args = ap.parse_args()
    if args.child:
        child(args.child[0], args.child[1], args.reps, args.blocks,
              args.block_size)
        return
    for precision in args.precisions.split(","):
        base = None
        for variant in (FLOOR_VARIANTS if args.floor else VARIANTS):
            env = dict(os.environ, LOWCUT_ABLATE=variant)
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 variant, precision, "--reps", str(args.reps),
                 "--blocks", str(args.blocks)],
                env=env, capture_output=True, text=True, cwd=REPO,
                timeout=1800)
            if p.returncode != 0:
                log(f"{precision:5s} {variant or 'full':16s}: FAILED\n"
                    f"{p.stderr[-600:]}")
                continue
            row = json.loads(p.stdout.strip().splitlines()[-1])
            if base is None:
                base = row["us_per_step"]
            saved = base - row["us_per_step"]
            log(f"{precision:5s} {row['variant']:16s}: "
                f"{row['rate_ms']:8.1f} Ms/s  {row['us_per_step']:8.2f} "
                f"us/step  (vs full: {saved:+7.2f} us)")


if __name__ == "__main__":
    main()
