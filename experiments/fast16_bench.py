#!/usr/bin/env python
"""16-bit-native I/O mode of the fused segment path: hardware timing.

The round-5 floor work proved the f32 fast path DMA-bound at ~40 GB/s
per direction (8.7 B/sample -> ~8.5 Gs/s ceiling, 97% achieved). This
mode keeps int16 PCM in HBM both ways — dequantize on read, quantize
with the codec rule on write — cutting the binding direction to
~2.3 B/sample. Times the production kernel at the headline shape.

Usage: python experiments/fast16_bench.py [--blocks K] [--reps N]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--blocks", type=int, default=504)
    args = ap.parse_args()

    from audio_fir_filter_tpu.ops import kernel_design as kd
    from audio_fir_filter_tpu.ops import pallas_fft as pf
    from audio_fir_filter_tpu.ops.fft_core import ARITH_F32

    fs, channels = 96000.0, 2
    ws = kd.WindowedSinc(15.0 / fs, 10.0 / fs).make_low_cut()
    b = 1 << 18
    assert pf.segment16_qualifies(ws.num_taps, b)
    mr, delta, hp = pf._segment_framing(ws.m, b, 16)
    h = np.zeros(b)
    h[:ws.num_taps] = ws.taps[::-1]
    H2 = pf.wrap_spectrum(pf.kernel_spectrum_np(h, b, ARITH_F32), ARITH_F32)
    seg = args.blocks * hp
    # int16 test signal generated on device (iota-based; +-0.3 FS).
    xd = jax.jit(lambda: (9830.0 * jnp.sin(
        0.37 * jnp.arange(channels * seg, dtype=jnp.float32))
    ).astype(jnp.int16).reshape(channels, seg))()
    np.asarray(xd[0, :8])

    fn = jax.jit(lambda t: pf.pallas_segment_filter(
        t, ws.num_taps, b, H2, arith=ARITH_F32, i16_io=True))
    y = fn(xd)
    np.asarray(y[0, :8])  # warm + fence
    t0 = time.perf_counter()
    for _ in range(args.reps):
        y = fn(xd)
    sent = np.asarray(y[0, :8])
    dt = time.perf_counter() - t0
    assert sent.dtype == np.int16
    samples = args.reps * channels * seg
    rate = samples / dt
    print(json.dumps({
        "mode": "fast16", "rate_ms": rate / 1e6, "B": b, "hop": hp,
        "reps": args.reps, "blocks": args.blocks,
        "realtime_x": rate / (fs * channels),
        "us_per_pair": dt / (args.reps * channels *
                             -(-args.blocks // 2)) * 1e6,
    }))


if __name__ == "__main__":
    main()
