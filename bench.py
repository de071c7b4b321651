#!/usr/bin/env python
"""North-star benchmark: filtering throughput in samples/sec/chip.

Headline workload (BASELINE.md): 1-hour 96 kHz stereo WAV, default lowcut
filter (-f 15 -s 10 -> M = 38,400 taps at 96 kHz), high-precision
(double-float) engine. Baseline target: >= 100x faster than realtime on
one chip, i.e. 100 * 96000 frames/s * 2 channels = 1.92e7 samples/s.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "samples/s/chip", "vs_baseline": N}
(vs_baseline = value / 1.92e7; >= 1.0 means the 100x-realtime target is met.)

Extra modes (reports go to stderr; the stdout contract stays one line):
  --all       run the kernels of the 5 BASELINE.json configs
  --roofline  analytic flops/bytes model of the engine vs the measured rate
  --fidelity  hardware fidelity gate: production-size engine vs the float64
              oracle, max error in LSB @ 24-bit (BASELINE.md: <= 1.0)
  --scaling   time-shard scaling harness + ICI/DCN halo cost model
  --e2e       whole-tool wall time: synthesize the 1-h 96 kHz stereo 24-bit
              WAV, time every host stage at full scale, run bin/lowcut
              end-to-end on a short slice for the on-hardware stage split

Measurement methodology: the metric is the CHIP's filtering throughput —
the full overlap-save pipeline (block gather, four-step FFT, spectral
multiply, inverse FFT, hop reassembly, edge-exact semantics) executed on
device-resident segments, exactly as the streaming pipeline dispatches
them. Host<->device transfer is excluded from the headline number because
this development environment reaches the TPU through a tunnel capped at
~1-30 MB/s (measured), which says nothing about the chip; a production
host feeds the chip via local DMA at GB/s, where end-to-end converges to
the chip rate. Completion is fenced by fetching a few samples of the LAST
output (device execution is in-order; this backend's block_until_ready
returns early).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_chip_rate(freq: float, slope: float, fs: float, channels: int,
                      precision: str, block_size: int, segment_blocks: int,
                      reps: int, engine: str = "auto",
                      conv_chunk: int = 0) -> dict:
    """Device-resident throughput of one filter configuration."""
    import jax
    import jax.numpy as jnp

    from audio_fir_filter_tpu.ops import kernel_design as kd
    from audio_fir_filter_tpu.ops import overlap_save as osv

    rng = np.random.default_rng(0)
    ws = kd.WindowedSinc(freq / fs, slope / fs).make_low_cut()
    plan = osv.make_plan(ws.taps, precision=precision,
                         block_size=block_size, engine=engine,
                         conv_chunk=conv_chunk or osv.CONV_CHUNK)
    seg = segment_blocks * plan.hop
    log(f"kernel: {ws.num_taps} taps (M={ws.m}); block B={plan.block_size}, "
        f"hop {plan.hop}; precision={precision}; engine={engine}")
    log(f"segment: {channels} ch x {seg} frames ({seg / fs:.1f}s of audio) "
        f"+ {plan.m} halo")

    # The dev tunnel moves incompressible data at ~1 MB/s (and stalls for
    # minutes under load); FFT timing is data-independent, so the segment
    # is generated ENTIRELY ON DEVICE — nothing crosses the tunnel but the
    # 8-sample fences. Deterministic iota+sin instead of jax.random: the
    # threefry kernel alone cost ~11 min of compile+run on this backend
    # (BENCH_r01 "generate segment" line); sin(iota) is milliseconds.
    t0 = time.perf_counter()
    xd = jax.jit(lambda: 0.3 * jnp.sin(
        0.37 * jnp.arange(channels * (seg + plan.m), dtype=jnp.float32)
    ).reshape(channels, seg + plan.m))()
    np.asarray(xd[0, :8])  # fence
    log(f"generate segment on device: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    y = osv.extended_filter(xd, plan, seg)
    np.asarray(y[0, :8])
    log(f"warmup (incl. compile): {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    y_last = None
    for _ in range(reps):
        y_last = osv.extended_filter(xd, plan, seg)
    sentinel = np.asarray(y_last[0, :8])
    dt = time.perf_counter() - t0
    assert np.isfinite(sentinel).all()
    samples = reps * channels * seg
    chip_rate = samples / dt
    log(f"device-resident: {reps} segments in {dt:.3f}s -> "
        f"{chip_rate/1e6:.1f} Msamples/s "
        f"({chip_rate / (fs * channels):.0f}x realtime)")
    return {"rate": chip_rate, "plan": plan, "num_taps": ws.num_taps,
            "realtime_x": chip_rate / (fs * channels)}


def measure_fast16(segment_blocks: int, reps: int) -> dict:
    """Device-resident rate of the 16-bit-native I/O mode: int16 PCM in
    HBM both ways (the fast path is DMA-bound on this part, so halving
    I/O bytes raises the memory bound ~2x; +30% measured in round 5 —
    experiments/fast16_bench.py, oracle-gated at the 0.5-LSB@16-bit
    quantization floor on compiled hardware)."""
    import jax
    import jax.numpy as jnp

    from audio_fir_filter_tpu.ops import kernel_design as kd
    from audio_fir_filter_tpu.ops import pallas_fft as pf
    from audio_fir_filter_tpu.ops.fft_core import ARITH_F32

    fs, channels = 96000.0, 2
    ws = kd.WindowedSinc(15.0 / fs, 10.0 / fs).make_low_cut()
    b = 1 << 18
    if not pf.segment16_qualifies(ws.num_taps, b):
        return {"skipped": "shape does not qualify"}
    _, _, hp = pf._segment_framing(ws.m, b, 16)
    h = np.zeros(b)
    h[:ws.num_taps] = ws.taps[::-1]
    H2 = pf.wrap_spectrum(pf.kernel_spectrum_np(h, b, ARITH_F32),
                          ARITH_F32)
    seg = segment_blocks * hp
    xd = jax.jit(lambda: (9830.0 * jnp.sin(
        0.37 * jnp.arange(channels * seg, dtype=jnp.float32))
    ).astype(jnp.int16).reshape(channels, seg))()
    np.asarray(xd[0, :8])
    fn = jax.jit(lambda t: pf.pallas_segment_filter(
        t, ws.num_taps, b, H2, arith=ARITH_F32, i16_io=True))
    y = fn(xd)
    np.asarray(y[0, :8])
    t0 = time.perf_counter()
    for _ in range(reps):
        y = fn(xd)
    np.asarray(y[0, :8])
    dt = time.perf_counter() - t0
    rate = reps * channels * seg / dt
    log(f"device-resident: {reps} segments in {dt:.3f}s -> "
        f"{rate/1e6:.1f} Msamples/s ({rate/(fs*channels):.0f}x realtime)")
    return {"samples_per_sec": round(rate, 1),
            "realtime_x": round(rate / (fs * channels), 1)}


def _pallas_roofline(plan, chip_rate: float) -> None:
    """Plan-aware cost model of the fused Pallas engine (ops/pallas_fft.py).

    The fused kernel is VPU-bound, not HBM-bound: the whole convolution of
    a block runs VMEM-resident, so HBM sees ~B/hop f32 reads + 1 write per
    output sample (plus constant tables once per segment). The model
    therefore prices VPU work: weighted f32-op counts per point for the
    kernel's actual stage plan (pallas_fft.phase_plan) under its in-kernel
    arithmetic (relaxed presplit-table df64 for the high path; see
    ops/df64.py flop notes: add_relaxed 8 f32 ops, presplit const complex
    multiply ~70, vs strict 11/102).

    Ceiling: v5e VPU = 8x128 lanes x 4 ALUs x ~0.94 GHz = 3.85 T f32-op/s
    (Dekker/two_sum chains are dependent add/sub/mul sequences -- no FMA
    pairing credit is assumed).
    """
    from audio_fir_filter_tpu.ops import fft_core as fc
    from audio_fir_filter_tpu.ops import pallas_fft as pf

    arith = fc.ARITH_F32 if plan.precision == "fast" else fc.ARITH_DF64
    karith = pf._kernel_arith(arith)
    an = karith.name
    if an == "df64r":
        CADD, CMUL = 16.0, 70.0     # relaxed cadd, presplit-const cmul
        W8 = 2 * 17.0 + 16.0        # omega_8: two mul_dconst_relaxed + cadd
        NEG_I, POW2, PACK = 4.0, 4.0, 12.0   # 4 f32 planes per complex
        SEL = 4.0
    elif an == "df40":
        # 12-bit-split constant tables (df64.cmul_const12_relaxed): per
        # complex const-multiply 2 value splits (8) + 4 real muls at
        # 4 mul + 3 add (28) + 2 relaxed adds (16) + negation (2) = 54.
        CADD, CMUL = 16.0, 54.0
        W8 = 2 * 11.0 + 16.0        # two mul_sconst12 (split 4 + 7) + cadd
        NEG_I, POW2, PACK = 4.0, 4.0, 12.0
        SEL = 4.0
    else:                            # plain f32 complex
        CADD, CMUL = 2.0, 6.0
        W8 = 2 * 2.0 + 2.0
        NEG_I, POW2, PACK = 2.0, 2.0, 2.0
        SEL = 2.0

    def phase_flops(n):
        """Weighted f32 ops per complex point for one length-n transform
        (forward; the inverse chain mirrors it 1:1)."""
        f = 0.0
        for kind, d in pf.phase_plan(n, an):
            ntw = {"r2": 1, "r4": 3, "r8": 7}[kind] if d > 1 else 0
            if pf._is_roll(kind, d, an):
                # both butterfly halves computed, then selected; full-height
                # twiddle on every row (d<=2 collapses to select/mul_neg_i);
                # 2 sublane rolls move 4 planes each (VPU-executed).
                f += 2 * CADD + SEL + 8.0
                if d > 2:
                    f += CMUL
                elif d == 2:
                    f += NEG_I + SEL
            elif kind == "r2":
                f += (2 * CADD + ntw * CMUL) / 2
            elif kind == "r4":
                f += (8 * CADD + ntw * CMUL) / 4
            else:
                f += (24 * CADD + 2 * W8 + ntw * CMUL) / 8
        return f

    b = plan.block_size
    r, c = fc.fourstep_split(b)
    per_cplx = (2 * (phase_flops(r) + phase_flops(c))  # fwd + inv chains
                + 3 * CMUL                             # T, H, conj-T
                + POW2 + PACK                          # 1/B + pack/unpack
                + 16.0)                                # 2 transposes, 4+4 planes
    # Two real samples per complex point; only hop of every B block rows
    # is valid output, so each OUTPUT sample pays B/hop of the block work.
    overlap = b / plan.hop
    flops_per_sample = per_cplx / 2 * overlap
    in_bytes = 4.0 * overlap           # f32 overlapped window read
    out_bytes = 4.0                    # f32 valid write
    VPU = 3.85e12
    # Per-direction DMA ceiling MEASURED on this part (round 5): every
    # orchestration of the kernel's HBM copies — auto/manual, 1-8 streams,
    # pipeline depth 2-8, 1-32 pairs per grid step, batched waits — lands
    # at ~40 GB/s per direction (~77 aggregate), while plain-XLA saxpy
    # reaches 173 GB/s and the v5e SPEC says 819 (never observed here).
    # Input and output DMAs overlap each other and the VPU, so the memory
    # bound is set by the slower direction. Evidence:
    # experiments/fast_decomp_r05*.log, dma_bw_r05.log.
    DMA_DIR = 40e9
    arith_bound = VPU / flops_per_sample
    mem_bound = DMA_DIR / max(in_bytes, out_bytes)
    bound = min(arith_bound, mem_bound)
    binder = "VPU arithmetic" if arith_bound < mem_bound else "DMA"
    gbs = chip_rate * (in_bytes + out_bytes) / 1e9
    log(f"roofline model (fused Pallas, arith={an}):")
    log(f"  B={b} = {r}x{c}; plan {pf.phase_plan(r, an)}")
    log(f"  model: {flops_per_sample:.0f} weighted f32-op/sample, "
        f"{in_bytes + out_bytes:.1f} HBM B/sample "
        f"({in_bytes:.2f} in / {out_bytes:.2f} out)")
    log(f"  bounds: arithmetic {arith_bound/1e6:.0f} Ms/s "
        f"(VPU {VPU/1e12:.2f} T f32-op/s), memory {mem_bound/1e6:.0f} Ms/s "
        f"(measured {DMA_DIR/1e9:.0f} GB/s per DMA direction on this "
        f"part) -> {binder}-bound at {bound/1e6:.0f} Ms/s")
    log(f"  achieved {chip_rate/1e6:.1f} Msamples/s = "
        f"{chip_rate/bound*100:.0f}% of the binding bound; "
        f"{chip_rate*flops_per_sample/1e12:.2f} T f32-op/s on the VPU, "
        f"{gbs:.1f} GB/s on HBM")


def roofline_report(plan, chip_rate: float) -> None:
    """Analytic cost model of the production engine vs what was measured.

    Dispatches on the plan's engine: the fused Pallas kernel gets the
    VPU-bound model (:func:`_pallas_roofline`); the XLA fourstep engine
    the HBM-pass model below.

    Flop weights (f32 ops) for strict double-float arithmetic
    (ops/df64.py): add/sub = 11, mul = 20 -> complex add = 22,
    complex mul = 4*20 + 2*11 = 102. A radix-4 stage does 8 complex
    add/sub + 3 complex mul per 4 points; a radix-2 stage 2 add + 1 mul
    per 2 points. HBM traffic: each fori_loop stage and each
    twiddle/multiply/transpose materializes the [.., B] complex df64
    working set (16 B/point) once read + once written.
    """
    if plan.engine == "pallas":
        return _pallas_roofline(plan, chip_rate)
    from audio_fir_filter_tpu.ops import fft_core as fc

    b = plan.block_size
    r, c = fc.fourstep_split(b)
    CADD, CMUL = 22.0, 102.0
    W8MUL = 62.0  # omega_8 rotation: complex add + two dconst muls

    def stage_flops(n):
        """Per-point f32-flops and stage count of the DIF plan (radix-8
        greedy, ops/fft_core.py dif_plan). Twiddle muls skipped at d=1."""
        f = 0.0
        stages = fc.dif_plan(n)
        for kind, d in stages:
            ntw = {"r2": 1, "r4": 3, "r8": 7}[kind] if d > 1 else 0
            if kind == "r2":
                f += (2 * CADD + ntw * CMUL) / 2
            elif kind == "r4":
                f += (8 * CADD + ntw * CMUL) / 4
            else:  # r8: 24 cadds + 2 omega_8 rotations + twiddles
                f += (24 * CADD + 2 * W8MUL + ntw * CMUL) / 8
        return f, len(stages)

    f_r, s_r = stage_flops(r)
    f_c, s_c = stage_flops(c)
    # forward + inverse of both phases + 2 four-step twiddle muls + H mul
    flops_per_cplx = 2 * (f_r + f_c) + 3 * CMUL
    stages = 2 * (s_r + s_c)
    # HBM passes: every stage r+w, 2 transposes r+w, 3 pointwise muls fused
    # into adjacent stages (XLA), pack/unpack ~2 passes of f32.
    passes = 2 * (stages + 2)
    bytes_per_cplx = passes * 16.0 + 2 * 8.0
    # two real samples ride one complex point
    flops_per_sample = flops_per_cplx / 2
    bytes_per_sample = bytes_per_cplx / 2
    gflops = chip_rate * flops_per_sample / 1e9
    gbs = chip_rate * bytes_per_sample / 1e9
    log("roofline model (df64 four-step, strict arithmetic):")
    log(f"  B={b} = {r}x{c}; {stages} fori stages fwd+inv")
    log(f"  model: {flops_per_sample:.0f} f32-flop/sample, "
        f"{bytes_per_sample:.0f} HBM B/sample")
    log(f"  achieved at {chip_rate/1e6:.1f} Msamples/s: "
        f"{gflops:.0f} Gflop/s (VPU), {gbs:.0f} GB/s HBM "
        f"({gbs/819*100:.0f}% of v5e's 819 GB/s)")


def fidelity_report(freq: float, slope: float, fs: float, precision: str,
                    block_size: int, engine: str) -> float:
    """Hardware fidelity gate (BASELINE.md: <= 1 LSB @ 24-bit): run the
    PRODUCTION-size engine on device over full-scale random noise spanning
    several overlap-save blocks (both signal edges + an uneven tail) and
    compare against the float64 oracle evaluated on host.

    This is the committed, re-runnable form of the reference's precision
    ladder (/root/reference/FilterCore.h:21-23: f64 accumulate -> f32): the
    engine's double-float path must land within one 24-bit LSB of the
    same-semantics float64 direct convolution.
    """
    import jax.numpy as jnp

    from audio_fir_filter_tpu.ops import kernel_design as kd
    from audio_fir_filter_tpu.ops import oracle
    from audio_fir_filter_tpu.ops import overlap_save as osv

    ws = kd.WindowedSinc(freq / fs, slope / fs).make_low_cut()
    plan = osv.make_plan(ws.taps, precision=precision,
                         block_size=block_size, engine=engine)
    n = 3 * plan.hop + plan.hop // 3  # several blocks + uneven tail
    rng = np.random.default_rng(7)
    # The gate depth matches the precision's PROMISE (the auto policy,
    # utils/options.resolve_precision): "high" serves >16-bit outputs and
    # gates at 24-bit; "fast" serves <=16-bit PCM and gates at 16-bit.
    # The bound is ULP-RELATIVE (<= 1 LSB of the output's binade,
    # fft_core._ArithDF40): the second case drives the output peak into
    # [2, 4) to exercise the scale-following unit — an absolute 1-LSB gate
    # would spuriously fail there on an ulp-exact engine (round-4 verdict).
    gate_bits = 24 if precision == "high" else 16
    gate_err = 0.0
    for amp, label in ((1.0, "full-scale"), (2.4, "2.4x-scale")):
        x = rng.uniform(-amp, amp, n).astype(np.float32)
        log(f"fidelity: {ws.num_taps} taps, B={plan.block_size}, "
            f"{n} frames {label} noise, precision={precision}, "
            f"engine={engine}")
        t0 = time.perf_counter()
        y = np.asarray(osv.same_filter(jnp.asarray(x), plan))
        log(f"device filter (incl. tunnel transfer): "
            f"{time.perf_counter() - t0:.1f}s")
        want = oracle.fft_filter_f64(x, ws.taps)
        err24 = oracle.max_scaled_lsb_error(y, want, bits=24)
        err16 = oracle.max_scaled_lsb_error(y, want, bits=16)
        peak = float(np.abs(want).max())
        err = err24 if gate_bits == 24 else err16
        gate_err = max(gate_err, err)
        log(f"fidelity vs float64 oracle: max err {err24:.3f} "
            f"scale-relative LSB @ 24-bit ({err16:.5f} @ 16-bit), "
            f"output peak {peak:.3f} "
            f"-> gate (<= 1.0 ulp of output scale @ {gate_bits}-bit): "
            f"{'PASS' if err <= 1.0 else 'FAIL'}")
    return gate_err, gate_bits


def e2e_report(log, hours: float = 1.0, device_seconds: float = 30.0) -> None:
    """Whole-tool wall-time decomposition (the reference's published metric
    is end-to-end batch time, /root/reference/Makefile:47-49).

    Host stages (synthesize, container parse + PCM24 decode, PCM24 encode +
    write) are timed AT FULL SCALE (the 1-h 96 kHz stereo 24-bit headline
    file, ~2 GB). The filter stage runs on hardware over a SHORT slice via
    ``bin/lowcut --json-metrics``: in this dev harness host<->device moves
    through a ~1 MB/s tunnel, so the full-hour on-device number is the
    chip-rate measurement (the headline metric); a production host feeds
    the chip at local-DMA rates, where end-to-end wall time converges to
    max(host codec stage, chip filter stage) because the streaming
    pipeline (pipeline/stream.py) overlaps them.
    """
    import shutil
    import subprocess
    import tempfile

    from audio_fir_filter_tpu import audio
    from audio_fir_filter_tpu.audio import synth

    fs = 96000.0
    n = int(hours * 3600 * fs)
    tmp = tempfile.mkdtemp(prefix="lowcut_e2e_")

    # Raw-disk probe: on this dev VM the virtio disk sustains ~10 MB/s
    # writes / ~40 MB/s reads (far below the native codec's ~1.3 GB/s
    # encode, measured below), so whole-tool wall time here is a property
    # of the disk, not the framework. The probe quantifies that bound so
    # the stage numbers below can be read correctly.
    t0 = time.perf_counter()
    blob = b"\x5a" * (64 << 20)
    with open(f"{tmp}/probe", "wb") as f:
        f.write(blob)
        f.flush()
        os.fsync(f.fileno())
    dt = time.perf_counter() - t0
    log(f"e2e: raw disk write {64 / dt:.0f} MB/s "
        f"(64 MiB fsync probe); codec-vs-disk bound applies below")
    os.unlink(f"{tmp}/probe")
    del blob
    try:
        log(f"e2e: synthesizing {hours:g} h 96 kHz stereo 24-bit WAV "
            f"({n} frames, {n * 6 / 1e9:.2f} GB data chunk)")
        t0 = time.perf_counter()
        # Chunked synthesis: the f64 intermediates of a whole-hour
        # np.arange/sin chain alone were ~8 GB RSS (round-4 e2e measured
        # 11.2 GB peak, dominated by this harness stage, not the tool);
        # 2^24-frame chunks keep the transient under ~0.4 GB.
        xs = np.empty((2, n), np.float32)
        for s0 in range(0, n, 1 << 24):
            s1 = min(n, s0 + (1 << 24))
            t = np.arange(s0, s1, dtype=np.float64) / fs
            c = (0.4 * np.sin(2 * np.pi * 220.0 * t)
                 + 0.2 * np.sin(2 * np.pi * 4.0 * t)).astype(np.float32)
            xs[0, s0:s1] = c
            xs[1, s0:s1] = 0.7 * c
        del t, c
        t_gen = time.perf_counter() - t0
        t0 = time.perf_counter()
        synth.create_audio_file(f"{tmp}/full.wav", xs, fs,
                                encoding=audio.Encoding.PCM_24)
        t_write = time.perf_counter() - t0
        samples = 2 * n

        t0 = time.perf_counter()
        data = audio.read_audio(f"{tmp}/full.wav")
        t_read = time.perf_counter() - t0
        assert data.samples.shape == (2, n)

        t0 = time.perf_counter()
        audio.write_audio(f"{tmp}/copy.wav", data)
        t_enc = time.perf_counter() - t0

        log(f"e2e host stages at full scale ({samples / 1e6:.0f} Msamples):")
        log(f"  synthesize        : {t_gen:7.2f}s")
        log(f"  encode+write PCM24: {t_write:7.2f}s "
            f"({samples / t_write / 1e6:7.1f} Ms/s)")
        log(f"  parse+decode PCM24: {t_read:7.2f}s "
            f"({samples / t_read / 1e6:7.1f} Ms/s)")
        log(f"  re-encode+write   : {t_enc:7.2f}s "
            f"({samples / t_enc / 1e6:7.1f} Ms/s)")
        # The streaming pipeline (pipeline/stream.py) overlaps read/filter/
        # write, so the whole-tool bound is the slowest stage, not the sum.
        bound = max(t_read, t_enc)
        log(f"  overlapped whole-tool bound: {bound:.1f}s = "
            f"{hours * 3600 / bound:.0f}x realtime on this disk "
            f"(the 2.93 Gs/s chip filters the hour in "
            f"{samples / 2.93e9:.2f}s; at production NVMe rates the codec "
            f"stage, ~{samples / max(t_enc, 1e-9) / 1e6:.0f} Ms/s here "
            f"disk-included, converges toward its in-memory rate — "
            f"0.46/0.69 Gs/s per core encode/decode at 24-bit, fanned "
            f"out over 0.7 x cores)")
        # Host residency at 1-h scale: since round 4 the streaming filter
        # holds input + output + O(segment) staging only (~2x payload; the
        # r3 full zero-padded input copy is gone, pipeline/stream.py).
        # ru_maxrss here covers the codec stages above (input + raw bytes).
        import resource
        rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
        payload = data.samples.nbytes
        log(f"  host residency: peak RSS {rss / 1e9:.2f} GB over the "
            f"synthesize+codec stages ({rss / payload:.2f}x the "
            f"{payload / 1e9:.2f} GB f32 payload — harness-side; the TOOL's "
            f"streaming filter holds input + output + O(segment) staging, "
            f"<= 2x payload, tracemalloc-gated in "
            f"tests/test_pipeline.py::test_streamed_host_residency...)")
        del data

        if device_seconds <= 0:
            return
        # Short-slice on-hardware run for the true stage split.
        ns = int(device_seconds * fs)
        synth.create_audio_file(f"{tmp}/short.wav", xs[:, :ns], fs,
                                encoding=audio.Encoding.PCM_24)
        del xs
        log(f"e2e: bin/lowcut on a {device_seconds:g}s slice "
            "(tunnel-fed device; see docstring caveat)")
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, "bin/lowcut", "--json-metrics", "-O",
             f"{tmp}/short.wav", f"{tmp}/short_out.wav"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        wall = time.perf_counter() - t0
        if proc.returncode != 0:
            log(f"  lowcut FAILED rc={proc.returncode}: "
                f"{proc.stderr[-500:]}")
            return
        metrics = None
        for line in proc.stderr.splitlines():
            line = line.strip()
            if line.startswith("{"):
                metrics = json.loads(line)
        log(f"  wall (incl. JAX init + compile): {wall:.1f}s; stages: "
            + json.dumps({k: round(v, 3) for k, v in metrics.items()
                          if isinstance(v, float)}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# The 5 BASELINE.json workload configs, as (name, freq, slope, fs, channels).
# Config 4 (64-file batch) exercises host orchestration, not the chip — its
# chip-side kernel equals config 1; config 5's multi-host sharding is
# validated by tests/test_sharded.py + dryrun_multichip, its chip-side
# kernel is measured here at 192 kHz.
BASELINE_CONFIGS = [
    ("cfg1 mono 44.1k 16-bit, f=20 s=10", 20.0, 10.0, 44100.0, 1),
    ("cfg2 stereo 96k 24-bit, f=10 s=5 (long kernel)", 10.0, 5.0, 96000.0, 2),
    ("cfg3 AIFF, f=40 s=10 + normalize", 40.0, 10.0, 44100.0, 2),
    ("cfg5 stereo 192k, f=15 s=10 (sharded kernel)", 15.0, 10.0, 192000.0, 2),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=6,
                    help="device-resident segment passes to time")
    ap.add_argument("--precision", choices=["high", "fast"], default="high")
    ap.add_argument("--engine", default="auto",
                    choices=["auto", "pallas", "fourstep", "pease", "stockham"])
    ap.add_argument("--freq", type=float, default=15.0)
    ap.add_argument("--slope", type=float, default=10.0)
    ap.add_argument("--sample-rate", type=float, default=96000.0)
    ap.add_argument("--channels", type=int, default=2)
    ap.add_argument("--block-size", type=int, default=0)
    ap.add_argument("--conv-chunk", type=int, default=0,
                    help="blocks per in-jit conv step (0 = engine default)")
    ap.add_argument("--segment-blocks", type=int, default=1008,
                    help="hops per timed segment (default 1008 = ~3.9 min "
                         "of stereo 96 kHz per call: the ~1.4 ms per-call "
                         "dispatch floor of this dev tunnel drops below "
                         "0.5%% of call time; measured r3 sweep: 63 hops "
                         "2160, 252 -> 2343, 504 -> 2412, 1008 -> 2445 "
                         "Ms/s, flat beyond)")
    ap.add_argument("--all", action="store_true",
                    help="also run the BASELINE.json config kernels (stderr)")
    ap.add_argument("--roofline", action="store_true",
                    help="print the analytic flops/bytes model (stderr)")
    ap.add_argument("--fidelity", action="store_true",
                    help="run the hardware fidelity gate (stderr; fails the "
                         "process if the 1-LSB@24-bit bound is exceeded)")
    ap.add_argument("--scaling", action="store_true",
                    help="run the time-shard scaling harness (stderr)")
    ap.add_argument("--e2e", action="store_true",
                    help="run the whole-tool wall-time decomposition (stderr)")
    ap.add_argument("--e2e-hours", type=float, default=1.0)
    args = ap.parse_args()

    if args.scaling:
        from audio_fir_filter_tpu.parallel import scaling_bench
        scaling_bench.run_scaling(log)

    if args.e2e:
        e2e_report(log, hours=args.e2e_hours)

    import jax

    log(f"device: {jax.devices()[0]}")

    fs = args.sample_rate
    fidelity_err = None
    if args.fidelity:
        fidelity_err, fidelity_bits = fidelity_report(
            args.freq, args.slope, fs, args.precision, args.block_size,
            args.engine)

    res = measure_chip_rate(args.freq, args.slope, fs, args.channels,
                            args.precision, args.block_size,
                            args.segment_blocks, args.reps, args.engine,
                            args.conv_chunk)
    chip_rate = res["rate"]
    if args.roofline:
        roofline_report(res["plan"], chip_rate)

    if args.all:
        log("\nBASELINE.json config kernels:")
        extra = {}
        for name, f, s, cfs, ch in BASELINE_CONFIGS:
            log(f"--- {name}")
            # Long-kernel configs (B=2^19) at the headline 1008-hop segment
            # would hold ~12 GB resident (in + padded view + out); 504 hops
            # stays within ~2% of the segment-size plateau at half that.
            r = measure_chip_rate(f, s, cfs, ch, args.precision, 0,
                                  min(args.segment_blocks, 504),
                                  max(4, args.reps // 2), args.engine)
            extra[name] = {"samples_per_sec": round(r["rate"], 1),
                           "realtime_x": round(r["realtime_x"], 1)}
        log("--- fast16: 16-bit-native I/O fused path (headline shape)")
        r16 = measure_fast16(min(args.segment_blocks, 504),
                             max(4, args.reps // 2))
        extra["fast16 16-bit-native I/O (headline shape)"] = r16
        log(json.dumps(extra, indent=2))

    baseline = 100.0 * fs * args.channels  # 100x realtime, in samples/s
    result = {
        "metric": "samples/sec/chip (1h 96kHz stereo WAV, M-tap FIR)",
        "value": round(chip_rate, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(chip_rate / baseline, 4),
    }
    print(json.dumps(result))
    if fidelity_err is not None and fidelity_err > 1.0:
        log(f"FIDELITY GATE FAILED: {fidelity_err:.3f} > 1.0 "
            f"scale-relative LSB @ {fidelity_bits}-bit")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
