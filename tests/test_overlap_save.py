"""Overlap-save engine vs the float64 oracle (SURVEY.md §4.1-4.2).

Gate (SURVEY.md §7 step 4): high-precision path matches the oracle within
1 LSB @ 24-bit on TPU (relaxed on the CPU test backend — see fft_core.py's
accuracy notes); fast path within 1 LSB @ 16-bit. Edge zero-padding must be
identical to the reference's 3-phase semantics (tested via the oracle, which
is itself proven equal to the loop transliteration in test_oracle.py).

Tests use small kernels + explicit small block sizes to keep the unrolled
FFT graphs quick to compile; correctness properties are size-independent.
"""

import numpy as np
import pytest

from audio_fir_filter_tpu.ops import kernel_design as kd
from audio_fir_filter_tpu.ops import oracle
from audio_fir_filter_tpu.ops import overlap_save as osv

from util import high_tol_lsb24


def make_case(n, fc=0.05, bw=0.02, seed=0, channels=None):
    ws = kd.WindowedSinc(fc, bw).make_low_cut()   # bw=0.02 -> 201 taps
    rng = np.random.default_rng(seed)
    shape = (n,) if channels is None else (channels, n)
    x = rng.uniform(-1, 1, shape).astype(np.float32)
    return x, ws


def test_choose_block_size():
    # Production kernels get the 2^18 floor (v5e A/Bs in the docstring);
    # next_pow2(4M) wins above it.
    assert osv.choose_block_size(17641) == 1 << 18   # 44.1 kHz M=17640
    assert osv.choose_block_size(38401) == 1 << 18   # 96 kHz M=38400
    assert osv.choose_block_size(76801) == 1 << 19   # 192 kHz M=76800
    assert osv.choose_block_size(401) == 1 << 13     # min clamp (test-scale)
    assert osv.choose_block_size(401, requested=4096) == 4096
    with pytest.raises(ValueError):
        osv.choose_block_size(9000, requested=4096)


@pytest.mark.parametrize("precision,bits", [(osv.FAST, 16), (osv.HIGH, 24)])
def test_engine_matches_oracle(precision, bits):
    x, ws = make_case(n=6000, seed=1)
    plan = osv.make_plan(ws.taps, precision=precision, block_size=1024)
    y = np.asarray(osv.same_filter(x, plan))
    ref = oracle.direct_filter(x, ws.taps)
    tol = high_tol_lsb24() if bits == 24 else 1.0
    assert oracle.max_lsb_error(y, ref, bits=bits) <= tol


def test_engine_ulp_relative_bound_above_full_scale():
    """Output peaks in [2, 4): the precision promise is ULP-relative
    (<= 1 f32 ulp of the output's binade, fft_core._ArithDF40), so the
    scaled-LSB metric must stay bounded while the absolute metric doubles
    with the binade. Guards the gate against spuriously failing (or
    silently weakening) with signal scale — round-4 verdict item 5."""
    x, ws = make_case(n=6000, seed=11)
    x = np.float32(2.4) * x  # drives the filtered peak into [2, 4)
    plan = osv.make_plan(ws.taps, precision=osv.HIGH, block_size=1024)
    y = np.asarray(osv.same_filter(x, plan))
    ref = oracle.direct_filter(x, ws.taps)
    peak = float(np.abs(ref).max())
    assert 2.0 <= peak < 4.0, peak
    scaled = oracle.max_scaled_lsb_error(y, ref, bits=24)
    assert scaled <= high_tol_lsb24()
    # The scaled metric is exactly the absolute one divided by the binade.
    assert scaled == pytest.approx(
        oracle.max_lsb_error(y, ref, bits=24) / 2.0)


def test_scaled_lsb_metric_never_weaker_below_full_scale():
    """Sub-full-scale outputs keep the ABSOLUTE unit: quiet signals do not
    get a laxer gate."""
    a = np.float32([0.25 + 2.0 ** -23])
    b = np.float64([0.25])
    assert oracle.max_scaled_lsb_error(a, b, bits=24) == pytest.approx(
        oracle.max_lsb_error(a, b, bits=24))


def test_pallas_segment_16bit_native_io():
    """The 16-bit-native I/O mode (pallas_segment_filter(i16_io=True)):
    int16 PCM in, int16 PCM out with the codec's quantization rule —
    the DMA-bound-fast-path mode from round 5 (+30% measured on
    hardware, experiments/fast16_r05.txt). Gates: <= 1 LSB @ 16-bit vs
    the float64 oracle on the dequantized input, and saturation on a
    clipping signal (the caller's redo-in-f32 trigger)."""
    import jax.numpy as jnp

    from audio_fir_filter_tpu.ops import fft_core as fc
    from audio_fir_filter_tpu.ops import kernel_design as kd
    from audio_fir_filter_tpu.ops import oracle
    from audio_fir_filter_tpu.ops import pallas_fft as pf

    taps = kd.highpass_taps(0.05, 128)
    b = 1024
    assert pf.segment16_qualifies(len(taps), b, True)
    h = np.zeros(b)
    h[:len(taps)] = taps[::-1]
    H2 = pf.wrap_spectrum(pf.kernel_spectrum_np(h, b, fc.ARITH_F32),
                          fc.ARITH_F32)
    rng = np.random.default_rng(29)
    _, _, hp = pf._segment_framing(len(taps) - 1, b, 16)
    n = 2 * hp + 123
    x = rng.uniform(-0.6, 0.6, (2, n)).astype(np.float32)
    xq = np.clip(np.rint(x * 32768), -32768, 32767).astype(np.int16)
    y16 = np.asarray(pf.pallas_segment_filter(
        jnp.asarray(xq), len(taps), b, H2, arith=fc.ARITH_F32,
        interpret=True, i16_io=True))
    assert y16.dtype == np.int16 and y16.shape == xq.shape
    want = np.stack([oracle.direct_filter(
        xq[i].astype(np.float64) / 32768, taps) for i in range(2)])
    err = np.abs(y16.astype(np.float64) / 32768 - want).max() * 32768
    assert err <= 1.0, err

    # Saturating signal: output must CLAMP (not wrap) and hit the rails,
    # which is the caller's signal to redo in the f32 path.
    xg = np.clip(np.rint(3.0 * x * 32768), -32768, 32767).astype(np.int16)
    yg = np.asarray(pf.pallas_segment_filter(
        jnp.asarray(xg), len(taps), b, H2, arith=fc.ARITH_F32,
        interpret=True, i16_io=True))
    wg = np.stack([oracle.direct_filter(
        xg[i].astype(np.float64) / 32768, taps) for i in range(2)])
    assert np.abs(wg).max() > 1.0          # the oracle really clips
    assert yg.max() == 32767 or yg.min() == -32768


@pytest.mark.parametrize("n", [100, 823, 824, 825, 5000])
def test_engine_lengths_and_edges(n):
    """Lengths around block boundaries (hop=824 at B=1024, T=201);
    edge zero-pad semantics exact."""
    x, ws = make_case(n=n, seed=2)
    plan = osv.make_plan(ws.taps, precision=osv.HIGH, block_size=1024)
    y = np.asarray(osv.same_filter(x, plan))
    ref = oracle.direct_filter(x, ws.taps)
    assert y.shape == ref.shape
    assert oracle.max_lsb_error(y, ref, bits=24) <= high_tol_lsb24()


def test_engine_multichannel_matches_per_channel():
    x, ws = make_case(n=3000, seed=3, channels=3)
    plan = osv.make_plan(ws.taps, precision=osv.HIGH, block_size=1024)
    y = np.asarray(osv.same_filter(x, plan))
    for c in range(3):
        ref = oracle.direct_filter(x[c], ws.taps)
        assert oracle.max_lsb_error(y[c], ref, bits=24) <= high_tol_lsb24()


def test_extended_filter_equals_interior_of_same_filter():
    """Halo-extended filtering must equal the interior of full filtering —
    the property the sharded time-parallel path relies on (SURVEY.md §2.3).

    Different jit shapes can legally produce bit-different f32 roundings, so
    the check is at the quantization level, not bit equality.
    """
    x, ws = make_case(n=8000, seed=4)
    plan = osv.make_plan(ws.taps, precision=osv.HIGH, block_size=1024)
    full = np.asarray(osv.same_filter(x, plan))
    mo2 = ws.mo2
    s, e = 2000, 6000
    xe = x[s - mo2 : e + mo2]
    seg = np.asarray(osv.extended_filter(xe, plan, e - s))
    assert oracle.max_lsb_error(seg, full[s:e], bits=24) <= 2 * high_tol_lsb24()


def test_kernel_longer_than_signal():
    x, ws = make_case(n=100, seed=5)  # M=200 > N=100
    plan = osv.make_plan(ws.taps, precision=osv.HIGH, block_size=1024)
    y = np.asarray(osv.same_filter(x, plan))
    ref = oracle.direct_filter(x, ws.taps)
    assert oracle.max_lsb_error(y, ref, bits=24) <= high_tol_lsb24()


def test_impulse_through_engine_recovers_taps():
    ws = kd.WindowedSinc(0.1, 0.02).make_low_cut()
    n = ws.num_taps + 500
    x = np.zeros(n, dtype=np.float32)
    x[n // 2] = 1.0
    plan = osv.make_plan(ws.taps, precision=osv.HIGH, block_size=1024)
    y = np.asarray(osv.same_filter(x, plan))
    lo = n // 2 - ws.mo2
    np.testing.assert_allclose(
        y[lo : lo + ws.num_taps], ws.taps.astype(np.float32), atol=2 ** -22
    )


def test_sine_passband_and_stopband():
    """Behavioral: a 20 Hz tone through a 440 Hz low-cut dies; 2 kHz passes."""
    fs = 44100.0
    ws = kd.WindowedSinc(440.0 / fs, 300.0 / fs).make_low_cut()
    n = 3 * ws.num_taps
    t = np.arange(n) / fs
    plan = osv.make_plan(ws.taps, precision=osv.FAST, block_size=2048)
    low = np.sin(2 * np.pi * 20.0 * t).astype(np.float32)
    hig = np.sin(2 * np.pi * 2000.0 * t).astype(np.float32)
    y_low = np.asarray(osv.same_filter(low, plan))[ws.num_taps : -ws.num_taps]
    y_hig = np.asarray(osv.same_filter(hig, plan))[ws.num_taps : -ws.num_taps]
    assert np.max(np.abs(y_low)) < 1e-3
    assert np.max(np.abs(y_hig - hig[ws.num_taps : -ws.num_taps])) < 1e-2


@pytest.mark.parametrize("engine", ["fourstep", "pallas", "pease", "stockham"])
def test_engines_match_oracle(engine):
    """Both FFT engines implement identical semantics."""
    x, ws = make_case(n=6000, seed=9)
    plan = osv.make_plan(ws.taps, precision=osv.HIGH, block_size=1024, engine=engine)
    y = np.asarray(osv.same_filter(x, plan))
    ref = oracle.direct_filter(x, ws.taps)
    assert oracle.max_lsb_error(y, ref, bits=24) <= high_tol_lsb24()


def test_pallas_segment_path_matches_oracle_and_falls_back():
    """The whole-segment fused kernel (ops/pallas_fft.pallas_segment_filter,
    interpret mode on CPU): multi-block signals with ragged tails vs the
    float64 oracle, and graceful None-fallback when hop/m do not divide the
    lane width."""
    import jax.numpy as jnp

    from audio_fir_filter_tpu.ops import fft_core as fc
    from audio_fir_filter_tpu.ops import kernel_design as kd
    from audio_fir_filter_tpu.ops import oracle
    from audio_fir_filter_tpu.ops import overlap_save as osv
    from audio_fir_filter_tpu.ops import pallas_fft as pf
    from util import high_tol_lsb24

    rng = np.random.default_rng(17)
    taps = kd.highpass_taps(0.05, 128)           # 129 taps, m = 128
    for precision in ("high", "fast"):
        plan = osv.make_plan(taps, precision=precision, block_size=1024,
                             engine="pallas")
        b, hop, m = plan.block_size, plan.hop, plan.m
        r, c = fc.fourstep_split(b)
        assert hop % c == 0 and m % c == 0      # fused path qualifies
        # multi-block, sub-block, and 3-channel (odd grid total: the
        # double-buffered prefetch crosses channel boundaries)
        for chn, n in ((2, 3 * hop + 37), (2, hop - 5), (3, hop + 37)):
            x = rng.uniform(-1, 1, (chn, n)).astype(np.float32)
            y = np.asarray(osv.same_filter(jnp.asarray(x), plan))
            want = np.stack([oracle.direct_filter(xi, taps) for xi in x])
            tol = high_tol_lsb24() if precision == "high" else 600.0
            assert oracle.max_lsb_error(y, want) <= tol, (precision, n)

    # Since round 4 a kernel order NOT divisible by the lane width also
    # takes the fused path (ceil-row alias skip + delta-shifted framing —
    # the 44.1 kHz M=17,640 case): m = 130, c = 32 -> mr = 5, delta = 30.
    taps131 = kd.highpass_taps(0.05, 130)        # 131 taps, m = 130
    plan131 = osv.make_plan(taps131, precision="high", block_size=1024,
                            engine="pallas")
    assert plan131.m % fc.fourstep_split(plan131.block_size)[1] != 0
    for chn, n in ((2, 2 * plan131.hop + 37), (1, 301)):
        x = rng.uniform(-1, 1, (chn, n)).astype(np.float32)
        y = np.asarray(osv.same_filter(jnp.asarray(x), plan131))
        want = np.stack([oracle.direct_filter(xi, taps131) for xi in x])
        assert oracle.max_lsb_error(y, want) <= high_tol_lsb24(), n

    # A kernel too long for the block (hop would be <= 0) must decline
    # (the block-matrix path takes over): M' = ceil(999/32)*32 = 1024 = B.
    got = pf.pallas_segment_filter(jnp.zeros((1, 4000), jnp.float32),
                                   num_taps=1000, b=1024, H2=None,
                                   arith=fc.ARITH_DF64)
    assert got is None


def test_pallas_segment_path_declines_even_tap_count():
    """Even tap counts (odd M) have no integer Mo2 with 2*Mo2 == M; the
    fused segment framing would return output advanced by one sample
    (round-4 review finding). The exported function must decline cleanly
    — make_plan already rejects such kernels, but direct callers must
    never get silently time-shifted audio."""
    import jax.numpy as jnp

    from audio_fir_filter_tpu.ops import fft_core as fc
    from audio_fir_filter_tpu.ops import pallas_fft as pf

    assert not pf.segment_path_qualifies(40, 256, interpret=True)
    got = pf.pallas_segment_filter(jnp.zeros((1, 500), jnp.float32),
                                   num_taps=40, b=256, H2=None,
                                   arith=fc.ARITH_F32, interpret=True)
    assert got is None
    # Odd tap counts at the same shape do qualify.
    assert pf.segment_path_qualifies(41, 256, interpret=True)
