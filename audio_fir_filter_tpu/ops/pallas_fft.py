"""Fully-fused Pallas TPU kernel for the four-step overlap-save convolution.

The XLA ``fourstep`` engine (ops/fft_core.py) is HBM-bound: its fused
schedule still makes ~44 full HBM passes per convolved block chunk
(experiments/where_time.py, roofline.log — ~78% of v5e HBM bandwidth on
each pass). This kernel performs the ENTIRE convolution of a complex
block — pack, forward 2-D FFT, spectral multiply, inverse 2-D FFT,
unpack — in ONE ``pallas_call`` with the block resident in VMEM: HBM
traffic drops to a single float32 read + write of the data (plus
constant tables fetched once), leaving the VPU butterfly arithmetic as
the only remaining cost.

Stage formulation (measured on v5e, experiments/mosaic_stages*.py):

- Mosaic lowers the in-place strided DIF/DIT stages well at coarse block
  length (d >= 16) but degrades badly below it (d=1 strided costs ~80x a
  sublane-roll stage), and the DIT inverse chain was ~2x the forward.
- Sublane ROLL radix-2 butterflies are nearly free (~8 us/stage over 8
  resident [512, 512] CDF64 blocks): partner rows come from
  ``pltpu.roll`` along the sublane axis, the top/bottom halves of each
  butterfly group are combined with one select, and the stage twiddle is
  one full-height [n, 1] column multiply (1 in top rows).
- In-kernel [n, n] transposes and elementwise complex multiplies are
  ~at the copy floor.

So the phase plan (:func:`phase_plan`) is MIXED: the standard r2/r4
strided plan down to block length ROLL_BELOW, then radix-2 roll stages
for the fine tail — strided coarse stages do half the twiddle
multiplies of a full-height roll stage (roll form multiplies the top
butterfly halves by 1), rolls fix exactly the granularities Mosaic is
bad at. The digit-reversed row order is never materialized: the
kernel's spectrum layout (:func:`kernel_spectrum_np`) and the four-step
twiddle are generated on host by the plan-aware mirrors
(fft_core.fourstep_dif_fft_np / _fourstep_dif_twiddle_np).

Roll stages are mathematically the SAME radix-2 stages as the strided
formulation (fft_core.dif_stage), so the host float64 mirror
``fft_core.dif_fft_np(x, plan)`` validates them directly.

Precision: for the "high" path the in-kernel arithmetic is the RELAXED
double-float variant with 12-BIT-SPLIT constant tables
(fft_core.ARITH_DF40, round-4 default — unnormalized intermediates and
host-quantized 12-bit constant halves making both value-half products
error-free, ~96 -> ~70 -> ~54 f32 flops per complex constant-multiply
across the plain/presplit/12-bit generations; error analysis at
df64.add_relaxed / cmul_const12_relaxed; df64r selectable via
LOWCUT_HIGH_KERNEL_ARITH). The kernel is VPU-bound, so unlike the
HBM-bound XLA engine these flop cuts convert to time. Same oracle gates
as every engine.

STATUS: measured numbers live in experiments/fused_ab.py runs recorded
in the commit log; at the all-roll/no-presplit baseline the kernel ran
f32 1.397 ms = 3.0 Gs/s (1.8x the XLA fourstep engine) and df64
3.945 ms (VPU-bound at ~3.2 Tflop/s). Cross-engine max|diff| vs
fourstep: 0.25 LSB@24 (df64).

Shapes: Mosaic needs lane dim >= 128 and sublane dim >= 8 to tile well;
below that (tiny test blocks on a real TPU) the same math runs as a
plain XLA mirror (:func:`_conv_xla_mirror`) with identical tables and
layout, so outputs stay engine-consistent at any block size.

Reference parity: this is the TPU-native replacement for the reference's
direct-convolution hot loop /root/reference/FilterCore.h:64-69.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import fft_core as fc
from .fft_core import ARITH_DF64, ARITH_DF64_RELAXED, ARITH_F32

# The Mosaic default scoped-VMEM cap (16 MiB) is below v5e's physical VMEM;
# the fused stage pipeline needs headroom for its butterfly temporaries.
_VMEM_LIMIT = 100 * 1024 * 1024


def _tmap(f, *trees):
    return jax.tree.map(f, *trees)


# Stage-plan policy, per in-kernel arithmetic: stages with block length
# below the threshold run as sublane-roll butterflies, coarser stages
# keep the strided contiguous-block form (fc.dif_stage). Strided form
# does HALF the twiddle multiplies (roll form multiplies the top
# butterfly halves by 1) but lowers worse in Mosaic; where the balance
# lands depends on the cost of a multiply (A/B on v5e,
# experiments/fused_ab.py):
#   f32   -> ALSO mixed at 8 since the r8 coarse-stage plan landed: the
#            earlier all-roll choice (1.40 ms vs 1.94 ms mixed) predates
#            it and was re-measured stale in round 3 — production segment
#            bench: 8277 Ms/s at 8 vs 6827 at 64 vs 5918 all-roll
#   df64r -> mixed at 8 (each complex mul is ~70 flops; strided stages
#            halve the mul count and lower fine down to d=8 — segment
#            bench: 1908 Ms/s at 8 vs 1581 at 16 vs 1516 at 32)
_ROLL_BELOW = {"f32": 8, "df64r": 8, "df64": 8, "df40": 8}

# Tuning overrides (read once at import; used by experiments/kernel_tune
# sweeps — table caches key on plan shape, so these must not change after
# first use in a process).
if os.environ.get("LOWCUT_ROLL_BELOW_DF64"):
    _ROLL_BELOW["df64r"] = _ROLL_BELOW["df64"] = _ROLL_BELOW["df40"] = int(
        os.environ["LOWCUT_ROLL_BELOW_DF64"])
if os.environ.get("LOWCUT_ROLL_BELOW_F32"):
    _ROLL_BELOW["f32"] = int(os.environ["LOWCUT_ROLL_BELOW_F32"])

# Coarse-stage plan family ("r4" | "r8") — tuning knob, same caveats.
# r8 measured 2223 vs 2088 Ms/s (r4) on the production segment bench
# (v5e, B=2^18 df64, 252-hop segments, round 3): radix-8 strided stages
# do 7 twiddle muls per 8 points where an r4+r2 pair does 4 per 8 twice,
# and CMUL dominates the df64r budget. Since round 3 the f32 path also
# uses strided coarse stages (_ROLL_BELOW["f32"] = 8), so the r8/r4
# choice applies to BOTH ariths (f32 A/B at B=2^18: r8 8272 vs r4 8162
# Ms/s, commit 703bba4).
_BASE_PLAN = os.environ.get("LOWCUT_KERNEL_BASE_PLAN", "r8")

# EXPERIMENT-ONLY ablation set (comma-separated): selectively disables
# pieces of the fused kernel so perf experiments can decompose its time
# on hardware while timing the REAL code path (not a copy that drifts).
# Outputs are numerically WRONG under any ablation — never set in
# production; the oracle gates catch accidents. Recognized tokens:
#   dma      skip the segment prologue's window DMA (read stale scratch)
#   tr       straight plane copy instead of the [r,c]<->[c,r] transpose
#            (requires r == c; isolates the relayout cost vs a copy)
#   fft      skip all butterfly stages (phases become pack/mul/store)
#   mul      skip the T / H / conj-T / 1/B constant multiplies
#   rolls    skip roll stages only
#   strided  skip strided stages only
#   phaseb   skip phase B's arithmetic (tile load/store kept)
#   out8     write only 8 output rows per tile (isolates the big store)
#   alignedsrc  write from tile rows [0:hr) instead of [mr:mr+hr)
#            (same traffic, sublane-ALIGNED source — isolates the
#            misaligned-slice relayout in the segment path's writeback)
#   noreadx  phase A reads zero tiles instead of the input
#   nostores phases skip their zA/zB scratch stores
#   noloads  phases load zero tiles instead of zA/zB scratch
#   empty    kernel body is just one tiny write (grid + out-copy floor)
_ABLATE = frozenset(
    t for t in os.environ.get("LOWCUT_ABLATE", "").split(",") if t)
_ABLATE_KNOWN = {"dma", "tr", "fft", "mul", "rolls", "strided", "phaseb",
                 "out8", "alignedsrc", "noreadx", "nostores", "noloads",
                 "empty"}
if not _ABLATE <= _ABLATE_KNOWN:
    raise ValueError(f"unknown LOWCUT_ABLATE tokens {_ABLATE - _ABLATE_KNOWN}")


def _abl(token: str) -> bool:
    return token in _ABLATE


# Footgun guard: the knobs above are read ONCE at import and baked into
# lru_cached tables keyed only on (n, arith_name); changing the env after
# first use would silently mix plans and corrupt spectra. Snapshot what
# was read and verify on every plan construction.
_KNOBS_AT_IMPORT = {
    "LOWCUT_ROLL_BELOW_DF64": os.environ.get("LOWCUT_ROLL_BELOW_DF64"),
    "LOWCUT_ROLL_BELOW_F32": os.environ.get("LOWCUT_ROLL_BELOW_F32"),
    "LOWCUT_KERNEL_BASE_PLAN": os.environ.get("LOWCUT_KERNEL_BASE_PLAN"),
    "LOWCUT_LANE_TILE": os.environ.get("LOWCUT_LANE_TILE"),
    "LOWCUT_HIGH_KERNEL_ARITH": os.environ.get("LOWCUT_HIGH_KERNEL_ARITH"),
    "LOWCUT_ABLATE": os.environ.get("LOWCUT_ABLATE"),
    "LOWCUT_UNROLL": os.environ.get("LOWCUT_UNROLL"),
    "LOWCUT_DMA_SPLIT": os.environ.get("LOWCUT_DMA_SPLIT"),
    "LOWCUT_PAIR_GROUP": os.environ.get("LOWCUT_PAIR_GROUP"),
    "LOWCUT_PIPE_DEPTH": os.environ.get("LOWCUT_PIPE_DEPTH"),
}


def _check_knobs() -> None:
    for k, v in _KNOBS_AT_IMPORT.items():
        if os.environ.get(k) != v:
            raise RuntimeError(
                f"{k} changed after ops.pallas_fft was imported "
                f"({v!r} -> {os.environ.get(k)!r}); kernel tables are "
                "cached against the import-time plan — set tuning knobs "
                "before first use (restart the process)")


# In-kernel arithmetic for the high path. "df40" (12-bit-split constant
# tables, fc.ARITH_DF40) is the round-4 default: 2.926 vs 2.493 Gs/s
# (+17%) over "df64r" at the headline config, within 1 f32 ulp of the
# f64 oracle on the hardware fidelity gate (A/B + gate run:
# experiments/df40_ab_r04.log; deterministic-bound argument at
# fc._ArithDF40). Same import-time-only caveat as the other knobs
# (tables cache on arith name).
_HIGH_ARITH = os.environ.get("LOWCUT_HIGH_KERNEL_ARITH", "df40")


def _kernel_arith(arith):
    """The in-kernel arithmetic for a caller-facing arith: the relaxed
    double-float variant (df40 12-bit-split tables by default, df64r via
    LOWCUT_HIGH_KERNEL_ARITH) for the high path, unchanged otherwise."""
    if arith is ARITH_DF64:
        return fc.arith_by_name(_HIGH_ARITH)
    return arith


def phase_plan(n: int, arith_name: str):
    """The kernel's stage plan for a length-n row transform: the standard
    r2/r4 plan with the fine tail decomposed to radix-2 roll stages."""
    _check_knobs()
    return fc.dif_plan_roll(n, min(_ROLL_BELOW[arith_name], n), _BASE_PLAN)


def _is_roll(kind: str, d: int, arith_name: str) -> bool:
    return kind == "r2" and d < _ROLL_BELOW[arith_name]


def kernel_spectrum_np(h_padded: np.ndarray, b: int, arith) -> np.ndarray:
    """Host float64 spectrum of the (reversed, zero-padded) kernel in THIS
    engine's four-step layout: [C, R], phase_plan on both phases."""
    r, c = fc.fourstep_split(b)
    an = _kernel_arith(arith).name
    return fc.fourstep_dif_fft_np(h_padded, r, c,
                                  plan_r=phase_plan(r, an),
                                  plan_c=phase_plan(c, an))


def wrap_spectrum(H64: np.ndarray, arith):
    """Device-ready kernel spectrum in the KERNEL arith's constant
    representation (presplit planes for the high path)."""
    ka = _kernel_arith(arith)
    return jax.tree.map(jnp.asarray, ka.make_const_np(H64))


# ------------------------------------------------------------ host tables

def _roll_twiddle_np(n: int, d: int) -> np.ndarray:
    """Full-height stage twiddle for a roll radix-2 DIF stage at block
    length d: W[i] = 1 on top rows ((i & d) == 0), else
    exp(-2j*pi*(i & (d-1)) / (2d)) — the dif_tables_np twiddle of the
    row's in-group position. Shape [n, 1]."""
    i = np.arange(n)
    w = np.exp(-2j * np.pi * (i & (d - 1)) / (2 * d))
    return np.where((i & d) == 0, 1.0 + 0j, w)[:, None]


@functools.lru_cache(maxsize=16)
def _phase_tables_np(n: int, arith_name: str):
    """Per-stage twiddles for phase_plan(n), in the arith's CONSTANT
    representation: roll stages get a full-height [n, 1] table (None for
    d == 1 — all twiddles exactly 1), strided stages the usual [d, 1]
    per-component tuple."""
    arith = fc.arith_by_name(arith_name)
    plan = phase_plan(n, arith_name)
    strided = fc.dif_tables_np(n, plan)
    out = []
    for (kind, d), ws in zip(plan, strided):
        if _is_roll(kind, d, arith_name):
            # d == 1: all twiddles exactly 1; d == 2: {1, -i}, handled as
            # a select of mul_neg_i in the stage body — no table either.
            out.append(None if d <= 2
                       else arith.make_const_np(_roll_twiddle_np(n, d)))
        else:
            out.append(tuple(arith.make_const_np(w) for w in ws))
    return tuple(out)


@functools.lru_cache(maxsize=16)
def _conv_tables_np(b: int, arith_name: str):
    """All constant inputs of the fused kernel for block size b. The
    conjugate four-step twiddle is NOT tabulated — the kernel conjugates
    T tile-by-tile (a [r, LT] negation is cheaper than doubling T's VMEM
    residency)."""
    arith = fc.arith_by_name(arith_name)
    r, c = fc.fourstep_split(b)
    T = fc._fourstep_dif_twiddle_np(r, c, plan_r=phase_plan(r, arith_name))
    return {
        "tw_r": _phase_tables_np(r, arith_name),
        "tw_c": _phase_tables_np(c, arith_name),
        "T": arith.make_const_np(T),
    }


def conv_tables(b: int, arith_name: str):
    """Device-ready pytree of the fused kernel's constant inputs."""
    return jax.tree.map(jnp.asarray, _conv_tables_np(b, arith_name))


# ------------------------------------------------------------ stage bodies

def _mask(n: int, d: int):
    """[n, 1] bool: True on the top half of each 2d-row butterfly group."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    return (rows & d) == 0


def _roll(z, shift: int, n: int):
    """np.roll(plane, shift, axis=-2). Planes inside the Mosaic kernel are
    2-D [n, V] and use pltpu.roll (non-negative shift); the XLA mirror's
    are batched 3-D and use jnp.roll."""
    def one(t):
        if t.ndim == 2:
            return pltpu.roll(t, shift % n, 0)
        return jnp.roll(t, shift, axis=-2)

    return _tmap(one, z)


def _sel(m, a, b_):
    return _tmap(lambda p, q: jnp.where(m, p, q), a, b_)


def _d2_rows(n: int):
    """[n, 1] bool: rows whose d=2 stage twiddle is 1 — the whole top half
    of each 4-row group ((i & 2) == 0) plus the bottom half's j=0 rows
    ((i & 1) == 0); the rest multiply by exactly -i (j=1 of
    exp(-2*pi*i*j/4))."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    return ((rows & 2) == 0) | ((rows & 1) == 0)


def _roll_stage_fwd(z, d: int, w, n: int, arith):
    """One radix-2 DIF stage at block length d via sublane rolls: the
    same math as fft_core.dif_stage('r2', d) — top rows a+b, bottom rows
    (a-b)*w — with partners fetched by roll instead of strided slices.

    d == 2 is special-cased: its twiddles are exactly {1, -i}, so the
    full-height complex multiply collapses to a select of mul_neg_i
    (w is None for that stage, as for d == 1)."""
    m = _mask(n, d)
    u = _roll(z, -d, n)                      # z[i+d] (top rows' partner)
    v = _roll(z, d, n)                       # z[i-d] (bottom rows' partner)
    merged = _sel(m, arith.add(z, u), arith.sub(v, z))
    if d == 2:
        return _sel(_d2_rows(n), merged, arith.mul_neg_i(merged))
    return merged if w is None else arith.mul_const(merged, w)


def _roll_stage_inv(z, d: int, w, n: int, arith):
    """Inverse (DIT) of :func:`_roll_stage_fwd`: conj twiddle applied on
    input, then top rows t[i] + t[i+d], bottom rows t[i-d] - t[i]."""
    if d == 2:
        # conj of {1, -i} is {1, +i}; a * i = -(a * -i).
        t = _sel(_d2_rows(n), z,
                 arith.mul_pow2(arith.mul_neg_i(z), -1.0))
    elif w is None:
        t = z
    else:
        t = arith.mul_const(z, arith.conj_const(w))
    m = _mask(n, d)
    u = _roll(t, -d, n)
    v = _roll(t, d, n)
    return _sel(m, arith.add(t, u), arith.sub(v, t))


def _run_fwd(z, n: int, tabs, arith):
    if _abl("fft"):
        return z
    for (kind, d), w in zip(phase_plan(n, arith.name), tabs):
        if _is_roll(kind, d, arith.name):
            if not _abl("rolls"):
                z = _roll_stage_fwd(z, d, w, n, arith)
        elif not _abl("strided"):
            z = fc.dif_stage(z, kind, d, w, arith)
    return z


def _run_inv(z, n: int, tabs, arith):
    """Inverse stages (reversed plan), WITHOUT the 1/n scaling — the conv
    applies one combined 1/B at the end."""
    if _abl("fft"):
        return z
    for (kind, d), w in zip(reversed(phase_plan(n, arith.name)),
                            reversed(tabs)):
        if _is_roll(kind, d, arith.name):
            if not _abl("rolls"):
                z = _roll_stage_inv(z, d, w, n, arith)
        elif not _abl("strided"):
            z = fc.dit_stage(z, kind, d, w, arith)
    return z


def _conv_body(x0, x1, cc, r: int, c: int, arith):
    """The whole circular convolution of one complex block, [r, c] planes
    resident (monolithic form — the XLA mirror; the Mosaic kernel runs the
    lane-tiled equivalent below)."""
    b = r * c
    z = arith.from_f32(x0, x1)
    z = _run_fwd(z, r, cc["tw_r"], arith)            # phase-1 fwd (rows=R)
    z = arith.mul_const(z, cc["T"])
    z = _tmap(lambda t: jnp.swapaxes(t, -1, -2), z)  # [c, r]
    z = _run_fwd(z, c, cc["tw_c"], arith)            # phase-2 fwd
    z = arith.mul_const(z, cc["H"])                  # spectral multiply
    z = _run_inv(z, c, cc["tw_c"], arith)            # phase-2 inv
    z = _tmap(lambda t: jnp.swapaxes(t, -1, -2), z)  # [r, c]
    z = arith.mul_const(z, arith.conj_const(cc["T"]))
    z = _run_inv(z, r, cc["tw_r"], arith)            # phase-1 inv
    z = arith.mul_pow2(z, 1.0 / b)
    return arith.to_f32(z)


# ------------------------------------------------------------- entry point

def _use_interpret() -> bool:
    """Compiled Mosaic on real TPU; interpreter elsewhere (CPU tests)."""
    return jax.devices()[0].platform != "tpu"


# Lane-tile width of the in-kernel phase loops. Each phase streams
# [rows, LANE_TILE] column tiles between VMEM scratch and the VPU, so the
# live SSA set is tile-sized: a monolithic [512, 512] body spills ~155 MiB
# of VMEM (measured), the tiled one fits comfortably. Swept on v5e
# (round 3): 128 optimal for df64 (2343 Ms/s vs 2037 at 256/512) and a
# wash for f32 (8272 at 128 vs 8230 at 256); 64 fails Mosaic lowering
# (internal error) — keep >= 128 on real TPU.
LANE_TILE = int(os.environ.get("LOWCUT_LANE_TILE", 128))

# Python-unroll the in-kernel tile loops (perf A/B; see tile_loop note).
_UNROLL = os.environ.get("LOWCUT_UNROLL", "") == "1"

# Concurrent DMA streams per transfer direction in the segment path. One
# async-copy stream sustains only ~40 GB/s on this part while the chip's
# aggregate is ~173 GB/s (round-5 floor probes vs plain-XLA saxpy), so
# each input window / output writeback is split into this many row-chunk
# DMAs issued concurrently. 1 = the round-4 single-stream behavior.
_DMA_SPLIT = int(os.environ.get("LOWCUT_DMA_SPLIT", 4))

# Complex pairs per grid step in the segment path (amortizes the ~43 us
# per-grid-step sequencing cost measured on this backend; VMEM use does
# not grow with it — the DMA pipeline depth stays 2).
_PAIR_GROUP = int(os.environ.get("LOWCUT_PAIR_GROUP", 8))

# DMA pipeline depth of the segment path: input windows are prefetched
# DEPTH-1 pairs ahead and output copies drain DEPTH pairs behind. Depth 2
# is the round-3/4 double-buffer; deeper pipelines hide per-DMA
# completion latency if that (rather than true per-direction bandwidth)
# is what the ~48 us/pair floor is made of.
_PIPE_DEPTH = max(2, int(os.environ.get("LOWCUT_PIPE_DEPTH", 4)))



def _call_fused(cc, r: int, c: int, karith, interpret, *, grid, x_in,
                in_spec, out_spec, out_shape, read_x, write_out,
                extra_scratch=(), prologue=None, pre_out=None,
                epilogue=None, group=1):
    """Shared fused-conv pallas_call: the 5-phase VMEM pipeline (pack,
    phase-1 fwd + T, transpose, phase-2 fwd x H x inv, transpose, conj-T +
    phase-1 inv, unpack) parameterized over how the kernel reads its two
    real blocks and writes its outputs.

    ``prologue(x_ref, scratch...)`` (optional) runs once per grid step
    before the phases — the segment path uses it to DMA its overlapped
    windows from HBM. ``read_x(x_ref_or_scratch, lane_slice)`` must return
    the two real [r, lt] tiles; ``write_out(o_ref, lane_slice, re, im,
    scratch...)`` stores the result tiles. ``pre_out(o_ref, scratch...)``
    runs just before the writeback loop and ``epilogue(o_ref, scratch...)``
    after it — the segment path uses them for its manual double-buffered
    output DMA (wait for the slot's previous copy / issue this step's).
    """
    b = r * c
    cleaves, cdef = jax.tree.flatten(cc)
    ncst = len(cleaves)
    # Under shard_map (the sequence-parallel path, parallel/sharded_conv)
    # the signal varies across mesh axes while the constant tables are
    # replicated; pallas_call's vma checking needs (a) the out_shape's vma
    # declared and (b) every operand at the same vma — so the tables are
    # pvary'd up to the signal's axes and the output declared to match.
    vma = jax.typeof(x_in).vma
    if vma:
        cleaves = [jax.lax.pvary(cl, tuple(vma)) for cl in cleaves]
    out_shape = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, vma=vma), out_shape)
    # Planes per complex value in this arith (df64: 4, f32: 2), and the
    # plane order used to park pytrees in scratch.
    zdef = jax.tree.structure(karith.from_f32(jnp.zeros(()), jnp.zeros(())))
    nplanes = zdef.num_leaves
    lt_c = min(LANE_TILE, c)
    lt_r = min(LANE_TILE, r)

    def kernel(x_ref, *refs):
        crefs = refs[:ncst]
        o_ref, zA, zB = refs[ncst], refs[ncst + 1], refs[ncst + 2]
        scratch = refs[ncst + 3:]
        cc_r = jax.tree.unflatten(cdef, list(crefs))
        tw_r = _tmap(lambda rf: rf[...], cc_r["tw_r"])
        tw_c = _tmap(lambda rf: rf[...], cc_r["tw_c"])
        # GROUPED pairs: one grid step processes `group` complex pairs in
        # sequence (Python loop, g static), reusing zA/zB between pairs.
        # A grid step costs ~43 us of pure sequencing on this backend
        # (experiments/dma_bw_micro.py mode=none — independent of body,
        # bytes, or DMA), so the grid is shrunk by `group` and that cost
        # amortized; the per-pair DMA pipelining (prefetch next pair's
        # input, 2-deep output staging) is unchanged — hooks receive g.
        for g in range(group):
            _one_pair(x_ref, o_ref, zA, zB, scratch, cc_r, tw_r, tw_c, g)

    def _one_pair(x_ref, o_ref, zA, zB, scratch, cc_r, tw_r, tw_c, g):
        xsrc = x_ref
        if prologue is not None:
            xsrc = prologue(x_ref, *scratch, g)
        if _abl("empty"):
            # Grid/out-copy floor probe: no loops, no copies, one write.
            octx = (pre_out(o_ref, *scratch, g)
                    if pre_out is not None else None)
            write_out(o_ref, pl.ds(0, lt_c), zA[0][:, :lt_c],
                      zA[min(1, nplanes - 1)][:, :lt_c], octx, *scratch)
            if epilogue is not None:
                epilogue(o_ref, *scratch, g)
            return

        def store(ref, sl, z):
            if _abl("nostores"):
                return
            for k, leaf in enumerate(jax.tree.leaves(z)):
                ref[k, :, sl] = leaf

        def load(ref, sl):
            if _abl("noloads"):
                rows = ref.shape[1]
                lt = lt_r if ref.shape[1] == c else lt_c
                return jax.tree.unflatten(
                    zdef, [jnp.zeros((rows, lt), jnp.float32)
                           for _ in range(nplanes)])
            return jax.tree.unflatten(
                zdef, [ref[k, :, sl] for k in range(nplanes)])

        if _abl("noreadx"):
            def read_xz(src, sl, _orig=read_x):
                return (jnp.zeros((r, lt_c), jnp.float32),
                        jnp.zeros((r, lt_c), jnp.float32))
        else:
            read_xz = read_x

        # Tile loops are lax.fori_loop by default: Python-unrolling the
        # WHOLE plane gave each tile's SSA chain its own VMEM slots in
        # round 3 (measured 151 MiB > the 128 MiB chip). LOWCUT_UNROLL
        # re-tests that at the current tile shapes: a fori_loop boundary
        # also flushes Mosaic's software pipeline each iteration, which
        # the round-5 floor decomposition implicates in the ~48 us/step
        # bare-kernel floor.
        def tile_loop(n_iters, body):
            if _UNROLL:
                for j in range(n_iters):
                    body(j, 0)
            else:
                jax.lax.fori_loop(0, n_iters, body, 0)

        # Phase A: pack + phase-1 forward + four-step twiddle, [r, lt_c]
        # column tiles of the [r, c] block.
        def phase_a(j, carry):
            sl = pl.ds(j * lt_c, lt_c)
            x0, x1 = read_xz(xsrc, sl)
            z = karith.from_f32(x0, x1)
            z = _run_fwd(z, r, tw_r, karith)
            if not _abl("mul"):
                z = karith.mul_const(
                    z, _tmap(lambda rf: rf[:, sl], cc_r["T"]))
            store(zA, sl, z)
            return carry

        tile_loop(c // lt_c, phase_a)

        # Transpose [r, c] -> [c, r], whole planes.
        for k in range(nplanes):
            if _abl("tr"):
                assert r == c, "tr ablation needs square blocks"
                zB[k] = zA[k]
            else:
                zB[k] = jnp.swapaxes(zA[k], 0, 1)

        # Phase B: phase-2 forward, spectral multiply, phase-2 inverse on
        # [c, lt_r] column tiles.
        def phase_b(j, carry):
            sl = pl.ds(j * lt_r, lt_r)
            z = load(zB, sl)
            if not _abl("phaseb"):
                z = _run_fwd(z, c, tw_c, karith)
                if not _abl("mul"):
                    z = karith.mul_const(
                        z, _tmap(lambda rf: rf[:, sl], cc_r["H"]))
                z = _run_inv(z, c, tw_c, karith)
            store(zB, sl, z)
            return carry

        tile_loop(r // lt_r, phase_b)

        # Transpose back.
        for k in range(nplanes):
            if _abl("tr"):
                zA[k] = zB[k]
            else:
                zA[k] = jnp.swapaxes(zB[k], 0, 1)

        # Phase C: conjugate twiddle + phase-1 inverse + 1/B + unpack.
        # octx (e.g. the output-staging slot) is computed OUTSIDE the tile
        # loop: pl.program_id cannot bind inside a fori_loop body under
        # the CPU interpreter.
        octx = pre_out(o_ref, *scratch, g) if pre_out is not None else None

        def phase_c(j, carry):
            sl = pl.ds(j * lt_c, lt_c)
            z = load(zA, sl)
            if not _abl("mul"):
                z = karith.mul_const(
                    z, karith.conj_const(
                        _tmap(lambda rf: rf[:, sl], cc_r["T"])))
            z = _run_inv(z, r, tw_r, karith)
            if not _abl("mul"):
                z = karith.mul_pow2(z, 1.0 / b)
            re, im = karith.to_f32(z)
            write_out(o_ref, sl, re, im, octx, *scratch)
            return carry

        tile_loop(c // lt_c, phase_c)
        if epilogue is not None:
            epilogue(o_ref, *scratch, g)

    # Constant index maps: Pallas fetches each table once and keeps it
    # resident in VMEM across grid steps.
    ndim_grid = len(grid)
    cspecs = [pl.BlockSpec(cl.shape,
                           lambda *i, _nd=cl.ndim: (0,) * _nd,
                           memory_space=pltpu.VMEM) for cl in cleaves]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_spec] + cspecs,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((nplanes, r, c), jnp.float32),
            pltpu.VMEM((nplanes, c, r), jnp.float32),
        ] + list(extra_scratch),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(x_in, *cleaves)


def _segment_framing(m: int, b: int, quantum: int = 8) -> tuple[int, int, int]:
    """The fused segment path's framing for an M-point kernel at block
    size b: ``(mr, delta, hp)`` where mr = alias-skip rows (ceil(M/c)),
    delta = mr*c - M extra discarded positions, hp = the hop (largest
    multiple of 8*c not above B - mr*c; <= 0 means the path declines).
    Single source of truth for BOTH :func:`segment_path_qualifies` and
    :func:`pallas_segment_filter` — the round-3 shape gap came from the
    qualifier and the kernel carrying separately-edited copies of this
    math."""
    _, c = fc.fourstep_split(b)
    # ceil to whole rows, then ROUND UP to a multiple of 8 rows: the
    # writeback slices tile rows [mr, mr+hr) and a sublane-aligned start
    # saves the per-tile relayout Mosaic emits for mr % 8 != 0 (measured
    # +3.4 us/step at the f32 production shape, round-5 'alignedsrc'
    # probe, experiments/fast_decomp_r05b.log). Hop cost: none at the
    # production shapes (hp already rounds down to 8c multiples); at most
    # one 8c chunk otherwise.
    mr = -(-m // c)                    # alias-skip rows (ceil)
    mr = -(-mr // quantum) * quantum
    delta = mr * c - m
    hp = ((b - mr * c) // (quantum * c)) * (quantum * c)
    return mr, delta, hp


def segment_path_qualifies(num_taps: int, b: int,
                           interpret: bool | None = None) -> bool:
    """Whether :func:`pallas_segment_filter` would take the fused path for
    this (kernel, block) shape. Tests and the driver dryrun use this to
    PIN which kernel path a case covers instead of asserting it in a
    comment (a round-4 review found two such comments gone stale when the
    framing gate widened). Decline conditions: even tap count (odd M —
    the framing needs 2*Mo2 == M), kernel too long for the block
    (hop would be <= 0), or sub-Mosaic-tile shapes on real TPU."""
    if interpret is None:
        interpret = _use_interpret()
    r, c = fc.fourstep_split(b)
    m = num_taps - 1
    if m % 2:
        return False
    if _segment_framing(m, b)[2] <= 0:
        return False
    return interpret or (c >= 128 and r >= 8)


def segment16_qualifies(num_taps: int, b: int,
                        interpret: bool | None = None) -> bool:
    """Whether the 16-bit-native I/O mode of the fused segment path
    applies: same conditions as :func:`segment_path_qualifies` but with
    the int16 sublane-tile quantum (16 rows) in the framing."""
    if interpret is None:
        interpret = _use_interpret()
    r, c = fc.fourstep_split(b)
    m = num_taps - 1
    if m % 2:
        return False
    if _segment_framing(m, b, 16)[2] <= 0:
        return False
    return interpret or (c >= 128 and r >= 8)


def _segment_read_x(r: int, hr: int, i16_io: bool = False):
    """The segment path's input-tile reader: the two real [r, lt] blocks
    of the pair, from the prologue-DMA'd window slot. 16-bit-native mode
    dequantizes on read (pcm / 2^15 — int16 PCM is exact in f32)."""
    if i16_io:
        def rd(src, sl):
            sc = jnp.float32(1.0 / 32768.0)
            a = src[0][src[1], src[2], pl.ds(0, r), sl]
            b_ = src[0][src[1], src[2], pl.ds(hr, r), sl]
            return (a.astype(jnp.float32) * sc, b_.astype(jnp.float32) * sc)
        return rd
    return lambda src, sl: (src[0][src[1], src[2], pl.ds(0, r), sl],
                            src[0][src[1], src[2], pl.ds(hr, r), sl])


def _segment_write_out(mr: int, hr: int, i16_io: bool = False):
    """The segment path's writeback: valid rows [mr, mr+hr) of the re/im
    tiles land at rows [0, hr) / [hr, 2hr) of this step's slot of the
    double-buffered output staging scratch ``yS`` (the manual out-DMA in
    the epilogue ships it to HBM — the Pallas auto out-block pipeline
    measured ~37 GB/s and serialized with the body, round-5 floor probes).
    Ablation variants (perf probes only): ``out8`` stores just 8 rows;
    ``alignedsrc`` stores the full height from the (sublane-aligned) tile
    top instead of mr."""
    if _abl("out8"):
        def w(o_ref, sl, re, im, octx, xs, sems, yS, osem):
            ms, g = octx
            yS[ms, g, 0:8, sl] = re[:8, :]
            yS[ms, g, hr:hr + 8, sl] = im[:8, :]
    elif _abl("alignedsrc"):
        def w(o_ref, sl, re, im, octx, xs, sems, yS, osem):
            ms, g = octx
            yS[ms, g, 0:hr, sl] = re[:hr, :]
            yS[ms, g, hr:2 * hr, sl] = im[:hr, :]
    elif i16_io:
        # 16-bit-native output: quantize with the CODEC's exact rule
        # (audio/codec.encode: clip(rint(x * 2^15), -2^15, 2^15-1));
        # saturated samples signal the caller's clip fallback.
        def w(o_ref, sl, re, im, octx, xs, sems, yS, osem):
            ms, g = octx

            def q(t):
                return jnp.clip(jnp.rint(t * jnp.float32(32768.0)),
                                -32768.0, 32767.0).astype(jnp.int16)

            yS[ms, g, 0:hr, sl] = q(re[mr:mr + hr, :])
            yS[ms, g, hr:2 * hr, sl] = q(im[mr:mr + hr, :])
    else:
        def w(o_ref, sl, re, im, octx, xs, sems, yS, osem):
            ms, g = octx
            yS[ms, g, 0:hr, sl] = re[mr:mr + hr, :]
            yS[ms, g, hr:2 * hr, sl] = im[mr:mr + hr, :]
    return w


def pallas_segment_filter(x: jnp.ndarray, num_taps: int, b: int, H2,
                          arith=ARITH_DF64, interpret: bool | None = None,
                          i16_io: bool = False):
    """Whole-segment fused path: overlap-save filtering of [C, N] in ONE
    pallas_call, no materialized block matrix.

    Owns its framing: the hop is the largest multiple of 8*c not above
    B - ceil(M/c)*c (>= 98.9% of the maximal hop at production shapes) so
    EVERY window — including the second of each complex pair, offset by
    one hop — starts on an 8-row (sublane-tile) boundary of the
    [C, rows, c] signal view; Mosaic requires provably tile-aligned DMA
    offsets. The alias skip is likewise rounded up to whole rows, so the
    path applies to any ODD-length (type-I) kernel — see the mr/delta
    derivation in the body; even-length kernels (odd M, no integer Mo2
    with 2*Mo2 == M) are declined, as everywhere in the engine
    (overlap_save.make_plan rejects them).
    Grid step (ch, k) covers real blocks 2k and 2k+1 of channel ch: ONE
    merged DMA fetches rows [2k*hr, 2k*hr + r + hr) of the [C, rows, c]
    view (the union of both overlapping windows — the hop-offset second
    window is rows [hr, hr + r) of the buffer), DOUBLE-BUFFERED across
    grid steps: step s issues step s+1's fetch before waiting on its
    own, so the HBM latency rides under the FFT arithmetic instead of
    serializing with it (A/B'd on v5e, round 3). The kernel writes ONLY
    its valid rows (block positions [M, M + hop)): HBM sees ~1.0x one
    signal read + exactly one valid write — the separate gather
    (block-matrix materialization) and unfold (valid-slice reassembly)
    passes of the generic path disappear.

    Returns y [C, N] ('same' semantics, zero-padded edges), or None when
    the shape does not qualify (caller falls back to the generic path).
    """
    if interpret is None:
        interpret = _use_interpret()
    qualifies = (segment16_qualifies if i16_io else segment_path_qualifies)
    if not qualifies(num_taps, b, interpret):
        return None
    # 16-bit-native I/O (round 5): on a DMA-bound part the f32 path moves
    # 8.7 B/sample; int16 PCM in HBM both ways (convert on read, quantize
    # with the codec rule on write) cuts the binding direction to ~2.3 B,
    # raising the memory bound ~2x. int16 sublane tiles are 16 rows, so
    # the framing uses a 16-row quantum (identical hop at the production
    # shapes). Output saturation (|pcm| == 32767/-32768) is the caller's
    # signal to redo in f32 for the reference's normalize-on-clip rule.
    io_dtype = jnp.int16 if i16_io else jnp.float32
    io_bytes = 2 if i16_io else 4
    quantum = 16 if i16_io else 8
    ch_n, n = x.shape
    r, c = fc.fourstep_split(b)
    karith = _kernel_arith(arith)
    m = num_taps - 1
    mo2 = m // 2
    # The alias-contaminated block head is rounded UP to whole rows
    # (mr = ceil(M / c)): positions [M', B) with M' = mr*c >= M are a
    # subset of the alias-free region, so discarding the extra
    # delta = M' - M valid positions per block (< c, i.e. <= 0.4% of the
    # hop at production shapes) buys row-aligned writes for any odd-length
    # kernel. Round-4 fix: the previous `m % c == 0` gate silently pushed
    # every 44.1 kHz config (M = 17,640, never divisible by c) onto the
    # generic block path and its extra gather/unfold HBM passes — the
    # round-3 cfg1/cfg3 2-4x shortfall.
    mr, delta, hp = _segment_framing(m, b, quantum)
    hr = hp // c                       # valid rows per block
    nb = -(-n // hp)
    nb += nb & 1                       # two real blocks per complex FFT
    # Pair grouping (round-5): one grid step runs `group` complex pairs —
    # a grid step costs ~43 us of pure sequencing on this backend
    # (experiments/dma_bw_micro.py mode=none), which at group=1 was ~65%
    # of the f32 step time. Pad the per-channel pair count up to a group
    # multiple (padded pairs read zero-padded signal and their output is
    # sliced away; <= group-1 extra pairs per channel). The group is also
    # capped so everything fits the 100 MiB scoped-VMEM limit: staging is
    # ((win + 2hr) * c * 4) per pair across both macro slots, and the
    # non-staging residents are zA/zB (2 * nplanes * B * 4) plus the T/H
    # constant tables which Pallas keeps DOUBLE-buffered (~4 * tplanes
    # * B * 4; measured 67 MiB total non-staging at B=2^19 df40 — the
    # round-5 cfg2 OOM) plus ~10 MiB of twiddle columns and slack.
    hr0 = hp // c
    nplanes0 = 4 if karith.name != "f32" else 2
    tplanes = {"f32": 2, "df40": 3}.get(karith.name, 4)
    per_pair_staging = ((r + hr0) + 2 * hr0) * c * io_bytes * 2
    fixed_est = (2 * nplanes0 + 4 * tplanes) * b * 4 + (10 << 20)
    budget = int(0.92 * _VMEM_LIMIT) - fixed_est
    group = max(1, min(_PAIR_GROUP, nb // 2,
                       budget // per_pair_staging))
    nkp = -(-(nb // 2) // group) * group
    nb = 2 * nkp
    # Left pad mo2 + delta: block j's first written position (M' of the
    # circular conv) then lands exactly on out[j*hp], keeping the written
    # hops a contiguous tiling of the output from 0.
    xp = jnp.pad(jnp.asarray(x, io_dtype), ((0, 0),
                     (mo2 + delta, nb * hp + (b - hp) - mo2 - delta - n)))
    rows_total = (nb * hp + (b - hp)) // c
    xp3 = xp.reshape(ch_n, rows_total, c)
    tabs = conv_tables(b, karith.name)
    cc = dict(tabs, H=H2)

    nmacro = nkp // group
    total_pairs = ch_n * nkp
    win = r + hr  # merged-window rows: both blocks of the complex pair

    # MANUAL, MACRO-BATCHED DMA on both sides (round-5 design, chosen by
    # the floor-probe ladder in experiments/fast_decomp_r05*.log +
    # dma_bw_micro.py): on this backend a BLOCKING DMA-semaphore wait
    # batch costs ~40-50 us regardless of bytes, stream count
    # (LOWCUT_DMA_SPLIT 1/4/8), pipeline depth (2/4/8), or grid grouping
    # — it is a per-wait-cycle quantum, not bandwidth. So waits are
    # AMORTIZED over the pair group: the g==0 pair of each macro grid
    # step waits ONCE for all `group` input windows (issued one macro
    # step earlier) and ONCE for the macro-before-last's output batch;
    # the group's pairs then compute with no blocking waits between
    # them, staging outputs and issuing their copies as they finish.
    def row_chunks(rows: int) -> list[tuple[int, int]]:
        k = max(1, min(_DMA_SPLIT, rows // quantum))
        per = -(-rows // (quantum * k)) * quantum
        out = []
        off = 0
        while off < rows:
            ln = min(per, rows - off)
            out.append((off, ln))
            off += ln
        return out

    in_chunks = row_chunks(win)
    out_chunks = row_chunks(2 * hr)
    n_in, n_out = len(in_chunks), len(out_chunks)
    total_macros = ch_n * nmacro

    def _macro_id():
        return pl.program_id(0) * nmacro + pl.program_id(1)

    def _issue_macro(x_ref, xs, sems, mi, mslot):
        """Issue the input-window DMAs of ALL `group` pairs of macro mi
        into xs[mslot]."""
        base = mi * group
        for t in range(group):
            tq = base + t
            ch2 = tq // nkp
            row = pl.multiple_of((tq % nkp) * (2 * hr), quantum)
            for j, (off, ln) in enumerate(in_chunks):
                pltpu.make_async_copy(
                    x_ref.at[ch2, pl.ds(row + off, ln), :],
                    xs.at[mslot, t, pl.ds(off, ln)],
                    sems.at[mslot, t, j]).start()

    def prologue(x_ref, xs, sems, yS, osem, g):
        if _abl("dma"):
            return (xs, 0, g)  # read whatever the scratch holds; no DMA
        mi = _macro_id()
        if g == 0:
            @pl.when(mi == 0)
            def _():
                _issue_macro(x_ref, xs, sems, mi, 0)
            for ms in (0, 1):
                @pl.when(jnp.logical_and(mi + 1 < total_macros,
                                         (mi + 1) % 2 == ms))
                def _(ms=ms):
                    _issue_macro(x_ref, xs, sems, mi + 1, ms)
            # ONE wait batch for the whole group's windows.
            for ms in (0, 1):
                @pl.when(mi % 2 == ms)
                def _(ms=ms):
                    for t in range(group):
                        for j, (off, ln) in enumerate(in_chunks):
                            pltpu.make_async_copy(
                                x_ref.at[0, pl.ds(0, ln), :],
                                xs.at[ms, t, pl.ds(off, ln)],
                                sems.at[ms, t, j]).wait()
        return (xs, mi % 2, g)

    def _wait_out_macro(o_ref, yS, osem, ms):
        for t in range(group):
            for j, (off, ln) in enumerate(out_chunks):
                pltpu.make_async_copy(
                    yS.at[ms, t, pl.ds(off, ln)],
                    o_ref.at[0, 0, pl.ds(0, ln)],
                    osem.at[ms, t, j]).wait()

    def pre_out(o_ref, xs, sems, yS, osem, g):
        mi = _macro_id()
        if g == 0:
            # The writeback below reuses yS[mi%2]: wait the copies issued
            # two macro steps ago (same slot) — one wait batch per group.
            for ms in (0, 1):
                @pl.when(jnp.logical_and(mi >= 2, mi % 2 == ms))
                def _(ms=ms):
                    _wait_out_macro(o_ref, yS, osem, ms)
        return (mi % 2, g)

    def epilogue(o_ref, xs, sems, yS, osem, g):
        ch = pl.program_id(0)
        kk = pl.program_id(1) * group + g
        mi = _macro_id()
        for ms in (0, 1):
            @pl.when(mi % 2 == ms)
            def _(ms=ms):
                for j, (off, ln) in enumerate(out_chunks):
                    pltpu.make_async_copy(
                        yS.at[ms, g, pl.ds(off, ln)],
                        o_ref.at[ch, kk, pl.ds(off, ln)],
                        osem.at[ms, g, j]).start()
        if g == group - 1:
            # Final macro: drain the last (up to two) macros' batches.
            for ms in range(min(2, total_macros)):
                @pl.when(mi == total_macros - 1)
                def _(ms=ms):
                    _wait_out_macro(o_ref, yS, osem, ms)

    # Output is 4-D [C, nb/2, 2*hr, c] in ANY space (the kernel DMAs into
    # it); the flat [C, nb*hp] view below is the same row-major order.
    y3 = _call_fused(
        cc, r, c, karith, interpret,
        grid=(ch_n, nmacro),
        x_in=xp3,
        in_spec=pl.BlockSpec(memory_space=pltpu.ANY),
        out_spec=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((ch_n, nb // 2, 2 * hr, c),
                                       io_dtype),
        read_x=_segment_read_x(r, hr, i16_io),
        write_out=_segment_write_out(mr, hr, i16_io),
        extra_scratch=(
            pltpu.VMEM((2, group, win, c), io_dtype),
            pltpu.SemaphoreType.DMA((2, group, n_in)),
            pltpu.VMEM((2, group, 2 * hr, c), io_dtype),
            pltpu.SemaphoreType.DMA((2, group, n_out)),
        ),
        prologue=prologue,
        pre_out=pre_out,
        epilogue=epilogue,
        group=group,
    )
    return y3.reshape(ch_n, nb * hp)[:, :n]


def pallas_conv_real_blocks(blocks: jnp.ndarray, H2, arith=ARITH_DF64,
                            interpret: bool | None = None) -> jnp.ndarray:
    """Circular convolution of real blocks with a real kernel — the fused
    Pallas engine. Contract mirrors fft_core.fourstep_conv_real_blocks:
    blocks [nb(even), B] float32 -> [nb, B] float32, two real blocks per
    complex FFT. ``H2`` is the kernel's spectrum in THIS engine's layout
    ([C, R], host: :func:`kernel_spectrum_np`) in the arith's
    representation.

    One pallas_call convolves everything: grid step = one complex block,
    fully resident in VMEM scratch; HBM sees a single float32 read and
    write of the data plus one fetch of the constant tables.
    """
    if interpret is None:
        interpret = _use_interpret()
    nb, b = blocks.shape
    r, c = fc.fourstep_split(b)
    karith = _kernel_arith(arith)
    tabs = conv_tables(b, karith.name)
    cc = dict(tabs, H=H2)

    if not interpret and (c < 128 or r < 8):
        # Below Mosaic's efficient tile floor: identical math in XLA.
        return _conv_xla_mirror(blocks, cc, r, c, karith)

    x = blocks.reshape(nb // 2, 2, r, c)
    y = _call_fused(
        cc, r, c, karith, interpret,
        grid=(nb // 2,),
        x_in=x,
        in_spec=pl.BlockSpec((1, 2, r, c), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
        out_spec=pl.BlockSpec((1, 2, r, c), lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        read_x=lambda x_ref, sl: (x_ref[0, 0, :, sl], x_ref[0, 1, :, sl]),
        write_out=lambda o_ref, sl, re, im, octx: (
            o_ref.__setitem__((0, 0, slice(None), sl), re),
            o_ref.__setitem__((0, 1, slice(None), sl), im)),
    )
    return y.reshape(nb, b)


def _conv_xla_mirror(blocks: jnp.ndarray, cc, r: int, c: int,
                     arith) -> jnp.ndarray:
    """The kernel's exact math as plain XLA ops (same tables, same
    layout): fallback for sub-tile block sizes and a debugging mirror."""
    nb, b = blocks.shape
    re, im = _conv_body(
        blocks[0::2].reshape(-1, r, c), blocks[1::2].reshape(-1, r, c),
        cc, r, c, arith)
    re = re.reshape(nb // 2, b)
    im = im.reshape(nb // 2, b)
    return jnp.stack([re, im], axis=1).reshape(nb, b)
