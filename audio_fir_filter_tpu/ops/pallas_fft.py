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

So every stage here is a roll butterfly: the phase plan is
``fft_core.dif_plan_roll(n, n)`` — all radix-2, block lengths n/2 .. 1.
The digit-reversed row order this produces is never materialized: the
kernel's spectrum layout (:func:`kernel_spectrum_np`) and the four-step
twiddle are generated on host by the plan-aware mirrors
(fft_core.fourstep_dif_fft_np / _fourstep_dif_twiddle_np).

Rolls are mathematically the SAME radix-2 stages as the strided
formulation (fft_core.dif_stage), so the host float64 mirror
``fft_core.dif_fft_np(x, plan)`` validates them directly.

Precision: for the "high" path the in-kernel arithmetic is the RELAXED
double-float variant (fft_core.ARITH_DF64_RELAXED — unnormalized
intermediates, ~25% fewer VPU flops; error analysis at
df64.add_relaxed). The kernel is VPU-bound, so unlike the XLA engine the
flop cut is expected to pay here. Same oracle gates as every engine.

STATUS (measured on v5e at B=2^18, chunk 16; experiments/fused_ab.py):
f32: 1.397 ms = 3.00 Gs/s raw — 1.8x the XLA fourstep engine (2.512 ms).
df64: 3.945 ms = 1.06 Gs/s — VPU-bound on double-float butterfly flops
(~3.2 Tflop/s sustained, at the VPU roofline for the current per-point
flop count), 0.68x the HBM-bound XLA engine. Cross-engine max|diff| vs
fourstep: 0.25 LSB@24 (df64). The df64 flop-count reductions (presplit
twiddle tables, shared Dekker splits, mixed strided/roll plan) are the
active optimization path.

Shapes: Mosaic needs lane dim >= 128 and sublane dim >= 8 to tile well;
below that (tiny test blocks on a real TPU) the same math runs as a
plain XLA mirror (:func:`_conv_xla_mirror`) with identical tables and
layout, so outputs stay engine-consistent at any block size.

Reference parity: this is the TPU-native replacement for the reference's
direct-convolution hot loop /root/reference/FilterCore.h:64-69.
"""

from __future__ import annotations

import functools

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


def _arith(name: str):
    return ARITH_F32 if name == "f32" else ARITH_DF64


def phase_plan(n: int):
    """The kernel's stage plan for a length-n row transform: all radix-2
    (every stage lowers as a sublane roll)."""
    return fc.dif_plan_roll(n, n)


def kernel_spectrum_np(h_padded: np.ndarray, b: int) -> np.ndarray:
    """Host float64 spectrum of the (reversed, zero-padded) kernel in THIS
    engine's four-step layout: [C, R], roll plans on both phases."""
    r, c = fc.fourstep_split(b)
    return fc.fourstep_dif_fft_np(h_padded, r, c,
                                  plan_r=phase_plan(r), plan_c=phase_plan(c))


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
    """Per-stage roll twiddles for phase_plan(n); None for d == 1 (all
    twiddles exactly 1 — the stage skips its multiply)."""
    arith = _arith(arith_name)
    out = []
    for kind, d in phase_plan(n):
        assert kind == "r2"
        out.append(None if d == 1 else arith.wrap_np(_roll_twiddle_np(n, d)))
    return tuple(out)


@functools.lru_cache(maxsize=16)
def _conv_tables_np(b: int, arith_name: str):
    """All constant inputs of the fused kernel for block size b. The
    conjugate four-step twiddle is NOT tabulated — the kernel conjugates
    T tile-by-tile (a [r, LT] negation is cheaper than 4 MiB more VMEM)."""
    arith = _arith(arith_name)
    r, c = fc.fourstep_split(b)
    T = fc._fourstep_dif_twiddle_np(r, c, plan_r=phase_plan(r))
    return {
        "tw_r": _phase_tables_np(r, arith_name),
        "tw_c": _phase_tables_np(c, arith_name),
        "T": arith.wrap_np(T),
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


def _roll_stage_fwd(z, d: int, w, n: int, arith):
    """One radix-2 DIF stage at block length d via sublane rolls: the
    same math as fft_core.dif_stage('r2', d) — top rows a+b, bottom rows
    (a-b)*w — with partners fetched by roll instead of strided slices."""
    m = _mask(n, d)
    u = _roll(z, -d, n)                      # z[i+d] (top rows' partner)
    v = _roll(z, d, n)                       # z[i-d] (bottom rows' partner)
    merged = _tmap(lambda a, b_: jnp.where(m, a, b_),
                   arith.add(z, u), arith.sub(v, z))
    return merged if w is None else arith.mul(merged, w)


def _roll_stage_inv(z, d: int, w, n: int, arith):
    """Inverse (DIT) of :func:`_roll_stage_fwd`: conj twiddle applied on
    input, then top rows t[i] + t[i+d], bottom rows t[i-d] - t[i]."""
    t = z if w is None else arith.mul(z, arith.conj(w))
    m = _mask(n, d)
    u = _roll(t, -d, n)
    v = _roll(t, d, n)
    return _tmap(lambda a, b_: jnp.where(m, a, b_),
                 arith.add(t, u), arith.sub(v, t))


def _run_fwd(z, n: int, tabs, arith):
    for (kind, d), w in zip(phase_plan(n), tabs):
        z = _roll_stage_fwd(z, d, w, n, arith)
    return z


def _run_inv(z, n: int, tabs, arith):
    """Inverse stages (reversed plan), WITHOUT the 1/n scaling — the conv
    applies one combined 1/B at the end."""
    for (kind, d), w in zip(reversed(phase_plan(n)), reversed(tabs)):
        z = _roll_stage_inv(z, d, w, n, arith)
    return z


def _conv_body(x0, x1, cc, r: int, c: int, arith):
    """The whole circular convolution of one complex block, [r, c] planes
    resident (monolithic form — the XLA mirror; the Mosaic kernel runs the
    lane-tiled equivalent below)."""
    b = r * c
    z = arith.from_f32(x0, x1)
    z = _run_fwd(z, r, cc["tw_r"], arith)            # phase-1 fwd (rows=R)
    z = arith.mul(z, cc["T"])
    z = _tmap(lambda t: jnp.swapaxes(t, -1, -2), z)  # [c, r]
    z = _run_fwd(z, c, cc["tw_c"], arith)            # phase-2 fwd
    z = arith.mul(z, cc["H"])                        # spectral multiply
    z = _run_inv(z, c, cc["tw_c"], arith)            # phase-2 inv
    z = _tmap(lambda t: jnp.swapaxes(t, -1, -2), z)  # [r, c]
    z = arith.mul(z, arith.conj(cc["T"]))
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
# of VMEM (measured), the tiled one fits comfortably.
LANE_TILE = 128


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
    karith = ARITH_DF64_RELAXED if arith is ARITH_DF64 else arith
    tabs = conv_tables(b, arith.name)
    cc = dict(tabs, H=H2)

    if not interpret and (c < 128 or r < 8):
        # Below Mosaic's efficient tile floor: identical math in XLA.
        return _conv_xla_mirror(blocks, cc, r, c, karith)

    x = blocks.reshape(nb // 2, 2, r, c)
    cleaves, cdef = jax.tree.flatten(cc)
    ncst = len(cleaves)
    # Planes per complex value in this arith (df64: 4, f32: 2), and the
    # plane order used to park pytrees in scratch.
    zdef = jax.tree.structure(karith.from_f32(jnp.zeros(()), jnp.zeros(())))
    nplanes = zdef.num_leaves
    lt_c = min(LANE_TILE, c)
    lt_r = min(LANE_TILE, r)

    def kernel(x_ref, *refs):
        crefs = refs[:ncst]
        o_ref, zA, zB = refs[ncst], refs[ncst + 1], refs[ncst + 2]
        cc_r = jax.tree.unflatten(cdef, list(crefs))
        tw_r = _tmap(lambda rf: rf[...], cc_r["tw_r"])
        tw_c = _tmap(lambda rf: rf[...], cc_r["tw_c"])

        def store(ref, sl, z):
            for k, leaf in enumerate(jax.tree.leaves(z)):
                ref[k, :, sl] = leaf

        def load(ref, sl):
            return jax.tree.unflatten(
                zdef, [ref[k, :, sl] for k in range(nplanes)])

        # Tile loops are lax.fori_loop, NOT Python-unrolled: Mosaic gives
        # each unrolled tile's SSA chain its own VMEM slots (measured
        # 151 MiB > the 128 MiB chip), while a dynamic loop is compiled
        # once and the live set is a single tile's chain.

        # Phase A: pack + phase-1 forward + four-step twiddle, [r, lt_c]
        # column tiles of the [r, c] block.
        def phase_a(j, carry):
            sl = pl.ds(j * lt_c, lt_c)
            z = karith.from_f32(x_ref[0, 0, :, sl], x_ref[0, 1, :, sl])
            z = _run_fwd(z, r, tw_r, karith)
            z = karith.mul(z, _tmap(lambda rf: rf[:, sl], cc_r["T"]))
            store(zA, sl, z)
            return carry

        jax.lax.fori_loop(0, c // lt_c, phase_a, 0)

        # Transpose [r, c] -> [c, r], whole planes.
        for k in range(nplanes):
            zB[k] = jnp.swapaxes(zA[k], 0, 1)

        # Phase B: phase-2 forward, spectral multiply, phase-2 inverse on
        # [c, lt_r] column tiles.
        def phase_b(j, carry):
            sl = pl.ds(j * lt_r, lt_r)
            z = load(zB, sl)
            z = _run_fwd(z, c, tw_c, karith)
            z = karith.mul(z, _tmap(lambda rf: rf[:, sl], cc_r["H"]))
            z = _run_inv(z, c, tw_c, karith)
            store(zB, sl, z)
            return carry

        jax.lax.fori_loop(0, r // lt_r, phase_b, 0)

        # Transpose back.
        for k in range(nplanes):
            zA[k] = jnp.swapaxes(zB[k], 0, 1)

        # Phase C: conjugate twiddle + phase-1 inverse + 1/B + unpack.
        def phase_c(j, carry):
            sl = pl.ds(j * lt_c, lt_c)
            z = load(zA, sl)
            z = karith.mul(
                z, karith.conj(_tmap(lambda rf: rf[:, sl], cc_r["T"])))
            z = _run_inv(z, r, tw_r, karith)
            z = karith.mul_pow2(z, 1.0 / b)
            re, im = karith.to_f32(z)
            o_ref[0, 0, :, sl] = re
            o_ref[0, 1, :, sl] = im
            return carry

        jax.lax.fori_loop(0, c // lt_c, phase_c, 0)

    xspec = pl.BlockSpec((1, 2, r, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    # Constant index maps: Pallas fetches each table once and keeps it
    # resident in VMEM across grid steps.
    cspecs = [pl.BlockSpec(cl.shape, lambda i, _nd=cl.ndim: (0,) * _nd,
                           memory_space=pltpu.VMEM) for cl in cleaves]
    y = pl.pallas_call(
        kernel,
        grid=(nb // 2,),
        in_specs=[xspec] + cspecs,
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((nplanes, r, c), jnp.float32),
            pltpu.VMEM((nplanes, c, r), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(x, *cleaves)
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
