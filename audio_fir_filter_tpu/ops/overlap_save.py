"""Overlap-save FFT convolution engine (the TPU hot path).

Replaces the reference's per-thread O(N*M) direct time-domain loop
(/root/reference/FilterCore.h:20-79) with an O(N log B) frequency-domain
engine: rFFT(block) * H -> irFFT, overlap-save with kernel-length history
(SURVEY.md §3.5: ~200x algorithmic advantage at default shapes before any
hardware advantage).

Semantics are exactly the reference's zero-padded "same" convolution
(see :mod:`.oracle`):

    out[i] = sum_{k=0}^{M} h[k] * x[i - Mo2 + k],   x == 0 outside [0, N)

Blocking scheme (derivation in SURVEY.md §7 step 4): with FFT size B and
hop L = B - M, block j reads padded input xp[j*L : j*L + B] where
xp = [Mo2 zeros | x | right-pad zeros]; the circular convolution of the
block with the reversed kernel is alias-free in positions [M, B), which are
precisely out[j*L : j*L + L].

Two precision modes, both running the framework's own Stockham FFT
(:mod:`.fft_core` — XLA's FFT op is unimplemented on this TPU backend):
- "fast": float32 (re, im) pair FFT. Empirically ~few LSB @ 24-bit vs the
  f64 oracle; bit-clean at 16-bit.
- "high": double-float (two-float32, ~49-bit mantissa) FFT — targeting
  <= 1 LSB @ 24-bit (BASELINE.md north star).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import fft_core
from .fft_core import ARITH_DF64, ARITH_F32
from ..utils.jax_setup import configure_jax

configure_jax()

FAST = "fast"
HIGH = "high"


def default_engine() -> str:
    """The production engine for the current backend: the fused Pallas
    kernel on real TPUs (round-4 measured 2.93 Gs/s df40 / 8.27 Gs/s f32
    vs the XLA fourstep engine's ~1.4 / ~2.4 on v5e); the XLA engine
    elsewhere (the CPU test backend would run the kernel in the slow
    Pallas interpreter — engine-parametrized tests cover it explicitly)."""
    import jax

    return "pallas" if jax.default_backend() == "tpu" else "fourstep"

# Default blocks convolved per device step (plan.conv_chunk). Measured on
# v5e for the unrolled DIF engine at B=2^18 df64 (clean A/B,
# experiments/retune_micro.py): chunk 16 is the sweet spot — 1.30-1.38
# Gs/s vs 1.16 at chunk 8/24 and 0.85 at chunk 32 (per-sample cost rises
# once the chunk working set leaves favorable residency).
CONV_CHUNK = 16


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def choose_block_size(num_taps: int, requested: int = 0,
                      min_size: int = 1 << 13, max_size: int = 1 << 21) -> int:
    """FFT size B for kernel length T: smallest power of two >= 4*(T-1),
    clamped to [min_size, max_size] but always > 2*(T-1) so the hop L = B-M
    stays a useful fraction of B — with a 2^18 FLOOR for production-scale
    kernels (M >= 2^13).

    Shape evidence on v5e (fused Pallas engine, round-3/4 hardware A/Bs):
    B=2^18 (512x512 four-step) is the sweet spot whenever the kernel
    allows it, and next_pow2(4M) wins above it:
      M=17,640 (44.1 kHz):  2^18 beats the old auto 2^17 by +13%/+28%
                            high/fast (2.39/6.36 vs 2.12/4.95 Gs/s)
      M=38,400 (96 kHz):    2^18 beats 2^19 by ~18%
                            (experiments/cfg2_blocksize_ab_r03.log)
      M=76,800 (192 kHz):   2^19 (= next_pow2(4M)) beats 2^18 by
                            +13%/+19% high/fast (2.32/8.18 vs 2.07/6.85)
    Small kernels (M < 2^13, test-scale) keep the old min_size rule — at
    those sizes the CPU test suite would otherwise pay 512x512 FFTs."""
    m = num_taps - 1
    if requested:
        b = _next_pow2(requested)
        if b <= m:
            raise ValueError(f"block size {requested} must exceed kernel order {m}")
        return b
    b = max(min_size, _next_pow2(4 * max(m, 1)))
    if m >= (1 << 13):
        b = max(b, 1 << 18)
    while b > max_size and b >= 4 * _next_pow2(m + 1):
        b >>= 1
    return b


@dataclasses.dataclass(frozen=True)
class OverlapSavePlan:
    """Static convolution plan: sizes + frequency-domain kernel.

    ``H`` is the reversed, zero-padded kernel's PERMUTED-order spectrum
    (fft_core.pease_fft_np, float64 on host), in the path's arithmetic:
    C32 (fast) / CDF64 (high). The device convolution runs the
    constant-geometry FFT whose natural spectral order is this permutation,
    so no reordering ever happens on device.
    """

    num_taps: int          # T = M + 1
    block_size: int        # B (power of two)
    precision: str
    # "fourstep": 2-D constant-geometry FFT with all butterflies along the
    #   sublane axis — the production engine (4.7x faster than "pease" in
    #   df64 on v5e, fft_core four-step docstring). "pease": 1-D constant
    #   geometry in a fori_loop. "stockham": unrolled autosort (slow
    #   per-process compile; kept as a cross-check).
    engine: str = "fourstep"  # resolved value; "auto" resolves in make_plan
    # Blocks convolved per in-jit lax.map step (see CONV_CHUNK). Part of the
    # compiled program, hence of `static` — a bare module global here once
    # silently went stale in the jit cache.
    conv_chunk: int = 16
    # Frequency response in the path's arithmetic: C32 (fast) / CDF64 (high).
    H: tuple | None = dataclasses.field(default=None, compare=False)

    @property
    def m(self) -> int:
        return self.num_taps - 1

    @property
    def mo2(self) -> int:
        return self.m // 2

    @property
    def hop(self) -> int:
        return self.block_size - self.m

    @property
    def static(self) -> tuple:
        """Hashable static half of the plan (jit static_argnums carrier)."""
        return (self.num_taps, self.block_size, self.precision, self.engine,
                self.conv_chunk)


def make_plan(taps: np.ndarray, precision: str = HIGH, block_size: int = 0,
              engine: str = "auto",
              conv_chunk: int = CONV_CHUNK) -> OverlapSavePlan:
    taps = np.asarray(taps, dtype=np.float64)
    t = len(taps)
    if t % 2 != 1:
        raise ValueError("taps must have odd length (type-I linear phase)")
    b = choose_block_size(t, block_size)
    arith = {FAST: ARITH_F32, HIGH: ARITH_DF64}.get(precision)
    if arith is None:
        raise ValueError(f"unknown precision {precision!r} (use 'fast' or 'high')")
    hr = np.zeros(b, dtype=np.float64)
    hr[:t] = taps[::-1]
    if engine == "auto":
        engine = default_engine()
    if engine == "fourstep":
        H64 = fft_core.fourstep_dif_fft_np(hr, *fft_core.fourstep_split(b))
    elif engine == "pallas":
        # The fused kernel's plan-aware four-step layout, in the KERNEL
        # arith's constant representation (presplit planes for "high").
        from . import pallas_fft
        H = pallas_fft.wrap_spectrum(
            pallas_fft.kernel_spectrum_np(hr, b, arith), arith)
        return OverlapSavePlan(t, b, precision, engine, conv_chunk, H=H)
    elif engine == "pease":
        H64 = fft_core.pease_fft_np(hr)       # permuted-order spectrum
    elif engine == "stockham":
        H64 = np.fft.rfft(hr)                  # natural-order rfft spectrum
    else:
        raise ValueError(f"unknown engine {engine!r} "
                         "(use 'fourstep', 'pallas', 'pease' or 'stockham')")
    H = jax.tree.map(jnp.asarray, arith.wrap_np(H64))
    return OverlapSavePlan(t, b, precision, engine, conv_chunk, H=H)


# ----------------------------------------------------------------- core math

def _blocks_from_padded(xp: jax.Array, nb: int, hop: int, b: int) -> jax.Array:
    """Overlapped blocks [nb, B] (block j = xp[j*hop : j*hop + B]) from the
    padded 1-D signal, using only reshapes/slices/concat.

    A vmap(dynamic_slice) gather is pathologically slow on TPU; instead the
    overlapped view is assembled from k = ceil(B/hop) contiguous reshaped
    copies shifted by one hop each:  part_k[j] = xp[(j+k)*hop : (j+k+1)*hop],
    so concat(parts, axis=1)[:, :B] == blocks. Each part is a pure reshape
    of a contiguous slice — XLA compiles this to plain copies.

    Requires len(xp) >= (nb + k - 1) * hop (callers pad to this).
    """
    k = -(-b // hop)  # ceil
    parts = [
        xp[i * hop : (i + nb) * hop].reshape(nb, hop) for i in range(k)
    ]
    return jnp.concatenate(parts, axis=1)[:, :b] if k > 1 else parts[0][:, :b]


def _conv_blocks(blocks: jax.Array, H, precision: str, engine: str) -> jax.Array:
    """[nb(even), B] real blocks -> [nb, B] circular-convolution outputs."""
    arith = ARITH_F32 if precision == FAST else ARITH_DF64
    if engine == "fourstep":
        return fft_core.fourstep_conv_real_blocks(blocks, H, arith)
    if engine == "pallas":
        from . import pallas_fft
        return pallas_fft.pallas_conv_real_blocks(blocks, H, arith)
    if engine == "pease":
        return fft_core.pease_conv_real_blocks(blocks, H, arith)
    return fft_core.rfft_multiply_irfft(blocks, H, arith)


def _filter_blocks(blocks: jax.Array, H, m: int, precision: str,
                   engine: str, chunk: int) -> jax.Array:
    """[nb(even), B] blocks -> [nb, L] valid outputs (FFT . *H . iFFT, slice).

    Large batches are split into ``chunk``-block groups processed by an
    in-jit ``lax.map`` (device-serialized, small live set), with an uneven
    tail handled by one direct call.
    """
    nb = blocks.shape[0]
    nc, rem = divmod(nb, chunk)
    if nc <= 1:
        y = _conv_blocks(blocks, H, precision, engine)
    else:
        head = blocks[: nc * chunk].reshape(nc, chunk, blocks.shape[1])
        yh = jax.lax.map(
            lambda c: _conv_blocks(c, H, precision, engine), head)
        yh = yh.reshape(nc * chunk, blocks.shape[1])
        if rem:
            yt = _conv_blocks(blocks[nc * chunk :], H, precision, engine)
            y = jnp.concatenate([yh, yt], axis=0)
        else:
            y = yh
    return y[..., m:]


def _same_filter_impl(x: jax.Array, plan_static: tuple, H) -> jax.Array:
    """Zero-padded 'same' filtering of [C, N] (N static). Core jit body."""
    t, b, precision, engine, chunk = plan_static
    m, mo2, hop = t - 1, (t - 1) // 2, b - (t - 1)
    c, n = x.shape
    nb = -(-n // hop)  # ceil
    nb += nb & 1  # even block count: two real blocks per complex FFT
    # Pad so the reshape-based blocking can take k = ceil(B/hop) shifted
    # contiguous views: len(xp) = (nb + k - 1) * hop >= nb*hop + m.
    if engine == "pallas":
        # Whole-segment fused kernel: windows DMA'd straight from HBM,
        # only valid hops written — no block matrix, no unfold pass.
        # (Frames itself: a slightly shorter, tile-aligned hop.)
        from . import pallas_fft
        arith = ARITH_F32 if precision == FAST else ARITH_DF64
        y = pallas_fft.pallas_segment_filter(x, t, b, H, arith)
        if y is not None:
            return y

    k = -(-b // hop)
    pad_right = (nb + k - 1) * hop - mo2 - n
    xp = jnp.pad(x, ((0, 0), (mo2, pad_right)))

    # Channels fold into the block axis BEFORE the conv so the chunked
    # lax.map in _filter_blocks keeps its small per-step live set (a vmap
    # around it would re-batch every chunk by C). Blocks are channel-major,
    # so the [C, nb*L] unfold below is exact; complex pairing across a
    # channel boundary is fine — conv with a real kernel is real-linear
    # per block regardless of which channel a block came from.
    blocks = jax.vmap(lambda xc: _blocks_from_padded(xc, nb, hop, b))(xp)
    yb = _filter_blocks(blocks.reshape(c * nb, b), H, m, precision, engine,
                        chunk)
    return yb.reshape(c, nb * hop)[:, :n]


@functools.partial(jax.jit, static_argnums=(1,))
def _same_filter_jit(x, plan_static, H):
    return _same_filter_impl(x, plan_static, H)


def same_filter(x, plan: OverlapSavePlan) -> jax.Array:
    """Filter [N] or [C, N] float32 with reference 'same' semantics."""
    x = jnp.asarray(x, dtype=jnp.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    y = _same_filter_jit(x, plan.static, plan.H)
    return y[0] if squeeze else y


def extended_filter(xe, plan: OverlapSavePlan, out_len: int) -> jax.Array:
    """Filter with explicit halos: xe is [C, S + M] = [left Mo2 | body S | right Mo2].

    Returns out[0:S] for the body region — the primitive used by host-side
    segmentation and by the sharded time-parallel path (halos replace
    zero-padding except at true signal edges; SURVEY.md §2.3).
    """
    xe = jnp.asarray(xe, dtype=jnp.float32)
    squeeze = xe.ndim == 1
    if squeeze:
        xe = xe[None, :]
    y = _same_filter_jit(xe, plan.static, plan.H)
    y = y[:, plan.mo2 : plan.mo2 + out_len]
    return y[0] if squeeze else y


@functools.partial(jax.jit, static_argnums=(1,))
def _same_filter_peak_jit(x, plan_static, H):
    y = _same_filter_impl(x, plan_static, H)
    peak = jnp.max(jnp.abs(y)) if y.size else jnp.float32(0)
    return y, peak


def same_filter_peak(x, plan: OverlapSavePlan):
    """:func:`same_filter` that also returns the output's |max| peak,
    reduced on device — the single-segment analog of
    :func:`extended_filter_peak` (edge zero-padding stays ON DEVICE, no
    host-side padded staging copy)."""
    x = jnp.asarray(x, dtype=jnp.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    y, peak = _same_filter_peak_jit(x, plan.static, plan.H)
    return (y[0] if squeeze else y), peak


@functools.partial(jax.jit, static_argnums=(1, 3))
def _extended_filter_peak_jit(xe, plan_static, H, out_len):
    t = plan_static[0]
    mo2 = (t - 1) // 2
    y = _same_filter_impl(xe, plan_static, H)
    y = jax.lax.slice_in_dim(y, mo2, mo2 + out_len, axis=1)
    peak = jnp.max(jnp.abs(y)) if y.size else jnp.float32(0)
    return y, peak


def extended_filter_peak(xe, plan: OverlapSavePlan, out_len: int):
    """:func:`extended_filter` that also returns the segment's |max| peak,
    reduced ON DEVICE (fused into the same program) — the streaming
    pipeline's building block for the reference's maxMag reduction
    (/root/reference/ProcessFile.cp:92-97) without a second full host pass
    over the output."""
    xe = jnp.asarray(xe, dtype=jnp.float32)
    squeeze = xe.ndim == 1
    if squeeze:
        xe = xe[None, :]
    y, peak = _extended_filter_peak_jit(xe, plan.static, plan.H, out_len)
    return (y[0] if squeeze else y), peak
