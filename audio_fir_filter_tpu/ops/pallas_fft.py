"""Pallas TPU kernels for the four-step overlap-save convolution.

The XLA ``fourstep`` engine (ops/fft_core.py) materializes every FFT stage
to HBM: ~22 full read+write passes per convolved block. These kernels keep
an entire *phase* of the four-step factorization resident in VMEM, cutting
HBM traffic to ~10 passes and running the stage pipeline back-to-back on
the VPU:

  K1  phase-1 forward: all radix stages of the length-R transform over a
      [R, CT] column tile + the four-step twiddle — one HBM read+write.
  K2  fused spectral core: length-C forward stages, multiply by the
      kernel's spectrum H, and the length-C inverse stages — three logical
      passes in one kernel, one HBM read+write.
  K3  phase-1 inverse: conjugate four-step twiddle + length-R inverse.

Between kernels the [R, C] <-> [C, R] transposes run as plain XLA ops.

The in-kernel transforms are in-place DIF (forward) / DIT (inverse)
radix-4 stages (fft_core.fft_dif_rows / ifft_dit_rows): every stage
reads and writes contiguous row blocks. This matters specifically under
Mosaic — the constant-geometry inverse's strided deinterleave reads
lowered ~7x slower than its forward on v5e (experiments/pallas_micro.py).
Spectra therefore live in the DIF digit-reversed layout
(fft_core.fourstep_dif_fft_np), never materialized in natural order.

All complex values are explicit (re, im) plane pytrees in the engine's
arithmetic (C32 or CDF64 — df64 ops are plain jnp ops and run inside
Pallas unchanged, ops/df64.py).

STATUS (measured, not the default): at production size (B=2^18 df64,
chunk 16) this path runs 4.5x SLOWER than the XLA ``fourstep`` engine on
v5e (experiments/engine_compare.py: 283 vs 1260 Ms/s raw; fourstep's
sum-of-parts is ~5.4x its fused time, experiments/where_time.py — XLA
already fuses the stage chain so aggressively that the HBM-pass savings
this kernel buys back are smaller than Mosaic's lowering overhead on the
stage bodies). Kept as a selectable engine (``--engine pallas``) and as
the scaffold for future Mosaic work; ``fourstep`` is the production
default.

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
from .fft_core import ARITH_DF64, ARITH_F32

TILE_LANES = 128

# The Mosaic default scoped-VMEM cap (16 MiB) is below v5e's physical VMEM;
# the unrolled in-kernel stage pipeline needs headroom for its butterfly
# temporaries (measured ~24 MiB at [1024, 128] df64 tiles).
_VMEM_LIMIT = 96 * 1024 * 1024


def _tmap(f, *trees):
    return jax.tree.map(f, *trees)


def _arith(name: str):
    return ARITH_F32 if name == "f32" else ARITH_DF64


# ------------------------------------------------------------ table pytrees

@functools.lru_cache(maxsize=16)
def _tables_np(b: int, arith_name: str):
    """Host tables for block size b: per-phase DIF stage twiddles and the
    DIF-ordered four-step twiddle T [R, C], in the arith's representation."""
    arith = _arith(arith_name)
    r, c = fc.fourstep_split(b)
    return {
        "tw_r": fc.dif_tables(r, arith_name),
        "tw_c": fc.dif_tables(c, arith_name),
        "T": arith.wrap_np(fc._fourstep_dif_twiddle_np(r, c)),
    }


def conv_tables(b: int, arith_name: str):
    """Device-ready pytree of the Pallas conv's constant inputs."""
    return jax.tree.map(jnp.asarray, _tables_np(b, arith_name))


# ----------------------------------------------------------- kernel plumbing

def _use_interpret() -> bool:
    """Compiled Mosaic on real TPU; interpreter elsewhere (CPU tests)."""
    return jax.devices()[0].platform != "tpu"


def _tiled_call(body, z, consts, tile: int, lanes_blocked: tuple,
                interpret: bool):
    """One pallas_call running ``body(z_tile, consts_tile) -> z_tile``.

    z: complex pytree, leaves [batch, n, V]. The kernel sees [1, n, tile]
    blocks: the full transform axis resident in VMEM, grid over
    (batch, V/tile). consts: pytree of constant inputs; leaves reached by
    a top-level key in ``lanes_blocked`` are blocked [dim0, tile] along
    lanes with the data, the rest load whole.
    """
    leaves, zdef = jax.tree.flatten(z)
    citems = jax.tree_util.tree_flatten_with_path(consts)[0]
    cdef = jax.tree.structure(consts)
    cleaves = [cl for _, cl in citems]
    batch, n, v = leaves[0].shape
    tile = min(tile, v)
    nz, ncst = len(leaves), len(cleaves)

    def kernel(*refs):
        zrefs, crefs = refs[:nz], refs[nz : nz + ncst]
        orefs = refs[nz + ncst :]
        zt = jax.tree.unflatten(zdef, [rf[0] for rf in zrefs])
        cc = jax.tree.unflatten(cdef, [rf[...] for rf in crefs])
        out = body(zt, cc)
        for rf, leaf in zip(orefs, jax.tree.leaves(out)):
            rf[0] = leaf

    zspec = pl.BlockSpec((1, n, tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)
    cspecs = []
    for path, cl in citems:
        name = path[0].key if hasattr(path[0], "key") else None
        if name in lanes_blocked:
            cspecs.append(pl.BlockSpec((cl.shape[0], tile),
                                       lambda i, j: (0, j),
                                       memory_space=pltpu.VMEM))
        else:
            cspecs.append(pl.BlockSpec(cl.shape,
                                       lambda i, j, _nd=cl.ndim: (0,) * _nd,
                                       memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kernel,
        grid=(batch, max(1, v // tile)),
        in_specs=[zspec] * nz + cspecs,
        out_specs=[zspec] * nz,
        out_shape=[jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(*leaves, *cleaves)
    return jax.tree.unflatten(zdef, out)


# ------------------------------------------------------------- the conv op

def pallas_conv_real_blocks(blocks: jnp.ndarray, H2, arith=ARITH_DF64,
                            interpret: bool | None = None) -> jnp.ndarray:
    """Circular convolution of real blocks with a real kernel — the Pallas
    engine. Contract mirrors fft_core.fourstep_conv_real_blocks: blocks
    [nb(even), B] float32 -> [nb, B] float32, two real blocks per complex
    FFT. ``H2`` is the kernel's DIF four-step-layout spectrum [C, R]
    (host: fft_core.fourstep_dif_fft_np) in the arith's representation.
    """
    if interpret is None:
        interpret = _use_interpret()
    nb, b = blocks.shape
    r, c = fc.fourstep_split(b)
    tabs = conv_tables(b, arith.name)

    z = arith.from_f32(blocks[0::2], blocks[1::2])        # [nb/2, B]
    z = _tmap(lambda t: t.reshape(t.shape[:-1] + (r, c)), z)

    # K1: phase-1 forward + four-step twiddle, [R, CT] tiles.
    def k1(zt, cc):
        y = fc.fft_dif_rows(zt, r, arith, tabs=cc["tw"])
        return arith.mul(y, cc["T"])

    ct = min(TILE_LANES, c)
    z = _tiled_call(k1, z, {"tw": tabs["tw_r"], "T": tabs["T"]},
                    ct, ("T",), interpret)

    z = _tmap(lambda t: jnp.swapaxes(t, -1, -2), z)        # [.., C, R]

    # K2: fused length-C forward x H x length-C inverse, [C, RT] tiles.
    def k2(zt, cc):
        y = fc.fft_dif_rows(zt, c, arith, tabs=cc["tw"])
        y = arith.mul(y, cc["H"])
        return fc.ifft_dit_rows(y, c, arith, tabs=cc["tw"])

    rt = min(TILE_LANES, r)
    z = _tiled_call(k2, z, {"tw": tabs["tw_c"], "H": H2},
                    rt, ("H",), interpret)

    z = _tmap(lambda t: jnp.swapaxes(t, -1, -2), z)        # [.., R, C]

    # K3: conjugate four-step twiddle + phase-1 inverse.
    def k3(zt, cc):
        y = arith.mul(zt, arith.conj(cc["T"]))
        return fc.ifft_dit_rows(y, r, arith, tabs=cc["tw"])

    z = _tiled_call(k3, z, {"tw": tabs["tw_r"], "T": tabs["T"]},
                    ct, ("T",), interpret)

    z = _tmap(lambda t: t.reshape(t.shape[:-2] + (b,)), z)
    re, im = arith.to_f32(z)
    return jnp.stack([re, im], axis=1).reshape(nb, b)
