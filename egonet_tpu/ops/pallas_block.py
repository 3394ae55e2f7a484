"""Pallas TPU kernel: fused residual BasicBlock for inference.

The profiled hot path of HRNet inference is the stride-1 in-branch
BasicBlock (two 3x3 convs + folded batch-norm + residual add), which XLA
executes as two HBM-roundtrip conv fusions (~600MB accessed per conv at
64x64x48xB=384).  This kernel computes the whole block with the
intermediate activation resident in VMEM: HBM traffic drops to one read of
x and one write of y.

Layout: activations are processed as [H, W, C, B] with the batch on the
128-lane axis (the same batch-minor trick XLA picks for small-channel
convs).  Each grid step owns a (row-tile, batch-tile); each 3x3 conv row
is one [C, 9C] x [9C, W*NB] MXU matmul over a tap matrix built from
static VMEM slices.  Batch norm is pre-folded into the conv weights and
biases (inference only).

Padding semantics match the network exactly: conv2's halo reads real
conv1 outputs across tile boundaries but zeros outside the image.

STATUS: EXPERIMENTAL.  The kernel is numerically verified against the XLA
reference in interpret mode (tests/test_pallas_block.py) but is not yet
wired into the inference path: this environment's remote TPU compile
helper (tunneled chip; client/terminal libtpu mismatch forces remote
compilation) rejects it with an undiagnosable "HTTP 500:
tpu_compile_helper subprocess exit code 1".  Bisection results:

  * every individual construct compiles and runs (manual halo DMA from an
    ANY/HBM ref, tap-matrix stack/transpose/reshape, chained MXU matmuls
    through VMEM scratch, pl.when predication, iota masking);
  * fully-unrolled kernels compile up to ~6 matmuls and fail at >= 10
    (tile_rows=2 compiles; tile_rows=4 does not);
  * lax.fori_loop bodies with dynamic-index tap gathers/stores fail even
    with a SINGLE matmul, so loops cannot shrink the kernel;
  * a viable compile-anywhere shape is tile_rows=2 (6 matmuls), but its
    2x conv1 halo recomputation erases the bandwidth win (~parity with
    XLA), so it is not enabled.

On a toolchain with visible Mosaic diagnostics (or a pipelined-stencil
formulation: one grid step per output row, ring-buffered mid rows, 2
matmuls per body — blocked today by the dynamic ring indexing) this
kernel is the next ~25 ms/batch of headroom: it halves the HBM traffic of
the dominant 64x64/32x32 branch blocks.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn(kernel, scale, bias, mean, var, eps: float = 1e-5):
    """Fold an inference-mode batch norm into conv weights + bias.

    kernel: [kh, kw, Cin, Cout] (HWIO).  Returns (kernel', bias')."""
    inv = scale / np.sqrt(var + eps)
    return kernel * inv.reshape(1, 1, 1, -1), bias - mean * inv


def pack_block_weights(w1, bn1, w2, bn2, eps: float = 1e-5):
    """(w1 [3,3,C,C], bn1 stats dict, w2, bn2) -> packed kernel params:
    w1/w2 [C_out, 9*C_in] with tap-major (dy, dx, cin) rows; b1/b2 [1, C]."""
    w1f, b1 = fold_bn(np.asarray(w1, np.float32), bn1["scale"], bn1["bias"],
                      bn1["mean"], bn1["var"], eps)
    w2f, b2 = fold_bn(np.asarray(w2, np.float32), bn2["scale"], bn2["bias"],
                      bn2["mean"], bn2["var"], eps)

    def reshape(w):
        c_out = w.shape[3]
        return np.ascontiguousarray(
            np.transpose(w, (3, 0, 1, 2)).reshape(c_out, -1))

    return {"w1": jnp.asarray(reshape(w1f)),
            "b1": jnp.asarray(b1.reshape(1, -1), jnp.float32),
            "w2": jnp.asarray(reshape(w2f)),
            "b2": jnp.asarray(b2.reshape(1, -1), jnp.float32)}


def _tap_matrix(buf, r0: int, col_off: int, width: int, C: int, NB: int):
    """[9C, width*NB] tap matrix for one output row from a spatially padded
    VMEM buffer in [rows, width, C, NB] layout; rows r0..r0+2, column
    slices col_off+dx .. +width."""
    taps = []
    for dy in range(3):
        for dx in range(3):
            taps.append(buf[r0 + dy, col_off + dx:col_off + dx + width])
    m = jnp.stack(taps)                            # [9, width, C, NB]
    m = m.transpose(0, 2, 1, 3)                    # [9, C, width, NB]
    return m.reshape(9 * C, width * NB)


def _tap_matrix_flat(buf, r0: int, width: int, C: int, NB: int):
    """Tap matrix from the flat mid buffer [rows, C, width'*NB].

    Because the minor dim merges (w, b) with w major, a column shift by dx
    is a CONTIGUOUS 2D slice [dx*NB : (dx+width)*NB] — no 4D reshapes or
    transposes (which Mosaic cannot lower for vector-stored scratch)."""
    taps = []
    for dy in range(3):
        for dx in range(3):
            taps.append(buf[r0 + dy, :, dx * NB:(dx + width) * NB])
    m = jnp.stack(taps)                                   # [9, C, width*NB]
    return m.reshape(9 * C, width * NB)


def _block_kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, y_ref,
                  x_vmem, mid_ref, sem,
                  *, TH: int, TW: int, H: int, W: int, C: int, B: int):
    """One grid step: a (TH x TW) spatial tile of the fused block over the
    FULL batch (B rides the 128-lane axis; TPU block rules require the two
    minor dims to be full or 8/128-aligned, and C/B are both full here).

    x_hbm:  [H+4, W+4, C, B] padded input resident in HBM; the halo'd tile
            [TH+4, TW+4, C, B] is DMA'd manually (overlapping windows are
            not expressible with BlockSpec index maps).
    mid_ref: [TH+2, C, (TW+2)*B] VMEM scratch holding the conv1 output
            exactly as the matmul produces it (rows = channels, columns =
            merged (w, b)); conv2's shifted taps are contiguous slices.
    y_ref:  [TH, TW, C, B] output tile.
    """
    i = pl.program_id(0)
    k = pl.program_id(1)
    f32 = jnp.float32
    bf16 = jnp.bfloat16

    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * TH, TH + 4), pl.ds(k * TW, TW + 4)],
        x_vmem, sem)
    dma.start()

    w1 = w1_ref[:, :].astype(bf16)
    w2 = w2_ref[:, :].astype(bf16)
    b1 = b1_ref[0, :].reshape(C, 1)
    b2 = b2_ref[0, :].reshape(C, 1)
    mid_ref[...] = jnp.zeros_like(mid_ref)
    dma.wait()

    # conv1 for mid rows r = 0..TH+1 (absolute row m = i*TH - 1 + r) over
    # mid cols [k*TW - 1, k*TW + TW + 1); positions outside the image stay
    # zero (that is what conv2's padding must read).  The column guard is
    # handled by masking after the matmul (cheap, branch-free).
    col0 = k * TW - 1                      # absolute column of mid col 0
    col_ids = (jax.lax.broadcasted_iota(jnp.int32, (TW + 2, B), 0) + col0)
    col_ok = (jnp.logical_and(col_ids >= 0, col_ids < W)
              .reshape(1, (TW + 2) * B))

    # rows are fori_loops (NOT Python-unrolled: the compile helper rejects
    # kernels with ~10+ unrolled matmuls)
    def conv1_row(r, _):
        m_abs = i * TH - 1 + r
        taps = []
        for dy in range(3):
            for dx in range(3):
                taps.append(x_vmem[pl.ds(r + dy, 1), dx:dx + TW + 2])
        m = jnp.stack(taps)[:, 0]                       # [9, TW+2, C, B]
        taps_m = (m.transpose(0, 2, 1, 3)
                  .reshape(9 * C, (TW + 2) * B).astype(bf16))
        acc = jnp.dot(w1, taps_m, preferred_element_type=f32)
        acc = jnp.maximum(acc + b1, 0.0)                # [C, (TW+2)*B]
        acc = jnp.where(col_ok, acc, 0.0)
        row_ok = jnp.logical_and(m_abs >= 0, m_abs < H)
        acc = jnp.where(row_ok, acc, 0.0)
        mid_ref[pl.ds(r, 1)] = acc.astype(bf16)[None]
        return 0

    jax.lax.fori_loop(0, TH + 2, conv1_row, 0, unroll=False)

    def conv2_row(r, _):
        taps = []
        for dy in range(3):
            for dx in range(3):
                taps.append(
                    mid_ref[pl.ds(r + dy, 1), :, dx * B:(dx + TW) * B])
        taps_m = jnp.stack(taps)[:, 0].reshape(9 * C, TW * B).astype(bf16)
        acc = jnp.dot(w2, taps_m, preferred_element_type=f32)    # [C, TW*B]
        acc = acc + b2
        res = x_vmem[pl.ds(r + 2, 1), 2:TW + 2][0].astype(f32)   # [TW, C, B]
        out = acc.reshape(C, TW, B).transpose(1, 0, 2) + res
        y_ref[pl.ds(r, 1)] = jnp.maximum(out, 0.0).astype(y_ref.dtype)[None]
        return 0

    jax.lax.fori_loop(0, TH, conv2_row, 0, unroll=False)


def fused_basic_block(xT: jax.Array, params: dict, *, tile_rows: int = 8,
                      tile_cols: int = 16, interpret: bool = False):
    """Fused inference BasicBlock over batch-minor activations.

    xT: [H, W, C, B] bf16; params from pack_block_weights.
    Returns yT [H, W, C, B]."""
    H, W, C, B = xT.shape
    TH, TW = tile_rows, tile_cols
    assert H % TH == 0 and W % TW == 0, (H, TH, W, TW)

    xp = jnp.pad(xT, ((2, 2), (2, 2), (0, 0), (0, 0)))
    kernel = functools.partial(_block_kernel, TH=TH, TW=TW, H=H, W=W, C=C,
                               B=B)

    return pl.pallas_call(
        kernel,
        grid=(H // TH, W // TW),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # x stays in HBM
            pl.BlockSpec((C, 9 * C), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 9 * C), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TH, TW, C, B), lambda i, k: (i, k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W, C, B), xT.dtype),
        scratch_shapes=[
            pltpu.VMEM((TH + 4, TW + 4, C, B), jnp.bfloat16),
            pltpu.VMEM((TH + 2, C, (TW + 2) * B), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, params["w1"], params["b1"], params["w2"], params["b2"])


def reference_basic_block(x: jax.Array, w1, bn1, w2, bn2, eps=1e-5):
    """XLA reference (NHWC) of the same folded block, for testing."""
    def conv(h, w):
        return jax.lax.conv_general_dilated(
            h, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    inv1 = bn1["scale"] / np.sqrt(bn1["var"] + eps)
    inv2 = bn2["scale"] / np.sqrt(bn2["var"] + eps)
    y = conv(x, jnp.asarray(w1)) * inv1 + (bn1["bias"] - bn1["mean"] * inv1)
    y = jnp.maximum(y, 0)
    y = conv(y, jnp.asarray(w2)) * inv2 + (bn2["bias"] - bn2["mean"] * inv2)
    return jnp.maximum(y + x, 0)
