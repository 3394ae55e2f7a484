"""Pallas pipelined-stencil variant of the fused residual BasicBlock.

Motivation: the environment's remote TPU compile helper rejects kernels
with >= ~10 matmuls and any lax.fori_loop with dynamic tap indexing (see
ops/pallas_block.py STATUS).  This formulation keeps EVERY kernel body at
exactly 2 matmuls with no loops and no dynamic indexing:

  * grid = (column-tiles, H + 2); the row dimension iterates fastest, so
    VMEM scratch persists across the row sweep of one column tile;
  * each step s computes ONE conv1 row (mid_abs = s - 1) into a 3-slot
    ring buffer and, once the ring is warm (s >= 2), ONE conv2 output row
    (y = s - 2) plus bias/residual/relu;
  * ring rotation is handled WITHOUT dynamic indexing: the ring is read in
    fixed slot order and the conv2 weight matrix is pre-permuted on host
    for each of the 3 possible rotations, selected per step with
    elementwise jnp.where;
  * the 3-row input window is DMA'd fresh each step from the HBM-resident
    padded input (3x input read amplification ~ 0.6 ms/batch, irrelevant
    next to the saved conv roundtrip).

STATUS: EXPERIMENTAL — but this variant COMPILES AND RUNS CORRECTLY on the
real chip at tile_cols=8 (max |err| ~2e-2 vs the XLA reference = bf16
noise).  Two findings cap its usefulness in this environment today:

  * the compile helper accepts tile_cols=8 (matmul N = 3840) but rejects
    16/32/64 with the usual opaque HTTP 500, and an iota+where column
    mask is rejected at ANY size (replaced here by scalar-gated edge
    column zeroing);
  * at tile_cols=8 the kernel is per-grid-step overhead-bound
    (528 steps x ~70 us of DMA setup / tap relayout around two ~4 us
    matmuls): ~38 ms per block vs XLA's ~3 ms in-model.  Wider tiles
    would amortize this 4-8x but cannot compile.

Kept as the working starting point for a toolchain without the kernel-size
ceiling; the XLA path remains production.

INVESTIGATION CLOSED (round 4, 2026-08-18): re-probed tile_cols=16/32 on
the then-current toolchain — both still rejected (probe_wide_tile ->
False).  The remaining idea, multi-row double-buffered bodies at
tile_cols=8, cannot win even if it compiled: per-step overhead halves per
row-doubling, so matching XLA's ~3 ms needs ~16 rows/step = 32 matmuls
per body, far past the observed ~6-10-matmul compile ceiling.  No further
rounds will be spent here unless the toolchain lifts the ceiling; the
wide-tile probe (`probe_wide_tile`) remains the cheap way to notice when
it does.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from egonet_tpu.ops.pallas_block import pack_block_weights


def pack_stencil_weights(w1, bn1, w2, bn2, eps: float = 1e-5):
    """Packed weights + the 3 rotation-permuted conv2 matrices.

    Rows of w2 are (dy, dx, c)-ordered; permutation r remaps the dy group
    read from ring slot j to logical dy = (j - r) mod 3."""
    base = pack_block_weights(w1, bn1, w2, bn2, eps)
    c_out, k9 = np.asarray(base["w2"]).shape
    c_in = k9 // 9
    w2m = np.asarray(base["w2"]).reshape(c_out, 3, 3, c_in)   # [o, dy, dx, c]
    perms = []
    for r in range(3):
        # tap matrix is built in slot order j=0,1,2; slot j holds logical
        # dy = (j - r) mod 3
        order = [(j - r) % 3 for j in range(3)]
        perms.append(w2m[:, order].reshape(c_out, k9))
    return {
        "w1": base["w1"], "b1": base["b1"], "b2": base["b2"],
        "w2p": jnp.asarray(np.stack(perms)),                  # [3, C, 9C]
    }


def _stencil_kernel(x_hbm, w1_ref, b1_ref, w2p_ref, b2_ref, y_ref,
                    x_vmem, mid_ref, sem,
                    *, TW: int, H: int, W: int, C: int, B: int):
    """One grid step: conv1 for mid row s-1, conv2 for output row s-2.

    x_hbm:  [H+4, W+4, C, B] padded input in HBM.
    x_vmem: [3, TW+4, C, B] fresh 3-row window.
    mid_ref: [3, C, (TW+2)*B] ring buffer of conv1 rows (channel-major,
             flat (w, b) columns -> shifted taps are contiguous slices).
    y_ref:  [1, TW, C, B] output row block (revisited while s < 2).
    """
    k = pl.program_id(0)
    s = pl.program_id(1)
    f32 = jnp.float32
    bf16 = jnp.bfloat16

    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(s, 3), pl.ds(k * TW, TW + 4)], x_vmem, sem)
    dma.start()

    w1 = w1_ref[:, :].astype(bf16)
    slot = jax.lax.rem(s, 3)
    # conv2 weights permuted for the current ring rotation r=(s-2) mod 3
    r = jax.lax.rem(s + 1, 3)          # (s - 2) mod 3 == (s + 1) mod 3
    w2 = jnp.where(r == 0, w2p_ref[0],
                   jnp.where(r == 1, w2p_ref[1], w2p_ref[2])).astype(bf16)
    b1 = b1_ref[0, :].reshape(C, 1)
    b2 = b2_ref[0, :].reshape(C, 1)

    dma.wait()

    # ---- conv1 for mid_abs = s - 1 over TW+2 columns ----
    taps = []
    for dy in range(3):
        for dx in range(3):
            taps.append(x_vmem[dy, dx:dx + TW + 2])
    m = jnp.stack(taps)                                  # [9, TW+2, C, B]
    taps_m = (m.transpose(0, 2, 1, 3)
              .reshape(9 * C, (TW + 2) * B).astype(bf16))
    acc1 = jnp.dot(w1, taps_m, preferred_element_type=f32)
    acc1 = jnp.maximum(acc1 + b1, 0.0)
    m_abs = s - 1
    row_ok = jnp.logical_and(m_abs >= 0, m_abs < H)
    acc1 = jnp.where(row_ok, acc1, 0.0)
    # zero the out-of-image edge columns (mid col 0 is absolute -1 on the
    # first column tile; mid col TW+1 is absolute W on the last one) with
    # scalar gates + static slices — an iota/where column mask does not
    # survive this environment's kernel compiler
    n_col_tiles = pl.num_programs(0)
    lmask = (k > 0).astype(f32)
    rmask = (k < n_col_tiles - 1).astype(f32)
    acc1 = jnp.concatenate(
        [acc1[:, :B] * lmask,
         acc1[:, B:(TW + 1) * B],
         acc1[:, (TW + 1) * B:] * rmask], axis=1)
    row_bf = acc1.astype(bf16)
    # store to ring slot (s % 3) without dynamic indexing
    for j in range(3):
        @pl.when(slot == j)
        def _():
            mid_ref[j] = row_bf

    # ---- conv2 for y = s - 2 (ring warm when s >= 2) ----
    taps2 = []
    for j in range(3):
        for dx in range(3):
            taps2.append(mid_ref[j, :, dx * B:(dx + TW) * B])
    taps2_m = jnp.stack(taps2).reshape(9 * C, TW * B).astype(bf16)
    acc2 = jnp.dot(w2, taps2_m, preferred_element_type=f32) + b2
    res = x_vmem[0, 2:TW + 2].astype(f32)                # x row s-2? see map
    out = acc2.reshape(C, TW, B).transpose(1, 0, 2) + res
    out = jnp.maximum(out, 0.0).astype(y_ref.dtype)

    @pl.when(s >= 2)
    def _():
        y_ref[0] = out


def fused_basic_block_stencil(xT: jax.Array, params: dict, *,
                              tile_cols: int = 32,
                              interpret: bool = False):
    """Pipelined-stencil fused BasicBlock.

    xT: [H, W, C, B] bf16; params from pack_stencil_weights."""
    H, W, C, B = xT.shape
    TW = tile_cols
    assert W % TW == 0

    xp = jnp.pad(xT, ((2, 2), (2, 2), (0, 0), (0, 0)))
    kernel = functools.partial(_stencil_kernel, TW=TW, H=H, W=W, C=C, B=B)

    def out_map(k, s):
        return (jnp.maximum(s - 2, 0), k, 0, 0)

    return pl.pallas_call(
        kernel,
        grid=(W // TW, H + 2),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((C, 9 * C), lambda k, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda k, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, C, 9 * C), lambda k, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda k, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TW, C, B), out_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W, C, B), xT.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, TW + 4, C, B), jnp.bfloat16),
            pltpu.VMEM((3, C, (TW + 2) * B), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, params["w1"], params["b1"], params["w2p"], params["b2"])


# ---------------------------------------------------------------------------
# Toolchain probe (VERDICT r2 task: keep the kernel parked but cheap to
# revive) — the stencil becomes competitive only with wide column tiles,
# which the current remote compile helper rejects.  probe_wide_tile()
# attempts an actual compilation at the competitive width so the kernel
# auto-enables the day the toolchain ceiling lifts.
# ---------------------------------------------------------------------------

_PROBE_CACHE: dict = {}


def probe_args(tile_cols: int = 32, channels: int = 48, width: int = 64,
               batch: int = 8, height: int = 8):
    """Build a (x, params) pair shaped for ``fused_basic_block_stencil``:
    x is [H, W, C, B] bf16 with W divisible by tile_cols.  Shared by the
    toolchain probe and its shape-compatibility test."""
    assert width % tile_cols == 0, (width, tile_cols)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(height, width, channels, batch), jnp.bfloat16)
    params = pack_stencil_weights(
        rng.randn(3, 3, channels, channels) * 0.05,
        {"scale": np.ones(channels), "bias": np.zeros(channels),
         "mean": np.zeros(channels), "var": np.ones(channels)},
        rng.randn(3, 3, channels, channels) * 0.05,
        {"scale": np.ones(channels), "bias": np.zeros(channels),
         "mean": np.zeros(channels), "var": np.ones(channels)})
    return x, params


def probe_wide_tile(tile_cols: int = 32, channels: int = 48,
                    width: int = 64) -> bool:
    """True iff the current toolchain compiles the stencil kernel at a
    column-tile width that amortizes the per-grid-step overhead (>= 16).
    Result is cached per (tile_cols, channels, width)."""
    key = (tile_cols, channels, width)
    if key in _PROBE_CACHE:
        return _PROBE_CACHE[key]
    ok = False
    try:
        x, params = probe_args(tile_cols, channels, width)
        out = fused_basic_block_stencil(x, params, tile_cols=tile_cols)
        ok = bool(np.isfinite(np.asarray(out, np.float32)).all())
    except Exception:
        ok = False
    _PROBE_CACHE[key] = ok
    return ok


def stencil_enabled(flag: str | None = None) -> bool:
    """Resolve the EGONET_PALLAS_STENCIL flag: '1' forces on, '0' (default)
    keeps the production XLA path, 'auto' probes the toolchain."""
    import os
    flag = flag if flag is not None else os.environ.get(
        "EGONET_PALLAS_STENCIL", "0")
    if flag == "1":
        return True
    if flag == "auto":
        return probe_wide_tile()
    return False
