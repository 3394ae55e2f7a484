"""ROI packing for the host->device transport of instance crops.

The reference ships whole images to the accelerator and crops there is no —
its host loop crops with cv2 before transfer (egonet.py:105-155).  Our fused
pipeline warps on device, which round 2 fed with full zero-padded canvases
([B, 384, 1280, 3] uint8): simple, but ~90% of those bytes are pixels no
warp ever reads, and on a bandwidth-constrained host->device link the dead
pixels dominate end-to-end latency (BENCH_r02: e2e at 9.3% of core).

This module packs ONLY each instance's warp read-footprint into one compact
canvas:

  * the separable warp's 1-D hat weights read source coordinates
    ``c + k*i`` (i over the output axis), so instance n touches exactly the
    axis-aligned rectangle (c-1, c+k*(n_out-1)+1) per axis — its *footprint*;
  * footprints (UNclipped, so out-of-image zero-border reads stay zero) are
    shelf-packed (NFDH) into a canvas of bucketed width/height;
  * the warp then samples the canvas through per-instance INTEGER offsets
    added to the source indices: integer+integer fp32 sums below 2^24 are
    exact, so the interpolation WEIGHTS are bit-identical to the
    full-canvas warp's and outputs agree to 1 fp32 ulp — the only residue
    is XLA's per-shape FMA/reduction codegen on the weight x row-sum
    products (asserted by tests/test_roi_packing.py).

Packing also lifts the canvas-mode restriction that source images fit the
fixed 384x1280 canvas: only footprints matter.

Everything here is host-side numpy; the device half is
``ops.affine.warp_affine_separable_windowed``.
"""

from __future__ import annotations

import dataclasses

import numpy as np

# Shape discipline: every distinct (canvas_h, canvas_w, window_h) triple
# compiles a separate XLA program, so all three are coarsely quantized.
# Two profiles trade transported zero-bytes against program count:
#
#   "transport" (default, the batch pipeline): width from a small bucket
#     set, canvas/window heights in 256-row steps (max ~0.78 MB of zero
#     rows at the 2048 width, ~7% average overhead).  A fixed batch-size
#     workload settles on 2-3 programs.
#   "serving" (egonet_tpu/serving): geometric (power-of-two) height
#     levels from a 512-row base and a coarser width set.  Request-driven
#     micro-batches are RAGGED — content-proportional 256-row height
#     levels multiply into dozens of one-off XLA programs (minutes of
#     compile each); geometric levels bound the whole shape set to a
#     handful at the cost of up to ~2x zero rows per canvas, the right
#     trade on a PCIe host where the extra bytes are microseconds.  The
#     512 base + 2048-min width collapse the small-batch end (measured
#     on-rig: with 256-base/1024-width the load benchmark still compiled
#     novel shapes three settle passes in); the companion lever is the
#     serving instance-bucket floor in models/egonet.dispatch_annot_dict.
_W_BUCKETS = (256, 512, 1024, 2048, 4096)
_W_BUCKETS_SERVING = (2048, 4096)
_H_QUANT = 256
_H_BASE_SERVING = 512


def _quantize_h(h: int, profile: str) -> int:
    h = int(-(-h // _H_QUANT) * _H_QUANT)           # next 256 multiple
    if profile == "serving":
        level = _H_BASE_SERVING
        while level < h:
            level *= 2
        return level
    return h
# footprints larger than this per axis fall back to canvas mode (a
# degenerate detector box, not a real crop)
MAX_SLOT = 4096


@dataclasses.dataclass
class PackPlan:
    """Host-side placement of every instance footprint."""
    x_lo: np.ndarray          # [N] int, clipped footprint origin (source)
    y_lo: np.ndarray          # [N] int
    slot_w: np.ndarray        # [N] int
    slot_h: np.ndarray        # [N] int
    x0: np.ndarray            # [N] int, placement in the packed canvas
    y0: np.ndarray            # [N] int
    canvas_h: int
    canvas_w: int
    window_h: int             # static dynamic-slice window height
    win_y: np.ndarray         # [N] int32, per-instance window start row
    offsets: np.ndarray       # [N, 2] float32 integer-valued (x_off, y_off)
    bounds: np.ndarray        # [N, 4] f32 (x0, x1, y0, y1) valid-read
    #                           ranges — x in canvas columns, y in
    #                           window-relative rows (weight frames)

    @property
    def canvas_bytes(self) -> int:
        return self.canvas_h * self.canvas_w * 3


def _footprints(inv_mats: np.ndarray, out_hw) -> tuple:
    """Per-instance unclipped read rectangles of the separable warp.

    inv_mats: [N, 2, 3] float64 axis-aligned patch->source affines.
    Returns (x_lo, y_lo, slot_w, slot_h) int arrays.  The +-1 slack beyond
    the exact hat-weight support absorbs fp32 coordinate rounding on
    device.
    """
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    cx, kx = inv_mats[:, 0, 2], inv_mats[:, 0, 0]
    cy, ky = inv_mats[:, 1, 2], inv_mats[:, 1, 1]
    x_lo = np.floor(cx).astype(np.int64) - 1
    x_hi = np.floor(cx + kx * (out_w - 1)).astype(np.int64) + 2
    y_lo = np.floor(cy).astype(np.int64) - 1
    y_hi = np.floor(cy + ky * (out_h - 1)).astype(np.int64) + 2
    return x_lo, y_lo, x_hi - x_lo + 1, y_hi - y_lo + 1


def _shelf_pack(slot_w: np.ndarray, slot_h: np.ndarray, bin_w: int):
    """Next-fit-decreasing-height shelf packing.  Returns (x0, y0, height)."""
    n = len(slot_w)
    x0 = np.zeros(n, np.int64)
    y0 = np.zeros(n, np.int64)
    cur_x = cur_y = shelf_h = 0
    for i in np.argsort(-slot_h, kind="stable"):
        w = int(slot_w[i])
        if cur_x + w > bin_w and cur_x > 0:
            cur_y += shelf_h
            cur_x = shelf_h = 0
        x0[i], y0[i] = cur_x, cur_y
        shelf_h = max(shelf_h, int(slot_h[i]))
        cur_x += w
    return x0, y0, cur_y + shelf_h


def plan(inv_mats: np.ndarray, out_hw,
         img_wh: np.ndarray, profile: str = "transport") -> PackPlan | None:
    """Compute a packing plan, or None when footprints are degenerate.

    img_wh: [N, 2] per-instance source frame (width, height).  Footprints
    are CLIPPED to the frame — out-of-image reads (box enlargement past an
    edge) contribute exactly zero in the full-canvas warp, and the packed
    warp reproduces that with exact zero WEIGHTS (the ``bounds`` mask)
    instead of shipping zero pixels.  Edge-hugging boxes shed 15-30% of
    their slot bytes this way.

    profile: "transport" (minimal bytes) or "serving" (bounded program
    count) — see the shape-discipline note above.  The placement and
    weight math are identical; only the canvas/window padding differs,
    so warp outputs are the same under either profile.
    """
    if profile not in ("transport", "serving"):
        raise ValueError(f"unknown packing profile {profile!r}")
    inv_mats = np.asarray(inv_mats, np.float64).reshape(-1, 2, 3)
    img_wh = np.asarray(img_wh).reshape(-1, 2)
    x_lo, y_lo, slot_w, slot_h = _footprints(inv_mats, out_hw)
    if (slot_w.max(initial=0) > 3 * MAX_SLOT
            or slot_h.max(initial=0) > 3 * MAX_SLOT):
        return None                        # degenerate affine, not a crop
    # clip to the source frame (keep >= 1x1 so every instance has a slot;
    # a fully out-of-frame crop gets an empty bounds mask -> zero output)
    x_hi = np.minimum(x_lo + slot_w, img_wh[:, 0].astype(np.int64))
    y_hi = np.minimum(y_lo + slot_h, img_wh[:, 1].astype(np.int64))
    x_lo = np.maximum(x_lo, 0)
    y_lo = np.maximum(y_lo, 0)
    empty = (x_hi <= x_lo) | (y_hi <= y_lo)
    x_lo = np.where(empty, 0, x_lo)
    y_lo = np.where(empty, 0, y_lo)
    slot_w = np.where(empty, 1, np.maximum(x_hi - x_lo, 1))
    slot_h = np.where(empty, 1, np.maximum(y_hi - y_lo, 1))
    if slot_w.max(initial=0) > MAX_SLOT or slot_h.max(initial=0) > MAX_SLOT:
        return None

    total_area = int((slot_w * slot_h).sum())
    # aim for a roughly square canvas (NFDH waste stays low and the height
    # bucket overhead is amortized); width must hold the widest footprint
    target_w = max(int(slot_w.max()), int(np.sqrt(total_area * 1.2)))
    buckets = _W_BUCKETS_SERVING if profile == "serving" else _W_BUCKETS
    canvas_w = next((w for w in buckets if w >= target_w), buckets[-1])
    if canvas_w < slot_w.max():
        return None

    x0, y0, height = _shelf_pack(slot_w, slot_h, canvas_w)
    window_h = _quantize_h(int(slot_h.max()), profile)
    canvas_h = max(_quantize_h(int(height), profile), window_h)
    win_y = np.minimum(y0, canvas_h - window_h).astype(np.int32)

    offsets = np.stack([
        (x_lo - x0).astype(np.float32),
        (y_lo - y0 + win_y).astype(np.float32),
    ], axis=1)
    bounds = np.stack([
        x0, np.where(empty, 0, x0 + slot_w),
        y0 - win_y, np.where(empty, 0, y0 - win_y + slot_h),
    ], axis=1).astype(np.float32)
    return PackPlan(x_lo=x_lo, y_lo=y_lo, slot_w=slot_w, slot_h=slot_h,
                    x0=x0, y0=y0, canvas_h=canvas_h, canvas_w=canvas_w,
                    window_h=window_h, win_y=win_y, offsets=offsets,
                    bounds=bounds)


def assemble(plan: PackPlan, images: list, img_idx: np.ndarray) -> np.ndarray:
    """Copy every instance's (image-clipped) footprint into the canvas.

    images: list of decoded HWC uint8 frames; img_idx: [N] instance ->
    frame index."""
    canvas = np.zeros((plan.canvas_h, plan.canvas_w, 3), np.uint8)
    for i in range(len(img_idx)):
        img = images[img_idx[i]]
        sx0, sy0 = int(plan.x_lo[i]), int(plan.y_lo[i])
        sx1 = min(sx0 + int(plan.slot_w[i]), img.shape[1])
        sy1 = min(sy0 + int(plan.slot_h[i]), img.shape[0])
        if sx0 >= sx1 or sy0 >= sy1:
            continue                      # crop fully outside the frame
        canvas[int(plan.y0[i]):int(plan.y0[i]) + (sy1 - sy0),
               int(plan.x0[i]):int(plan.x0[i]) + (sx1 - sx0)] = \
            img[sy0:sy1, sx0:sx1]
    return canvas
