"""EgoNet end-to-end pipeline: crop -> keypoints -> lift -> 6DoF -> alpha.

This is the TPU-native re-design of the reference orchestrator
(/root/reference/libs/model/egonet.py:28-507).  The reference interleaves
Python loops, cv2 calls and four host<->device transfers per batch; here the
entire per-batch computation is ONE jitted XLA program over fixed-shape
padded instance buckets:

    images   [B, Hc, Wc, 3]  uint8, padded to a canonical resolution
    inv_mats [N, 2, 3]       patch->source affines (host-computed, tiny)
    img_idx  [N]             which image each instance crops from
    valid    [N]             padding mask
      |> device-side bilinear warp + ImageNet normalize      (ops/affine.py)
      |> HRNet 'coordinates' head -> local coords [N, 33, 2] (models/hrnet.py)
      |> inverse-affine to screen coords                     (batched matmul)
      |> normalize -> FC lifter -> un-normalize -> cuboids   (models/fc_lifter)
      |> template fit + batched Kabsch SVD + euler + alpha   (geometry/rigid)

Host code only decodes PNGs, computes the 2x3 crop matrices and formats the
KITTI txt lines.  Instance counts are padded to power-of-two buckets so the
program compiles a handful of times, then runs for every batch.
"""

from __future__ import annotations

import functools
from os.path import join as pjoin

import numpy as np
import jax
import jax.numpy as jnp

from egonet_tpu.constants import norm_stats
from egonet_tpu.geometry import rigid
from egonet_tpu.models.fc_lifter import build_fc_model
from egonet_tpu.models.factory import build_heatmap_model
from egonet_tpu.ops import affine
from egonet_tpu.io import torch_convert


def _round_up_bucket(n: int, minimum: int = 8) -> int:
    """Instance-count bucket: powers of two up to 128, then multiples of
    128 (MXU lane-aligned).  NOT pure powers of two above 128 — the batch
    sweet spot is 384 and jumping 384->512 falls off the measured VMEM
    cliff (1981 -> ~500 crops/s)."""
    b = minimum
    while b < n and b < 128:
        b *= 2
    if n <= b:
        return b
    return ((n + 127) // 128) * 128


# Per-instance inputs ride in ONE fused [N, META_COLS] f32 array (each
# separate device_put pays a full link round trip).  Column layout:
#   0:6   inv_mats, row-major 2x3 (the ORIGINAL source-frame affine)
#   6:8   ROI-packing offsets (x, y); zero in canvas mode
#   8     img_idx (canvas mode) / window start row win_y (packed mode)
#   9     validity mask
#   10    K focal length f
#   11    K principal point x
#   12:14 source image (width, height) — add_xy coordinate maps
#   14:18 packed-mode valid-read bounds (x0, x1, y0, y1) — exact-zero
#         weights for out-of-image reads (ops/packing.py clipped slots)
META_COLS = 18


def pack_meta(inv_mats, idx, valid, K_f, K_cx, img_wh, offsets=None):
    """Build a fused [N, META_COLS] meta array (bench/profiling helpers —
    the inference dispatch builds its padded variant inline).

    ``img_wh``: source-frame (width, height), scalar pair or [N, 2] — always
    required: add_xy models normalize their coordinate channels by it, and a
    placeholder would produce silently wrong xy maps instead of an error."""
    n = len(inv_mats)
    meta = np.zeros((n, META_COLS), np.float32)
    meta[:, 0:6] = np.asarray(inv_mats, np.float32).reshape(n, 6)
    if offsets is not None:
        meta[:, 6:8] = offsets
    meta[:, 8] = idx
    meta[:, 9] = valid
    meta[:, 10] = K_f
    meta[:, 11] = K_cx
    meta[:, 12:14] = img_wh
    return meta


def _unpack_meta(meta):
    """meta [N, META_COLS] -> (inv_mats, offsets, idx, valid, K_f, K_cx,
    img_wh, bounds); see the column table above."""
    inv_mats = meta[:, 0:6].reshape(-1, 2, 3)
    offsets = meta[:, 6:8]
    idx = meta[:, 8].astype(jnp.int32)
    return (inv_mats, offsets, idx, meta[:, 9], meta[:, 10], meta[:, 11],
            meta[:, 12:14], meta[:, 14:18])


class EgoNet:
    """End-to-end monocular pose estimator (inference-oriented facade)."""

    def __init__(self, cfgs: dict, pre_trained: bool = False,
                 dtype=jnp.float32, rng_seed: int = 0, mesh=None):
        """``mesh``: optional 1-D jax.sharding.Mesh — instances are sharded
        over its 'data' axis (images and parameters replicated); XLA scales
        the fused pipeline across chips with no code change."""
        self.cfgs = cfgs
        self.dtype = dtype
        self.mesh = mesh
        self.norm_mean, self.norm_std = norm_stats(cfgs)
        hm = cfgs["heatmapModel"]
        self.resolution = tuple(hm["input_size"])           # (width, height)
        self.add_xy = bool(hm.get("add_xy", False))
        self.pack_mode = cfgs.get("roi_packing", "auto")
        if self.pack_mode not in ("auto", "never", "always"):
            raise ValueError(f"roi_packing must be auto/never/always, "
                             f"got {self.pack_mode!r}")
        self.hrnet = build_heatmap_model(cfgs, dtype=dtype)
        self.lifter = build_fc_model(cfgs, dtype=dtype)

        width, height = self.resolution
        in_ch = 5 if self.add_xy else 3
        # shape-traced NumPy initialization: instant, no XLA compile
        from egonet_tpu.models.initialization import numpy_init
        self.hrnet_vars = numpy_init(
            self.hrnet, rng_seed, jnp.zeros((1, height, width, in_ch)))
        self.lifter_vars = numpy_init(
            self.lifter, rng_seed + 1,
            jnp.zeros((1, int(cfgs["FCModel"]["input_size"]))))
        self.ls_stats = {
            "mean_in": np.zeros((1, cfgs["FCModel"]["input_size"]),
                                np.float32),
            "std_in": np.ones((1, cfgs["FCModel"]["input_size"]), np.float32),
            "mean_out": np.zeros((1, cfgs["FCModel"]["output_size"]),
                                 np.float32),
            "std_out": np.ones((1, cfgs["FCModel"]["output_size"]),
                               np.float32),
        }
        if pre_trained:
            self.load_checkpoints(cfgs["dirs"]["ckpt"])
        self.to_device()
        self._jitted = {}
        # observability: how many batches used which transport, and the
        # image bytes each moved host->device (read by bench.py)
        self.transport_stats = {"packed_batches": 0, "canvas_batches": 0,
                                "packed_bytes": 0, "canvas_bytes": 0}
        # decoded-image store: repeated passes over the same frames
        # (validation loops, serving replays, multi-epoch benches) skip
        # the ~26 ms/frame PNG decode that bounds e2e on 1-core hosts.
        # cfg: cache_images (default on), image_cache_bytes,
        # image_disk_cache (a directory enables the raw-uint8 disk tier)
        self.image_store = None
        if cfgs.get("cache_images", True):
            from egonet_tpu.data.image_store import ImageStore
            disk = cfgs.get("image_disk_cache") or None
            self.image_store = ImageStore(
                int(cfgs.get("image_cache_bytes", 2 << 30)),
                disk_dir=disk if isinstance(disk, str) else None)

    def to_device(self, device=None):
        """Commit parameters + stats to the accelerator(s) ONCE.  Without
        this the weights stay host-resident and every jitted call
        re-transfers ~256MB through the TPU tunnel.

        bf16 runs pre-cast conv/dense kernels to bf16 here: numerically
        identical to flax's per-call cast (same rounding), but the cast —
        and the fp32 weight reads feeding it — leave the hot path, and the
        weights ship through the tunnel at half size."""
        if self.dtype == jnp.bfloat16:
            def cast_kernels(tree):
                def leaf(path, x):
                    name = path[-1].key if hasattr(path[-1], "key") else ""
                    if name in ("kernel",):
                        return jnp.asarray(x, jnp.bfloat16)
                    return x
                return jax.tree_util.tree_map_with_path(leaf, tree)
            self.hrnet_vars = cast_kernels(self.hrnet_vars)
            self.lifter_vars = cast_kernels(self.lifter_vars)
        if self.mesh is not None:
            from egonet_tpu.parallel import mesh as pmesh
            target = pmesh.replicated_sharding(self.mesh)
        else:
            target = device or jax.devices()[0]
        self.hrnet_vars = jax.device_put(self.hrnet_vars, target)
        self.lifter_vars = jax.device_put(self.lifter_vars, target)
        self.ls_stats = jax.device_put(
            {k: jnp.asarray(np.asarray(v, np.float32))
             for k, v in self.ls_stats.items()}, target)

    # ------------------------------------------------------------------
    # checkpoints
    # ------------------------------------------------------------------

    def load_checkpoints(self, ckpt_dir: str):
        """Load HC.pth / L.pth / LS.npy (torch) or their orbax equivalents."""
        import os
        hc_pth = pjoin(ckpt_dir, "HC.pth")
        l_pth = pjoin(ckpt_dir, "L.pth")
        ls_npy = pjoin(ckpt_dir, "LS.npy")
        if os.path.exists(hc_pth):
            sd = torch_convert.load_torch_state_dict(hc_pth)
            converted = torch_convert.torch_to_flax(sd)
            problems = torch_convert.check_conversion(
                jax.tree_util.tree_map(np.asarray, dict(self.hrnet_vars)),
                converted)
            if problems:
                raise ValueError("HC.pth conversion mismatch: "
                                 + "; ".join(problems[:10]))
            self.hrnet_vars = converted
        if os.path.exists(l_pth):
            sd = torch_convert.load_torch_state_dict(l_pth)
            converted = torch_convert.torch_to_flax(sd)
            problems = torch_convert.check_conversion(
                jax.tree_util.tree_map(np.asarray, dict(self.lifter_vars)),
                converted)
            if problems:
                raise ValueError("L.pth conversion mismatch: "
                                 + "; ".join(problems[:10]))
            self.lifter_vars = converted
        if os.path.exists(ls_npy):
            self.ls_stats = torch_convert.load_lifter_stats(ls_npy)

    # ------------------------------------------------------------------
    # the jitted core
    # ------------------------------------------------------------------

    def _core(self, hrnet_vars, lifter_vars, ls, images, meta, *,
              alpha_mode: str):
        """One fused program: crops -> screen kpts -> cuboids -> angles.

        images: [B, Hc, Wc, 3] uint8; meta: [N, META_COLS] f32, all
        per-instance scalars fused into ONE array (see ``META_COLS``) — on
        a latency-bound accelerator link every separate input array pays a
        full round trip, which round 2's six small transfers made a
        measurable share of end-to-end batch time.
        """
        width, height = self.resolution
        inv_mats, _offs, img_idx, valid, K_f, K_cx, img_wh, _bnd = \
            _unpack_meta(meta)
        # crops are rotation-free -> separable warp runs on the MXU; bf16
        # runs keep the warp intermediates bf16 (halves their HBM traffic)
        patches = affine.warp_affine_separable(images, inv_mats, img_idx,
                                               (height, width),
                                               dtype=self.dtype)
        return self._tail(hrnet_vars, lifter_vars, ls, patches, inv_mats,
                          valid, K_f, K_cx, img_wh, alpha_mode)

    def _core_packed(self, hrnet_vars, lifter_vars, ls, canvas, meta, *,
                     alpha_mode: str, window_h: int):
        """The fused program over a ROI-packed canvas (ops/packing.py):
        same computation as :meth:`_core`, but the warp samples per-instance
        packed footprints through integer offsets — bit-identical weights
        with a fraction of the host->device bytes."""
        width, height = self.resolution
        inv_mats, offsets, win_y, valid, K_f, K_cx, img_wh, bounds = \
            _unpack_meta(meta)
        patches = affine.warp_affine_separable_windowed(
            canvas, inv_mats, offsets, win_y, (height, width),
            window_h=window_h, dtype=self.dtype, bounds=bounds)
        return self._tail(hrnet_vars, lifter_vars, ls, patches, inv_mats,
                          valid, K_f, K_cx, img_wh, alpha_mode)

    def _tail(self, hrnet_vars, lifter_vars, ls, patches, inv_mats, valid,
              K_f, K_cx, img_wh, alpha_mode: str):
        """Post-warp body shared by the canvas and packed front halves."""
        width, height = self.resolution
        # round / crop_scale_divisor / mean-std / add_xy concat — shared
        # with both trainers (img_wh always arrives populated: pack_meta
        # and the inline dispatch builder both require source-frame dims)
        crops = affine.normalize_crop_patches(
            self.cfgs, patches, inv_mats, img_wh, (height, width))

        _maps, coords = self.hrnet.apply(hrnet_vars, crops, train=False)
        local = coords * jnp.asarray([width, height], jnp.float32)
        screen = affine.batched_affine_transform(local, inv_mats)  # [N,33,2]

        n = screen.shape[0]
        flat = screen.reshape(n, -1).astype(jnp.float32)
        norm_in = (flat - ls["mean_in"]) / ls["std_in"]
        pred = self.lifter.apply(lifter_vars, norm_in, train=False)
        pred = pred * ls["std_out"] + ls["mean_out"]
        kpts_3d = pred.reshape(n, -1, 3)            # [N, 32 or 33, 3]

        if kpts_3d.shape[1] == 33:
            # lft_out_rep 'R3d+T' (reference car_instance.py:646-686): slot
            # 0 is the predicted camera-frame root, slots 1..32 the
            # center-relative cuboid.  Orientation comes from the relative
            # points; alpha_mode='trans' then consumes a REAL translation
            # (with the shipped 'R3d' 32-point lifter, 'trans' reads a
            # relative corner — reference-faithful but meaningless, which
            # is why the shipped configs pair 'R3d' with 'proj').
            angles, _ = rigid.six_dof_from_cuboids(kpts_3d[:, 1:, :])
            translations = kpts_3d[:, 0, :]
        else:
            angles, translations = rigid.six_dof_from_cuboids(kpts_3d)
        ry = angles[:, 1]
        if alpha_mode == "trans":
            alphas = rigid.observation_angle_trans(ry, translations)
        else:
            alphas = rigid.observation_angle_proj(
                ry, screen[:, 0, 0], K_f, K_cx)
        # ONE flat [N, D] output (D = 2K + output_size + 8): a dict of six
        # device arrays costs six separate device->host fetches in
        # finalize — each a full round trip on a tunneled link
        return jnp.concatenate([
            screen.reshape(n, -1).astype(jnp.float32),
            pred.astype(jnp.float32),
            angles.astype(jnp.float32),
            translations.astype(jnp.float32),
            alphas.astype(jnp.float32)[:, None],
            valid.astype(jnp.float32)[:, None],
        ], axis=1)

    def _get_jitted(self, alpha_mode: str, packed: bool = False):
        key = (alpha_mode, packed)
        if key not in self._jitted:
            if packed:
                fn = functools.partial(self._core_packed,
                                       alpha_mode=alpha_mode)
                self._jitted[key] = jax.jit(fn,
                                            static_argnames=("window_h",))
            else:
                fn = functools.partial(self._core, alpha_mode=alpha_mode)
                self._jitted[key] = jax.jit(fn)
        return self._jitted[key]

    # ------------------------------------------------------------------
    # host-side batch assembly
    # ------------------------------------------------------------------

    def load_image(self, path: str) -> np.ndarray:
        if self.image_store is not None:
            return self.image_store.get(path)
        from egonet_tpu.data.image_store import decode_image
        return decode_image(path)

    def forward_annot_dict(self, annot_dict: dict, enlarge: float = 1.1,
                           alpha_mode: str = "proj",
                           canvas_hw=(384, 1280)) -> dict:
        """Process a batch of images given an annotation dictionary with keys
        'path' (list of image paths) and 'boxes' (per-image [Ni, 4] arrays).
        Returns per-image record dicts keyed by path (reference forward
        contract, egonet.py:488-507).
        """
        pending = self.dispatch_annot_dict(annot_dict, enlarge, alpha_mode,
                                           canvas_hw)
        return self.finalize(pending)

    def dispatch_annot_dict(self, annot_dict: dict, enlarge: float = 1.1,
                            alpha_mode: str = "proj",
                            canvas_hw=(384, 1280),
                            pack_profile: str = "transport",
                            bucket_floor: int | None = None):
        """Host-prep one batch and ASYNCHRONOUSLY dispatch the fused device
        program; returns a pending handle for :meth:`finalize`.

        jax dispatch is non-blocking, so the caller can prepare the next
        batch (image decode, crop matrices) while the device runs this one —
        the host/device overlap the reference's synchronous per-batch loop
        (inference.py:136-199) never had.  None means the batch was empty.
        """
        width, height = self.resolution
        target_ar = height / width
        paths = annot_dict["path"]
        n_img = len(paths)

        inv_mats, img_idx, centers, scales, rbs = [], [], [], [], []
        per_image_counts, whs = [], []
        if "images" in annot_dict:
            decoded = annot_dict["images"]
        else:
            # parallel decode: cv2 releases the GIL and PNG decode would
            # otherwise serialize against device compute
            if not hasattr(self, "_decode_pool"):
                from concurrent.futures import ThreadPoolExecutor
                self._decode_pool = ThreadPoolExecutor(max_workers=8)
            decoded = list(self._decode_pool.map(self.load_image, paths))
        for i, path in enumerate(paths):
            img = decoded[i]
            h, w = img.shape[:2]
            boxes = np.asarray(annot_dict["boxes"][i], dtype=np.float64)
            per_image_counts.append(len(boxes))
            if len(boxes) == 0:
                continue
            mats = affine.crop_matrices_for_boxes(
                boxes, (height, width), target_ar, enlarge)
            inv_mats.append(mats["inv"])
            centers.append(mats["center"])
            scales.append(mats["scale"])
            rbs.append(mats["bbox_resize"])
            img_idx.extend([i] * len(boxes))
            whs.extend([(w, h)] * len(boxes))

        n_total = int(sum(per_image_counts))
        if n_total == 0:
            return None
        inv_f64 = np.concatenate(inv_mats)               # float64, original
        inv_mats = inv_f64.astype(np.float32)
        centers = np.concatenate(centers)
        scales = np.concatenate(scales)
        rbs = np.concatenate(rbs)
        img_idx = np.asarray(img_idx, dtype=np.int32)

        # transport mode: ROI-packed canvas (ops/packing.py) when it moves
        # fewer bytes than the full zero-padded canvases (it almost always
        # does on detection workloads — frames are mostly dead pixels), or
        # when a source frame exceeds the fixed canvas (packing lifts that
        # restriction); cfg 'roi_packing': auto (default) / never / always
        from egonet_tpu.ops import packing
        plan = None
        if self.pack_mode != "never":
            plan = packing.plan(inv_f64, (height, width),
                                np.asarray(whs, np.float64),
                                profile=pack_profile)
        use_pack = False
        if plan is not None:
            if self.pack_mode == "always" or pack_profile == "serving":
                # serving: shape discipline beats the byte comparison —
                # canvas-mode programs are keyed by n_img, so a 1-2-image
                # micro-batch falling back to canvas (its packed canvas
                # minimum is bigger than 1-2 frames) would compile a fresh
                # program per ragged image count, the exact stall the
                # serving profile exists to prevent
                use_pack = True
            else:
                oversize = any(im.shape[0] > canvas_hw[0]
                               or im.shape[1] > canvas_hw[1]
                               for im in decoded)
                use_pack = oversize or (plan.canvas_bytes <
                                        n_img * canvas_hw[0]
                                        * canvas_hw[1] * 3)
        if use_pack:
            images = packing.assemble(plan, decoded, img_idx)
            self.transport_stats["packed_batches"] += 1
            self.transport_stats["packed_bytes"] += images.nbytes
        else:
            self.transport_stats["canvas_batches"] += 1
            self.transport_stats["canvas_bytes"] += (
                n_img * canvas_hw[0] * canvas_hw[1] * 3)
            images = np.zeros((n_img, canvas_hw[0], canvas_hw[1], 3),
                              np.uint8)
            for i, im in enumerate(decoded):
                h, w = im.shape[:2]
                if h > canvas_hw[0] or w > canvas_hw[1]:
                    raise ValueError(f"image {paths[i]} ({h}x{w}) exceeds "
                                     f"canvas {canvas_hw}")
                images[i, :h, :w] = im

        Ks = [np.asarray(annot_dict["K"][i]) if "K" in annot_dict
              else np.eye(3) for i in range(n_img)]
        K_f = np.array([Ks[j][0, 0] for j in img_idx], np.float32)
        K_cx = np.array([Ks[j][0, 2] for j in img_idx], np.float32)

        # pad instances to a power-of-two bucket for stable compilation;
        # on a mesh the bucket must additionally tile the data axis — round
        # ONCE here so every per-instance array is padded in one place
        bucket = _round_up_bucket(n_total)
        if pack_profile == "serving":
            # shape discipline over latency polish: ragged micro-batches
            # otherwise walk the whole bucket ladder (8..128), and each
            # novel (bucket, canvas) pair is a minutes-long XLA compile on
            # a cold server.  A floor bucket costs padded device compute
            # per small batch — noise next to the per-request transport —
            # and collapses the program set.  ``bucket_floor`` lets the
            # micro-batcher pick the floor ADAPTIVELY (VERDICT r3 #5): a
            # small pre-compiled idle bucket for uncongested single
            # requests (~50 ms less padded compute per call), the full
            # 128 floor under concurrent load; the program set stays at
            # two buckets per canvas shape.
            bucket = max(bucket, 128 if bucket_floor is None
                         else int(bucket_floor))
        if self.mesh is not None:
            nd = self.mesh.devices.size
            bucket = ((bucket + nd - 1) // nd) * nd
        pad = bucket - n_total
        valid = np.concatenate([np.ones(n_total, np.float32),
                                np.zeros(pad, np.float32)])
        # fused per-instance meta; padding rows get identity affines and
        # benign K/img_wh values (their outputs are masked by valid=0)
        meta = np.zeros((bucket, META_COLS), np.float32)
        meta[:, 0:6] = np.eye(2, 3).reshape(6)
        meta[:n_total, 0:6] = inv_mats.reshape(n_total, 6)
        if use_pack:
            meta[:n_total, 6:8] = plan.offsets
            meta[:n_total, 8] = plan.win_y
            meta[:n_total, 14:18] = plan.bounds
        else:
            meta[:n_total, 8] = img_idx
        meta[:, 9] = valid
        meta[:, 10] = 1.0
        meta[:n_total, 10] = K_f
        meta[:n_total, 11] = K_cx
        meta[:, 12:14] = 1.0
        meta[:n_total, 12:14] = np.asarray(whs, np.float32)

        ls = self.ls_stats
        if self.mesh is not None:
            from egonet_tpu.parallel import mesh as pmesh
            bsh = pmesh.batch_sharding(self.mesh)
            rsh = pmesh.replicated_sharding(self.mesh)
            dev_args = (jax.device_put(images, rsh),
                        jax.device_put(meta, bsh))
        else:
            dev_args = (jnp.asarray(images), jnp.asarray(meta))
        kw = {"window_h": plan.window_h} if use_pack else {}
        out = self._get_jitted(alpha_mode, packed=use_pack)(
            self.hrnet_vars, self.lifter_vars, ls, *dev_args, **kw)
        try:
            # start the device->host copy of the fused output as soon as the
            # compute finishes: with `depth` batches in flight the D2H
            # round trip overlaps younger batches' prep/compute instead of
            # serializing finalize() (measured 0.39 s/batch on this rig's
            # tunnel, the e2e bottleneck once transport was packed)
            out.copy_to_host_async()
        except Exception:
            pass                      # platform without async host copies
        ctx = dict(annot_dict=annot_dict, paths=paths,
                   per_image_counts=per_image_counts, centers=centers,
                   scales=scales, rbs=rbs)
        return out, ctx

    def finalize(self, pending) -> dict:
        """Fetch a dispatched batch's outputs and regroup them per image."""
        if pending is None:
            return {}
        out, ctx = pending
        annot_dict = ctx["annot_dict"]
        paths = ctx["paths"]
        per_image_counts = ctx["per_image_counts"]
        centers, scales, rbs = ctx["centers"], ctx["scales"], ctx["rbs"]
        # ONE device->host fetch of the fused [N, D] output, then host-side
        # column slicing (see _tail)
        flat = np.asarray(out)
        k2 = int(self.cfgs["heatmapModel"]["num_joints"]) * 2
        od = int(self.cfgs["FCModel"]["output_size"])
        out = {
            "kpts_2d": flat[:, :k2].reshape(-1, k2 // 2, 2),
            "kpts_3d": flat[:, k2:k2 + od].reshape(-1, od // 3, 3),
            "euler_angles": flat[:, k2 + od:k2 + od + 3],
            "translation": flat[:, k2 + od + 3:k2 + od + 6],
            "alphas": flat[:, k2 + od + 6],
            "valid": flat[:, k2 + od + 7],
        }

        # regroup per image
        records = {}
        start = 0
        for i, path in enumerate(paths):
            cnt = per_image_counts[i]
            if cnt == 0:
                continue
            sl = slice(start, start + cnt)
            rec = {
                "kpts_2d_pred": [out["kpts_2d"][j].reshape(1, -1)
                                 for j in range(start, start + cnt)],
                "kpts_3d_pred": out["kpts_3d"][sl],
                "euler_angles": out["euler_angles"][sl],
                "translation": out["translation"][sl],
                "alphas": out["alphas"][sl],
                "center": list(centers[sl]),
                "scale": list(scales[sl]),
                "bbox_resize": list(rbs[sl]),
                "boxes": np.asarray(annot_dict["boxes"][i]),
            }
            for key in ("K", "raw_txt_format", "scores", "kpts_3d_before",
                        "kpts", "kpts_3d_gt", "pose_vecs_gt",
                        "kpts_3d_SMOKE"):
                if key in annot_dict:
                    rec[key] = annot_dict[key][i]
            records[path] = rec
            start += cnt
        return records

    # ------------------------------------------------------------------
    # post-processing: KITTI txt emission
    # ------------------------------------------------------------------

    def post_process(self, records: dict, save_dict=None, alpha_mode=None,
                     visualize: bool = False, color_dict=None,
                     vis_dir: str | None = None, refine: bool = False):
        """Write KITTI txts (and optional visualizations) for each image
        record (spec egonet.py:341-408).

        ``alpha_mode`` is accepted for signature parity; the angles were
        already computed in the fused forward — except when a record carries
        3D boxes from an external SMOKE detector (see below).  ``refine``
        applies host-side PnP refinement (legacy extras) before emission.

        SMOKE support (legacy extras, inference_legacy.py:621-622,885-908):
        when ``annot_dict['kpts_3d_SMOKE']`` was provided, each record gets
        ``kpts_3d_abs`` — the SMOKE 3D center prepended to the predicted
        relative cuboid ([N, 33, 3], legacy p3d layout) — and, for
        ``alpha_mode='trans'``, the observation angle is recomputed from
        that real 3D location instead of the relative first point.
        """
        import os
        from egonet_tpu.io import kitti_writer
        for img_path, rec in records.items():
            if "kpts_3d_SMOKE" in rec and len(rec.get("kpts_3d_pred", [])):
                smoke = np.asarray(rec["kpts_3d_SMOKE"], np.float64)
                smoke = smoke.reshape(len(rec["kpts_3d_pred"]), -1, 3)
                centers = smoke[:, :1, :]
                rec["kpts_3d_abs"] = np.concatenate(
                    [centers, np.asarray(rec["kpts_3d_pred"])], axis=1)
                if alpha_mode == "trans":
                    ry = np.asarray(rec["euler_angles"])[:, 1]
                    x3, z3 = centers[:, 0, 0], centers[:, 0, 2]
                    alphas = ry - np.arctan2(-z3, x3) - 0.5 * np.pi
                    rec["translation"] = centers[:, 0, :]
                    rec["alphas"] = np.mod(alphas + np.pi,
                                           2.0 * np.pi) - np.pi
            if refine:
                from egonet_tpu.eval.refinement import refine_record
                refine_record(rec)
            if "raw_txt_format" in rec:
                pred_str = kitti_writer.prediction_str(
                    rec["raw_txt_format"], rec["euler_angles"], rec["alphas"])
                rec["pred_str"] = pred_str
                if save_dict and save_dict.get("flag"):
                    kitti_writer.save_txt_file(img_path, pred_str,
                                               save_dict["save_dir"])
            if visualize:
                from egonet_tpu.visualization import overlays
                out_dir = vis_dir or (save_dict or {}).get("save_dir", ".")
                stem = os.path.basename(img_path)[:-4]
                if rec.get("kpts_3d_gt") is not None and "K" in rec:
                    rec["arrow"] = overlays.add_orientation_arrow(
                        {"kpts_3d_pred": rec["kpts_3d_pred"],
                         "kpts_3d_gt": rec["kpts_3d_gt"], "K": rec["K"]})
                overlays.plot_2d_objects(
                    self.load_image(img_path), rec, color_dict,
                    save_path=os.path.join(out_dir, f"{stem}_2d.png"))
                overlays.plot_3d_objects(
                    rec, save_path=os.path.join(out_dir, f"{stem}_3d.png"))
        return records

    def stream_annot_dicts(self, annot_iter, depth: int = 2, **kwargs):
        """Pipelined inference over an iterable of annotation dicts.

        A producer thread runs host prep (decode, crop matrices, canvas
        assembly) and enqueues the async device dispatch up to ``depth``
        batches ahead; the consumer yields finalized per-image records.
        Host decode, host->device transfer and device compute of different
        batches all overlap.  A producer-side error (e.g. a corrupt image)
        re-raises here rather than truncating the stream.
        """
        from egonet_tpu.utils.pipeline import prefetch_map
        for pending in prefetch_map(
                lambda annot: self.dispatch_annot_dict(annot, **kwargs),
                annot_iter, depth):
            yield self.finalize(pending)

    def __call__(self, annot_dict: dict, **kwargs) -> dict:
        return self.forward_annot_dict(annot_dict, **kwargs)
