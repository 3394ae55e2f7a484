"""Decoded-image store: RAM LRU + optional raw uint8 disk cache.

PNG decode is the measured end-to-end bottleneck on 1-core hosts
(~26 ms/frame; docs/performance.md §"End-to-end transport") and the
reference re-decodes every frame on every pass (its DataLoader workers
keep nothing, libs/common/img_proc.py:251-345).  Multi-epoch loops —
validation re-runs, serving replays, the e2e benchmark — hit the same
frames repeatedly, so the store keeps:

  1. a byte-capped in-RAM LRU of decoded RGB frames (shared
     ``LRUImageCache`` machinery with the training loader), and
  2. optionally, a disk cache of the decoded uint8 pixels (.npy).  A raw
     1242x375 KITTI frame reads back in ~1-2 ms vs ~26 ms of PNG decode,
     so epochs past the first run at disk speed even when the working set
     exceeds the RAM cap.

Disk entries are keyed by (absolute path, mtime, size): an edited or
replaced source image misses the cache instead of serving stale pixels.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

from egonet_tpu.data.loader import LRUImageCache


def decode_image(path: str) -> np.ndarray:
    """PNG/JPEG -> RGB uint8 (reference cv2.imread + BGR2RGB semantics)."""
    import cv2
    img = cv2.imread(path, 1 | 128)
    if img is None:
        raise ValueError(f"Fail to read {path}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


class ImageStore:
    """get(path) -> decoded RGB uint8, memoized in RAM and (optionally)
    as raw .npy on disk.  Thread-safe for concurrent ``get`` (decode-pool
    callers); the LRU serializes its own bookkeeping."""

    def __init__(self, max_bytes: int = 2 << 30,
                 disk_dir: str | None = None):
        self._lru = LRUImageCache(int(max_bytes))
        self.disk_dir = disk_dir
        if disk_dir:
            os.makedirs(disk_dir, exist_ok=True)
        self.stats = {"ram_hits": 0, "disk_hits": 0, "decodes": 0}

    # -- keys -------------------------------------------------------------
    def _disk_path(self, path: str) -> str:
        st = os.stat(path)
        key = f"{os.path.abspath(path)}|{st.st_mtime_ns}|{st.st_size}"
        h = hashlib.sha1(key.encode()).hexdigest()[:24]
        return os.path.join(self.disk_dir, h + ".npy")

    # -- access -----------------------------------------------------------
    def get(self, path: str) -> np.ndarray:
        img = self._lru.get(path)
        if img is not None:
            self.stats["ram_hits"] += 1
            return img
        if self.disk_dir:
            dp = self._disk_path(path)
            if os.path.exists(dp):
                try:
                    img = np.load(dp)
                    self.stats["disk_hits"] += 1
                    self._lru.put(path, img)
                    return img
                except (ValueError, OSError):
                    pass                      # corrupt entry: fall through
        img = decode_image(path)
        self.stats["decodes"] += 1
        self._lru.put(path, img)
        if self.disk_dir:
            dp = self._disk_path(path)
            # name ends in .npy so np.save writes exactly this file
            tmp = dp[:-4] + f".{os.getpid()}.tmp.npy"
            try:                              # atomic publish
                np.save(tmp, img)
                os.replace(tmp, dp)
            except OSError:
                pass
        return img

    def clear_ram(self) -> None:
        """Drop the RAM tier (cold-cache benchmarking)."""
        self._lru = LRUImageCache(self._lru.max_bytes)

    @property
    def nbytes(self) -> int:
        return self._lru.nbytes
