"""Decoded-image store: RAM LRU + raw uint8 disk tier (VERDICT r3 #3 —
the inference/serving path must reuse decoded frames instead of paying the
~26 ms PNG decode every pass)."""

import os

import numpy as np
import pytest

from egonet_tpu.data.image_store import ImageStore, decode_image


@pytest.fixture
def png(tmp_path):
    import cv2
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (24, 32, 3), dtype=np.uint8)
    path = str(tmp_path / "frame.png")
    cv2.imwrite(path, img[:, :, ::-1])          # store BGR so RGB reads back
    return path, img


def test_ram_tier_hits(png):
    path, img = png
    store = ImageStore(max_bytes=1 << 20)
    np.testing.assert_array_equal(store.get(path), img)
    np.testing.assert_array_equal(store.get(path), img)
    assert store.stats == {"ram_hits": 1, "disk_hits": 0, "decodes": 1}


def test_disk_tier_survives_ram_clear(png, tmp_path):
    path, img = png
    store = ImageStore(max_bytes=1 << 20, disk_dir=str(tmp_path / "disk"))
    store.get(path)
    store.clear_ram()
    np.testing.assert_array_equal(store.get(path), img)
    assert store.stats["decodes"] == 1 and store.stats["disk_hits"] == 1
    # one published .npy, no leftover tmp files
    files = os.listdir(str(tmp_path / "disk"))
    assert len(files) == 1 and files[0].endswith(".npy") \
        and ".tmp" not in files[0]


def test_disk_key_invalidates_on_rewrite(png, tmp_path):
    import cv2
    path, img = png
    store = ImageStore(max_bytes=1 << 20, disk_dir=str(tmp_path / "disk"))
    store.get(path)
    new = (img // 2).astype(np.uint8)
    cv2.imwrite(path, new[:, :, ::-1])
    os.utime(path, ns=(1, 1))                    # force a new mtime key
    store.clear_ram()
    np.testing.assert_array_equal(store.get(path), new)
    assert store.stats["decodes"] == 2           # stale entry not served


def test_egonet_dispatch_uses_store(tmp_path):
    """dispatch_annot_dict must decode each frame once across repeated
    batches (the pre-round-4 behavior decoded fresh every time)."""
    import cv2
    import jax.numpy as jnp
    from egonet_tpu.config import default_demo_config
    from egonet_tpu.models.egonet import EgoNet
    from tests import fixtures

    cfgs = default_demo_config()
    fixtures.shrink_hrnet(cfgs)
    model = EgoNet(cfgs, pre_trained=False, dtype=jnp.float32)
    assert model.image_store is not None        # cache_images default on

    rng = np.random.RandomState(1)
    path = str(tmp_path / "img.png")
    cv2.imwrite(path, rng.randint(0, 255, (128, 256, 3), dtype=np.uint8))
    annot = {"path": [path], "boxes": [np.array([[10.0, 10.0, 90.0, 90.0]])],
             "K": [np.eye(3)], "raw_txt_format": [[]]}
    for _ in range(3):
        model.forward_annot_dict(annot, canvas_hw=(128, 256))
    assert model.image_store.stats["decodes"] == 1
    assert model.image_store.stats["ram_hits"] == 2


def test_decode_image_missing_raises(tmp_path):
    with pytest.raises(ValueError):
        decode_image(str(tmp_path / "nope.png"))
