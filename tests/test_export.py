"""AOT export of the fused program (egonet_tpu/io/export.py): serialized
artifacts deserialize into callables that match the live jitted pipeline
bit-for-bit on the same inputs."""

import numpy as np
import pytest

from tests import fixtures


@pytest.fixture(scope="module")
def small_model():
    from egonet_tpu.config import default_demo_config
    from egonet_tpu.models.egonet import EgoNet
    cfgs = default_demo_config()
    fixtures.shrink_hrnet(cfgs)
    return EgoNet(cfgs, pre_trained=False)


def _inputs(model, bucket, rng):
    import jax.numpy as jnp
    from egonet_tpu.models.egonet import pack_meta
    from egonet_tpu.ops import affine
    images = rng.randint(0, 255, (2, 384, 1280, 3), np.uint8)
    width, height = model.resolution
    boxes = np.stack([[40.0 + 30 * i, 50.0, 160.0 + 30 * i, 170.0]
                      for i in range(bucket)])
    mats = affine.crop_matrices_for_boxes(boxes, (height, width),
                                          height / width, 1.1)
    meta = pack_meta(mats["inv"], rng.randint(0, 2, bucket),
                     np.ones(bucket), 707.0, 604.0,
                     (images.shape[2], images.shape[1]))
    ls = {k: jnp.asarray(v) for k, v in model.ls_stats.items()}
    return jnp.asarray(images), jnp.asarray(meta), ls


def test_export_roundtrip_matches_live_program(small_model, tmp_path, rng):
    from egonet_tpu.io import export as export_mod
    manifest = export_mod.export_shape_set(
        small_model, str(tmp_path), buckets=(8,), n_img=2,
        platforms=("cpu",))
    assert "8" in manifest["artifacts"]

    programs, manifest2 = export_mod.load_exported(str(tmp_path))
    assert manifest2["alpha_mode"] == "proj"
    images, meta, ls = _inputs(small_model, 8, rng)
    live = small_model._get_jitted("proj")(
        small_model.hrnet_vars, small_model.lifter_vars, ls, images, meta)
    aot = programs[8](small_model.hrnet_vars, small_model.lifter_vars, ls,
                      images, meta)
    np.testing.assert_array_equal(np.asarray(live), np.asarray(aot))


def test_export_cli(small_model, tmp_path, rng, monkeypatch):
    """tools/export_model.py writes artifacts + manifest for a config."""
    import importlib.util
    import os
    import yaml
    from egonet_tpu.config import default_demo_config
    cfgs = default_demo_config()
    fixtures.shrink_hrnet(cfgs)
    cfg_path = tmp_path / "cfg.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump({k: v for k, v in cfgs.items()
                        if k != "config_path"}, f)
    here = os.path.dirname(__file__)
    spec = importlib.util.spec_from_file_location(
        "export_cli", os.path.join(here, "..", "tools", "export_model.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = str(tmp_path / "artifacts")
    mod.main(["--cfg", str(cfg_path), "--out", out, "--buckets", "8,16",
              "--platforms", "cpu", "--n-img", "2"])
    import json
    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert set(manifest["artifacts"]) == {"8", "16"}
    for entry in manifest["artifacts"].values():
        assert os.path.getsize(os.path.join(out, entry["file"])) \
            == entry["bytes"]
