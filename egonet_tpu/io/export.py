"""Ahead-of-time export of the fused inference program (jax.export).

Deployment complement to the serving layer: the fused pipeline runs a
SMALL, enumerable set of shapes (the instance buckets x one canvas), so
the whole set can be lowered to serialized StableHLO artifacts at build
time and shipped — target machines deserialize and run without tracing
Python or paying first-request XLA compile from source (the runtime still
compiles the portable StableHLO for its chip, which is cached; no Python
model code or Flax tracing is needed on the serving host).

The reference has no export story (deployment = its Python + torch
checkpoints); this is the TPU/XLA-native equivalent of "compile the shape
set up front" that request-driven serving wants (see
docs/performance.md, Serving).

Artifacts are weight-AGNOSTIC: the exported function takes
(hrnet_vars, lifter_vars, ls_stats, images, meta) exactly like the jitted
product path, so one artifact serves every checkpoint of the same
architecture — weights load through the normal checkpoint path
(io/checkpoint.py) and ride in as arguments.
"""

from __future__ import annotations

import json
import os

import numpy as np


def export_bucket(model, bucket: int, n_img: int = 16,
                  canvas_hw=(384, 1280), alpha_mode: str = "proj",
                  platforms=("tpu", "cpu")) -> bytes:
    """Serialize the fused canvas-mode program for one instance bucket.

    Returns the serialized StableHLO artifact (jax.export payload): the
    portable program for ``[n_img, *canvas_hw, 3] u8`` canvases and a
    ``[bucket, META_COLS] f32`` fused meta array, lowered for every
    platform in ``platforms`` (cross-platform lowering — no TPU needed to
    produce the TPU artifact).
    """
    import functools

    import jax
    import jax.numpy as jnp

    from egonet_tpu.models.egonet import META_COLS

    fn = jax.jit(functools.partial(model._core, alpha_mode=alpha_mode))
    images = jax.ShapeDtypeStruct((n_img,) + tuple(canvas_hw) + (3,),
                                  jnp.uint8)
    meta = jax.ShapeDtypeStruct((bucket, META_COLS), jnp.float32)
    ls = {k: jax.ShapeDtypeStruct(np.asarray(v).shape, np.asarray(v).dtype)
          for k, v in model.ls_stats.items()}
    vars_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), model.hrnet_vars)
    lift_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), model.lifter_vars)
    exported = jax.export.export(fn, platforms=list(platforms))(
        vars_spec, lift_spec, ls, images, meta)
    return exported.serialize()


def export_shape_set(model, out_dir: str, buckets=(8, 16, 32, 64, 128),
                     n_img: int = 16, canvas_hw=(384, 1280),
                     alpha_mode: str = "proj",
                     platforms=("tpu", "cpu")) -> dict:
    """Export every bucket program + a manifest; returns the manifest."""
    from egonet_tpu.models.egonet import META_COLS

    os.makedirs(out_dir, exist_ok=True)
    manifest = {
        "format": "jax.export/stablehlo",
        "alpha_mode": alpha_mode,
        "canvas_hw": list(canvas_hw),
        "n_img": n_img,
        "platforms": list(platforms),
        "call_args": "(hrnet_vars, lifter_vars, ls_stats, images, meta)",
        "meta_cols": META_COLS,
        "artifacts": {},
    }
    for b in buckets:
        blob = export_bucket(model, b, n_img=n_img, canvas_hw=canvas_hw,
                             alpha_mode=alpha_mode, platforms=platforms)
        name = f"egonet_core_b{b}.jaxexport"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(blob)
        manifest["artifacts"][str(b)] = {"file": name, "bytes": len(blob)}
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load_exported(out_dir: str):
    """Deserialize an exported shape set -> {bucket: callable}.

    Each callable takes the same pytree arguments as the live jitted
    program (manifest ``call_args``).
    """
    import jax

    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    programs = {}
    for bucket, entry in manifest["artifacts"].items():
        with open(os.path.join(out_dir, entry["file"]), "rb") as f:
            programs[int(bucket)] = jax.export.deserialize(f.read()).call
    return programs, manifest
