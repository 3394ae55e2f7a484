"""Runtime helpers for the execution environment."""

from __future__ import annotations

import os
import sys


def clean_exit(code: int = 0):
    """Flush stdio and exit immediately.

    The tunneled TPU platform ('axon') leaves a non-daemon client thread
    alive, so a normal interpreter shutdown hangs indefinitely after main()
    returns.  Entry-point scripts call this instead of falling off the end.
    """
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(code)


def host_cpu_device():
    """The host CPU device, or None if the CPU backend is unavailable."""
    import jax
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return None


def on_host_cpu():
    """Context manager placing eager ops on host CPU when possible."""
    import contextlib
    import jax
    dev = host_cpu_device()
    return jax.default_device(dev) if dev is not None \
        else contextlib.nullcontext()


def enable_compilation_cache(path: str = "/tmp/jax_cache"):
    """Persistent XLA compilation cache (first compile is slow; reruns are
    instant)."""
    import jax
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def config_dtype(cfgs: dict | None):
    """The compute dtype the config asks for: bf16 with fp32 islands
    unless ``bf16: false``.  ONE interpretation (including the
    default-True) shared by every entry point — tools/inference.py,
    tools/serve.py, tools/bench_serve.py — so batch and serving paths can
    never run different precisions for the same YAML."""
    import jax.numpy as jnp
    return jnp.bfloat16 if (cfgs or {}).get("bf16", True) else jnp.float32
