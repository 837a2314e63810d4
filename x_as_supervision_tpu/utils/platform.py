"""Backend/platform capability gates shared by the model factories."""

from __future__ import annotations

import os

import jax


def enable_compile_cache() -> None:
    """Point JAX at the repo-local persistent compilation cache.

    The fused GAN step is a large XLA program and a cold compile through
    the axon remote-compile tunnel takes minutes; cache hits make every
    rerun (bench, the resumable-driver's crash restarts, each eval
    protocol pass) start in seconds. Called by the CLIs, not at library
    import, so tests and embedders keep full control. Override the
    location with XAS_COMPILE_CACHE; set it empty to disable."""
    cache = os.environ.get(
        "XAS_COMPILE_CACHE",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".jax_cache",
        ),
    )
    if not cache:
        return
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pallas_ok() -> bool:
    """Pallas kernels are enabled on a real TPU backend in single-device
    processes. Under a multi-device GSPMD mesh the custom calls have no
    partitioning rule yet (the XLA paths are used there; see ROADMAP.md),
    and on CPU the interpret-mode kernels are for tests only."""
    return jax.default_backend() == "tpu" and jax.device_count() == 1
