"""Backend/platform capability gates shared by the model factories."""

from __future__ import annotations

import jax


def pallas_ok() -> bool:
    """Pallas kernels are enabled on a real TPU backend in single-device
    processes. Under a multi-device GSPMD mesh the custom calls have no
    partitioning rule yet (the XLA paths are used there; see ROADMAP.md),
    and on CPU the interpret-mode kernels are for tests only."""
    return jax.default_backend() == "tpu" and jax.device_count() == 1
