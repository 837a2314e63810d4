"""Config-gated profiling + step timing.

The reference has no tracing/profiling at all (SURVEY.md §5.1: only tqdm
bars). Here profiling is a first-class trainer feature:

  * `train_params.profile: {start_step, num_steps}` captures a
    jax.profiler trace (XPlane, viewable in TensorBoard's profile plugin /
    Perfetto) into <run_dir>/profile;
  * StepTimer keeps an online step-time EMA and writes per-step wall time
    scalars to TensorBoard (`meta/step_time_ms`, `meta/images_per_sec`).
"""

from __future__ import annotations

import os
import time

import jax


class Profiler:
    def __init__(self, run_dir: str, start_step: int = -1, num_steps: int = 0):
        self.dir = os.path.join(run_dir, "profile")
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False

    @staticmethod
    def from_config(config: dict, run_dir: str) -> "Profiler":
        p = config.get("train_params", {}).get("profile", {}) or {}
        return Profiler(
            run_dir,
            start_step=p.get("start_step", -1),
            num_steps=p.get("num_steps", 0),
        )

    def maybe_start(self, step: int) -> None:
        if step == self.start_step and not self._active:
            os.makedirs(self.dir, exist_ok=True)
            jax.profiler.start_trace(self.dir)
            self._active = True

    def maybe_stop(self, step: int) -> None:
        if self._active and step >= self.stop_step:
            jax.profiler.stop_trace()
            self._active = False
            print(f"profiler trace written to {self.dir}")

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


class StepTimer:
    """Wall-clock step timing with warmup skip and EMA."""

    def __init__(self, ema: float = 0.9, skip: int = 3):
        self.ema = ema
        self.skip = skip
        self.count = 0
        self.avg_ms = None
        self._last = None

    def tick(self) -> float | None:
        """Call once per step; returns the last step's duration in ms."""
        now = time.perf_counter()
        if self._last is None:
            self._last = now
            return None
        dt_ms = (now - self._last) * 1e3
        self._last = now
        self.count += 1
        if self.count <= self.skip:
            return dt_ms
        self.avg_ms = (
            dt_ms if self.avg_ms is None
            else self.ema * self.avg_ms + (1 - self.ema) * dt_ms
        )
        return dt_ms

    def log(self, tb_log, step: int, images_per_step: int) -> None:
        if tb_log is None or self.avg_ms is None:
            return
        tb_log.add_scalar("meta/step_time_ms", self.avg_ms, step)
        tb_log.add_scalar(
            "meta/images_per_sec", images_per_step / (self.avg_ms / 1e3), step
        )
