"""Throughput benchmark: fused GAN train step on the flagship config.

Measures training images/sec/chip (each camera view counts once: the
reference processes 4 camera crops + 4 pseudo crops per sample per
iteration). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: the reference publishes no throughput (BASELINE.md), so the
ratio is against the repo's north star: 3x a DERIVED A100 reference
throughput for the same workload (see the constants below for the full
arithmetic: XLA-counted FLOPs/img x A100 TF32 peak x a stated torch-CNN
MFU band). vs_baseline >= 1.0 means the north star is met at the band's
central estimate; vs_baseline_band gives the ratio at the band's edges,
and vs_north_star_generous keeps the rounds-1-4 ratio (A100 at 300
img/s, an assumption ABOVE any published torch CNN efficiency) so the
series stays comparable across rounds. Derivation: BASELINE.md /
PERF.md round 5.
"""

from __future__ import annotations

import json
import os
import time


# --- North-star denominator, derived (VERDICT r4 missing #3) ---
# FLOPs/img: XLA cost analysis of the compiled step — 18.297 TFLOP / 128
#   images (BENCH_r04); the torch step executes the same semantics.
# Peak: the reference trains pure fp32 with cudnn.deterministic=True,
#   benchmark=False (reference train.py:39-40); torch 2.x defaults put
#   cudnn convs on TF32 tensor cores (allow_tf32=True), so A100 TF32
#   dense peak (156 TFLOP/s) is the generous ceiling.
# MFU band: 0.07-0.15, central 0.10 — STATED ASSUMPTION, not a
#   measurement. Anchor: NVIDIA's tuned DeepLearningExamples ResNet-50
#   sustains ~9-10% of peak on A100 (TF32 and AMP alike); deterministic-
#   cudnn research code running a 3-network GAN step with two optimizers
#   does not beat the tuned single-CNN anchor.
A100_TF32_PEAK = 156e12
FLOP_PER_IMG = 142.9e9
A100_MFU_BAND = (0.07, 0.15)
A100_MFU_CENTRAL = 0.10
A100_EST_IMG_S = A100_MFU_CENTRAL * A100_TF32_PEAK / FLOP_PER_IMG  # ~109
# Rounds 1-4 used a flat 300 img/s guess (= 27% MFU, above any published
# torch CNN number); kept as a secondary ratio for cross-round comparison.
A100_EST_GENEROUS_IMG_S = 300.0
NORTH_STAR = 3.0 * A100_EST_IMG_S
V5E_PEAK_BF16_FLOPS = 197e12  # TPU v5e per-chip bf16 peak
# Practical workload speed of light (PERF.md round-2 bound: conv-class
# ceilings + measured bandwidth classes serialized => ~200 ms/step).
PRACTICAL_SOL_IMG_S = 640.0

GLOBAL_BATCH = int(os.environ.get("XAS_BENCH_BATCH", 32))
WARMUP = 3
ITERS = 15


def main() -> None:
    import jax

    # Persistent compilation cache: the fused step is a large XLA program
    # and the axon remote-compile path is slow; cache hits make reruns fast.
    from x_as_supervision_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config
    from x_as_supervision_tpu.data.synthetic import SyntheticPoseDataset
    from x_as_supervision_tpu.parallel import mesh as M
    from x_as_supervision_tpu.train.factory import build_gan_spec
    from x_as_supervision_tpu.train.state import (
        init_train_state,
        make_optimizers,
        make_train_step,
    )

    cfg = _flagship_config()
    if os.environ.get("XAS_BENCH_REMAT"):
        # large-batch probes: rematerialization trades FLOPs for the
        # activation memory that b>=64 spills (PERF.md round-4 b64 probe)
        cfg["model_params"]["remat"] = True
    cams = cfg["dataset_params"]["cam_id_list"]
    spec = build_gan_spec(cfg, dtype=jnp.bfloat16)

    n_dev = jax.device_count()
    batch_size = GLOBAL_BATCH
    ds = SyntheticPoseDataset(
        num_samples=batch_size, cam_id_list=cams, patch_size=256
    )
    batch = ds.device_batch(0, batch_size)

    opt_det, opt_disc = make_optimizers(cfg["train_params"], 100)
    state = init_train_state(
        spec, jax.random.PRNGKey(0), batch, opt_det, opt_disc
    )

    mesh = M.make_mesh()
    state = M.replicate_state(state, mesh)
    batch = M.shard_batch(batch, mesh)

    step = make_train_step(spec, opt_det, opt_disc)

    # Honest completion barrier: ready-events of donated (aliased) buffers
    # can resolve before the producing step finishes on this runtime, so a
    # fresh dependent output is computed from the final state and fetched
    # to host (see PERF.md, measurement methodology).
    checksum = jax.jit(
        lambda s: jnp.asarray(s.step, jnp.float32)
        + jax.tree.leaves(s.det_params)[0].astype(jnp.float32).sum()
    )

    # XLA-counted FLOPs of the compiled step (for the MFU estimate).
    try:
        compiled = jax.jit(step, static_argnames=("with_outputs",)).lower(
            state, batch, jax.random.PRNGKey(2), with_outputs=False
        ).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", -1.0))
    except Exception:
        flops = -1.0

    rng = jax.random.PRNGKey(1)
    for i in range(WARMUP):
        state, metrics, _ = step(
            state, batch, jax.random.fold_in(rng, i), with_outputs=False
        )
    float(checksum(state))

    t0 = time.perf_counter()
    for i in range(ITERS):
        state, metrics, _ = step(
            state, batch, jax.random.fold_in(rng, WARMUP + i),
            with_outputs=False,
        )
    float(checksum(state))
    dt = (time.perf_counter() - t0) / ITERS

    imgs_per_step = batch_size * len(cams)
    img_s = imgs_per_step / dt
    img_s_chip = img_s / n_dev

    mfu = flops / dt / V5E_PEAK_BF16_FLOPS / n_dev if flops > 0 else -1.0
    print(
        json.dumps(
            {
                "metric": "train_images_per_sec_per_chip",
                "value": round(img_s_chip, 2),
                "unit": "img/s/chip",
                "vs_baseline": round(img_s_chip / NORTH_STAR, 4),
                "vs_baseline_band": [
                    round(img_s_chip / (3.0 * m * A100_TF32_PEAK
                                        / FLOP_PER_IMG), 4)
                    for m in reversed(A100_MFU_BAND)
                ],
                "vs_north_star_generous": round(
                    img_s_chip / (3.0 * A100_EST_GENEROUS_IMG_S), 4
                ),
                "sol_fraction": round(img_s_chip / PRACTICAL_SOL_IMG_S, 4),
                "step_time_ms": round(dt * 1e3, 2),
                "global_batch": batch_size,
                "cams": len(cams),
                "devices": n_dev,
                "loss_total": float(metrics["loss_total"]),
                "flops_per_step": flops,
                "mfu_vs_bf16_peak": round(mfu, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
