"""A/B benchmark: standard (dilated-lowering) deconv head vs the
phase-layout-propagated head (models/deconv_phase.py).

Two measurements, both chained on device and fetched once (PERF.md
"measurement methodology" — un-chained loops overlap dispatches and
per-iteration fetches manufacture phantom deltas):

  * isolated head fwd+bwd at the flagship shape (CB=128 camera-batched
    streams, 8x8x2048 backbone features, 256 filters, K*D=1152 logits);
  * the full fused GAN train step with detector_params.phase_head toggled.

Usage (on the bench chip):
  python -m x_as_supervision_tpu.tools.bench_phase_head [--skip_full]
"""

from __future__ import annotations

import argparse
import time


def _cache():
    import jax

    from ..utils.platform import enable_compile_cache

    enable_compile_cache()


def bench_isolated(batch: int = 128, iters: int = 30, warmup: int = 5):
    import jax
    import jax.numpy as jnp

    from ..models.resnet import DeconvHead

    results = {}
    x0 = jax.random.normal(
        jax.random.PRNGKey(0), (batch, 8, 8, 2048), jnp.bfloat16
    )
    for name, phase in (("std", False), ("phase", True)):
        head = DeconvHead(num_joints=18, depth_dim=64, dtype=jnp.bfloat16,
                          fp32_logits=False, phase=phase)
        variables = head.init(jax.random.PRNGKey(1), x0, train=False)

        def loss_fn(x):
            out, _ = head.apply(variables, x, train=True,
                                mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32)) * 1e-6

        @jax.jit
        def chained(x):
            # fwd+bwd, output feeds the next iteration (device chain)
            g = jax.grad(loss_fn)(x)
            return x + g.astype(x.dtype) * jnp.bfloat16(1e-6)

        x = chained(x0)  # compile + warm
        for _ in range(warmup):
            x = chained(x)
        float(jnp.sum(x.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(iters):
            x = chained(x)
        float(jnp.sum(x.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / iters * 1e3
        results[name] = dt
        print(f"isolated head fwd+bwd [{name:5s}]: {dt:8.3f} ms "
              f"(B={batch})")
    print(f"isolated ratio phase/std: "
          f"{results['phase'] / results['std']:.3f}x")
    return results


def bench_full_step(iters: int = 12, warmup: int = 3):
    import jax
    import jax.numpy as jnp

    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _flagship_config

    from ..data.synthetic import SyntheticPoseDataset
    from ..parallel import mesh as M
    from ..train.factory import build_gan_spec
    from ..train.state import (
        init_train_state, make_optimizers, make_train_step,
    )

    results = {}
    for name, phase in (("std", False), ("phase", True)):
        cfg = _flagship_config()
        cfg["model_params"]["detector_params"]["phase_head"] = phase
        spec = build_gan_spec(cfg, dtype=jnp.bfloat16)
        cams = cfg["dataset_params"]["cam_id_list"]
        ds = SyntheticPoseDataset(num_samples=32, cam_id_list=cams,
                                  patch_size=256)
        batch = ds.device_batch(0, 32)
        opt_det, opt_disc = make_optimizers(cfg["train_params"], 100)
        state = init_train_state(
            spec, jax.random.PRNGKey(0), batch, opt_det, opt_disc
        )
        mesh = M.make_mesh()
        state = M.replicate_state(state, mesh)
        sharded = M.shard_batch(batch, mesh)
        step = make_train_step(spec, opt_det, opt_disc)
        checksum = jax.jit(
            lambda s: jnp.asarray(s.step, jnp.float32)
            + jax.tree.leaves(s.det_params)[0].astype(jnp.float32).sum()
        )
        rng = jax.random.PRNGKey(1)
        for i in range(warmup):
            state, metrics, _ = step(
                state, sharded, jax.random.fold_in(rng, i),
                with_outputs=False,
            )
        float(checksum(state))
        t0 = time.perf_counter()
        for i in range(iters):
            state, metrics, _ = step(
                state, sharded, jax.random.fold_in(rng, warmup + i),
                with_outputs=False,
            )
        float(checksum(state))
        dt = (time.perf_counter() - t0) / iters * 1e3
        results[name] = dt
        print(f"full train step [{name:5s}]: {dt:8.2f} ms "
              f"(loss={float(metrics['loss_total']):.4f})")
    print(f"full-step ratio phase/std: "
          f"{results['phase'] / results['std']:.3f}x")
    return results


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--skip_full", action="store_true")
    p.add_argument("--skip_isolated", action="store_true")
    p.add_argument("--batch", type=int, default=128)
    args = p.parse_args()
    _cache()
    if not args.skip_isolated:
        bench_isolated(batch=args.batch)
    if not args.skip_full:
        bench_full_step()


if __name__ == "__main__":
    main()
