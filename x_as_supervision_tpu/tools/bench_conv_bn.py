"""Isolated benchmark: fused BN+ReLU+conv+stats link vs the XLA chain.

Chained-carry timing (PERF.md measurement methodology) of
ops/conv_bn_pallas.fused_bn_relu_conv against xla_bn_relu_conv at the
detector's stage-2/3/4 3x3 shapes (bench stream CB=128), bf16.

Usage: python -m x_as_supervision_tpu.tools.bench_conv_bn
       [--batch 128] [--iters 20] [--platform cpu] [--shapes 32x128,16x256]
       [--dtype bf16|f32] [--check_batches 2,8,16,128]

--check_batches: exactness-only sweep (no timing) of the given batch
sizes per shape — the PERF.md hardware-exactness table.
"""

from __future__ import annotations

import argparse
import json
import time


def bench_one(fn, x, w, scale, shift, iters, warmup=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(carry, x):
        y, stats = fn(x + carry.astype(x.dtype), w, scale, shift)
        return stats.sum() * 1e-12, y

    carry = jnp.float32(0.0)
    for _ in range(warmup):
        carry, y = chained(carry, x)
    float(carry)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry, y = chained(carry, x)
    float(carry)
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--shapes", default="32x128,16x256,8x512",
                   help="comma list of <spatial>x<channels>")
    p.add_argument("--platform", default=None)
    p.add_argument("--dtype", default="bf16", choices=("bf16", "f32"))
    p.add_argument("--check_batches", default=None,
                   help="exactness-only sweep over these batch sizes")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from ..utils.platform import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp
    import numpy as np

    from ..ops.conv_bn_pallas import fused_bn_relu_conv, xla_bn_relu_conv

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)

    if args.check_batches:
        for spec in args.shapes.split(","):
            s, c = (int(v) for v in spec.split("x"))
            for b in (int(v) for v in args.check_batches.split(",")):
                x = jnp.asarray(rng.normal(size=(b, s, s, c)), dt)
                w = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, dt)
                scale = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32)
                shift = jnp.asarray(rng.normal(size=c) * 0.1, jnp.float32)
                yf, sf = fused_bn_relu_conv(x, w, scale, shift)
                yx, sx = xla_bn_relu_conv(x, w, scale, shift)
                print(json.dumps({
                    "shape": f"{b}x{s}x{s}x{c}", "dtype": args.dtype,
                    "y_max_abs_err": float(jnp.abs(
                        yf.astype(jnp.float32) - yx.astype(jnp.float32)
                    ).max()),
                    "stats_max_abs_err": float(jnp.abs(sf - sx).max()),
                }), flush=True)
        return

    rows = []
    for spec in args.shapes.split(","):
        s, c = (int(v) for v in spec.split("x"))
        x = jnp.asarray(
            rng.normal(size=(args.batch, s, s, c)), dt
        )
        w = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, dt)
        scale = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32)
        shift = jnp.asarray(rng.normal(size=c) * 0.1, jnp.float32)

        # numerics check on-device first
        yf, sf = fused_bn_relu_conv(x, w, scale, shift)
        yx, sx = xla_bn_relu_conv(x, w, scale, shift)
        err = float(jnp.abs(
            yf.astype(jnp.float32) - yx.astype(jnp.float32)
        ).max())

        ms_fused = bench_one(fused_bn_relu_conv, x, w, scale, shift,
                             args.iters)
        ms_xla = bench_one(xla_bn_relu_conv, x, w, scale, shift, args.iters)
        flop = 2 * args.batch * s * s * 9 * c * c
        rows.append({
            "shape": f"{s}x{s}x{c}", "batch": args.batch,
            "fused_ms": round(ms_fused, 3), "xla_ms": round(ms_xla, 3),
            "speedup": round(ms_xla / ms_fused, 3),
            "fused_tflops": round(flop / ms_fused / 1e9, 1),
            "max_abs_err": err,
        })
        print(json.dumps(rows[-1]), flush=True)


if __name__ == "__main__":
    main()
