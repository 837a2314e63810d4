"""Control experiment: plain ResNet-50 train-step MFU on the bench chip.

PERF.md's speed-of-light bound asserts a "70% of bf16 peak" ceiling for
the detector's ResNet-class convs, citing published TPU ResNet MFUs but
without a measurement on THIS chip/tunnel. This tool trains a bare
ResNet-50 classifier (our backbone + global-avg-pool + Dense(1000),
softmax CE, Adam, bf16 compute, fp32 BN stats — no GAN composition, no
deconv head, no renderer) and reports step time + XLA-counted FLOPs +
MFU, at both the production stream shape (256^2, batch 128 = the bench
step's CB) and the standard 224^2 ImageNet shape. If this lands at
30-40% MFU like the composed step's conv class, the bound's constant is
wrong (the ceiling is XLA/chip-level); if it lands materially higher,
the composed program is leaving throughput on the table.

Usage: python -m x_as_supervision_tpu.tools.bench_resnet_control
       [--batch 128] [--size 256] [--platform cpu] [--layers 50]
"""

from __future__ import annotations

import argparse
import json
import time

V5E_PEAK_BF16_FLOPS = 197e12


def run_case(batch: int, size: int, layers: int, iters: int, warmup: int):
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax

    from ..models.resnet import ResNetBackbone

    class ResNetClassifier(nn.Module):
        num_classes: int = 1000

        @nn.compact
        def __call__(self, x, train: bool = True):
            feats = ResNetBackbone(
                num_layers=layers, dtype=jnp.bfloat16, name="backbone"
            )(x, train)
            pooled = feats.mean(axis=(1, 2))
            return nn.Dense(self.num_classes, dtype=jnp.bfloat16)(
                pooled
            ).astype(jnp.float32)

    model = ResNetClassifier()
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.normal(rng, (batch, size, size, 3), jnp.float32)
    labels = jax.random.randint(rng, (batch,), 0, 1000)
    variables = model.init(rng, imgs[:1], train=False)
    params, stats = variables["params"], variables["batch_stats"]

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def loss_fn(params, stats, imgs, labels):
        logits, new_vars = model.apply(
            {"params": params, "batch_stats": stats}, imgs, train=True,
            mutable=["batch_stats"],
        )
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()
        return loss, new_vars["batch_stats"]

    @jax.jit
    def step(params, stats, opt_state, imgs, labels):
        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, stats, imgs, labels
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, stats, opt_state, loss

    try:
        compiled = step.lower(params, stats, opt_state, imgs, labels
                              ).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", -1.0))
    except Exception:
        flops = -1.0

    # chained steps (params feed forward) + fresh-output fetch barrier
    # (PERF.md measurement methodology)
    for _ in range(warmup):
        params, stats, opt_state, loss = step(
            params, stats, opt_state, imgs, labels
        )
    float(loss)

    t0 = time.perf_counter()
    for _ in range(iters):
        params, stats, opt_state, loss = step(
            params, stats, opt_state, imgs, labels
        )
    float(loss)
    float(jax.tree.leaves(params)[0].astype(jnp.float32).sum())
    dt = (time.perf_counter() - t0) / iters

    mfu = flops / dt / V5E_PEAK_BF16_FLOPS if flops > 0 else -1.0
    return {
        "batch": batch, "size": size, "layers": layers,
        "step_ms": round(dt * 1e3, 2),
        "img_s": round(batch / dt, 1),
        "flops_per_step": flops,
        "mfu_vs_bf16_peak": round(mfu, 4),
        "loss": float(loss),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--layers", type=int, default=50)
    p.add_argument("--iters", type=int, default=15)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--platform", default=None)
    p.add_argument("--also_224", action="store_true",
                   help="additionally run the standard 224^2 shape")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from ..utils.platform import enable_compile_cache

    enable_compile_cache()

    out = [run_case(args.batch, args.size, args.layers, args.iters,
                    args.warmup)]
    if args.also_224:
        out.append(run_case(args.batch, 224, args.layers, args.iters,
                            args.warmup))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
