"""Serving benchmark: PoseEstimator latency/throughput per batch size.

Reports two numbers per batch size (PERF.md "serving evidence"):
  * device fwd — the jitted detector forward with device-resident input,
    chained through a scalar carry (honest device latency; see PERF.md
    measurement methodology).
  * end-to-end — PoseEstimator.__call__ (host numpy in, host numpy out),
    which includes host<->device transfer; on a remote-tunnel dev setup
    this column measures the link, not the chip.

Usage:
  python -m x_as_supervision_tpu.tools.bench_serve --config cfg.yaml \
      [--checkpoint <ckpt>] [--batches 1,8,32] [--platform cpu]
Without --checkpoint the detector is randomly initialized (timing is
weight-independent).
"""

from __future__ import annotations

import json
import time
from argparse import ArgumentParser

import numpy as np


def main() -> None:
    parser = ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--batches", default="1,8,32")
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--platform", default=None,
                        help="override jax platform (e.g. cpu)")
    opt = parser.parse_args()

    import jax

    if opt.platform:
        jax.config.update("jax_platforms", opt.platform)
    from ..utils.platform import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp
    import yaml

    from ..serve import PoseEstimator

    with open(opt.config) as f:
        config = yaml.safe_load(f)

    det_vars = None
    if opt.checkpoint is None:
        from ..models.detector import build_detector

        det = build_detector(
            config["model_params"]["detector_params"], dtype=jnp.bfloat16
        )
        patch = int(config["train_params"].get("patch_width", 256))
        det_vars = det.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, patch, patch, 3), jnp.float32), train=False,
        )

    rng = np.random.default_rng(0)
    for bs in (int(b) for b in opt.batches.split(",")):
        est = PoseEstimator(
            config, checkpoint_path=opt.checkpoint, det_vars=det_vars,
            batch_size=bs,
        )
        imgs = rng.uniform(0, 255, size=(bs, est.patch, est.patch, 3)).astype(
            np.float32
        )
        est(imgs)  # compile

        x = jnp.asarray(est.preprocess(imgs))

        def run(c, x=x, est=est):
            kps = est._forward(est._det_vars, x + c.astype(x.dtype))
            return kps.astype(jnp.float32).sum() * 1e-9

        run_j = jax.jit(run)
        c = run_j(jnp.float32(0))
        float(c)
        t0 = time.perf_counter()
        for _ in range(opt.iters):
            c = run_j(c)
        float(c)
        dev = (time.perf_counter() - t0) / opt.iters

        t0 = time.perf_counter()
        for _ in range(opt.iters):
            est(imgs)
        e2e = (time.perf_counter() - t0) / opt.iters

        print(
            f"batch {bs:3d}: device fwd {dev*1e3:7.2f} ms "
            f"({bs/dev:8.1f} img/s) | end-to-end {e2e*1e3:8.2f} ms "
            f"({bs/e2e:8.1f} img/s)",
            flush=True,
        )
        print(
            json.dumps({
                "batch": bs,
                "device_ms": round(dev * 1e3, 3),
                "img_s_device": round(bs / dev, 1),
                "end_to_end_ms": round(e2e * 1e3, 3),
                "img_s_e2e": round(bs / e2e, 1),
            }),
            flush=True,
        )


if __name__ == "__main__":
    main()
