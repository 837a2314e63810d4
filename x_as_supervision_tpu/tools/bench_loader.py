"""Host input-pipeline throughput benchmark (VERDICT r4 weak #5).

Measures the REAL training feed — data/factory.basic_data -> BatchLoader
with thread prefetch, the exact path train.py drives — in samples/s and
device-images/s on the current host, keyed by the two feed knobs that
changed after the stale round-1 measurement (uint8_feed, geodesic maps).
Compares against the measured device demand (419 img/s/chip at b32,
BENCH_r04) to answer: is the host feed the bottleneck, and by how much?

Usage:
  python -m x_as_supervision_tpu.tools.bench_loader --config <yaml>
      [--batches 12] [--batch-size 32] [--worker 12]
Prints one JSON line per knob combination and a summary verdict.
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import time


def measure(config: dict, batches: int, workers: int, seed: int) -> dict:
    from ..data.factory import basic_data
    from ..data.loader import BatchLoader

    dataset = basic_data(config, seed=seed)
    loader = BatchLoader(
        dataset,
        batch_size=config["train_params"]["batch_size"],
        shuffle=True,
        num_workers=workers,
        prefetch=2,
        seed=seed,
    )
    it = loader.epoch(0)
    next(it)  # warmup: thread pool spin-up + first prefetch fill
    t0 = time.perf_counter()
    n = 0
    cams = len(config["dataset_params"]["cam_id_list"])
    timed = min(batches, len(loader) - 1)
    for _ in range(timed):
        batch = next(it)
        n += config["train_params"]["batch_size"]
    dt = time.perf_counter() - t0
    del batch, it, loader
    return {
        "samples_s": round(n / dt, 2),
        "device_imgs_s": round(n * cams / dt, 2),
        "batches": timed,
        "seconds": round(dt, 2),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--batches", type=int, default=12)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--worker", type=int, default=12)
    p.add_argument("--device-demand", type=float, default=418.66,
                   help="img/s/chip the device consumes (BENCH_r04)")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import yaml

    with open(args.config) as f:
        base = yaml.safe_load(f)
    base["model_params"]["cam_id_list"] = (
        base["dataset_params"]["cam_id_list"]
    )
    base["train_params"]["batch_size"] = args.batch_size

    knobs = [
        # shipped config: uint8 feed on, geodesic off
        ("uint8+nogeo", {"uint8_feed": True, "geodesic_pt_list": []}),
        # round-1-era feed: float32 ship, geodesic distance maps on
        ("f32+nogeo", {"uint8_feed": False, "geodesic_pt_list": []}),
        ("uint8+geo", {"uint8_feed": True, "geodesic_pt_list": [0]}),
    ]
    results = {}
    for name, over in knobs:
        cfg = copy.deepcopy(base)
        cfg["dataset_params"].update(over)
        res = measure(cfg, args.batches, args.worker, seed=0)
        results[name] = res
        print(json.dumps({"knob": name, **res,
                          "feed_headroom_vs_device":
                          round(res["device_imgs_s"]
                                / args.device_demand, 3)}),
              flush=True)

    shipped = results["uint8+nogeo"]["device_imgs_s"]
    print(json.dumps({
        "summary": "host_feed",
        "host_cpus": os.cpu_count(),
        "shipped_feed_imgs_s": shipped,
        "device_demand_imgs_s": args.device_demand,
        "feed_bound": shipped < args.device_demand,
    }))


if __name__ == "__main__":
    main()
