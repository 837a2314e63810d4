"""2D/mono-video train CLI (TikTok path).

The reference's launch scripts dispatch TikTok/MPII configs to a
train2d3d.py that is not shipped in its repo (reference: scripts/train.sh:
24-27, README.md:53); this is the live equivalent: same Trainer, mono
batches from TikTok_dataset, the composed model's mono branch (identity
camera, no symmetry loss), and the simple_version TB layout.

Usage:
  python train2d3d.py --config config/TikTok_Multi_S1.yaml [...train.py flags]
"""

from __future__ import annotations

import os
from argparse import ArgumentParser


def build_tiktok_dataset(config: dict, seed: int = 0):
    from x_as_supervision_tpu.data.dataloader_2d import TikTok_dataset

    dp = config["dataset_params"]
    return TikTok_dataset(
        dp["dataset"]["path"],
        dp.get("geodesic_param_list", [2, 1, 3, 20, 0.0]),
        dp.get("smpl_pseudo_img"),
        norm_param={"mean": None, "std": None},
        mode="train",
        rect_3d_width=config["train_params"].get("rect_3d_width", 256),
        seed=seed,
    )


def main() -> None:
    parser = ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--log_dir", default="log")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--batch_size", default=None, type=int)
    parser.add_argument("--epoch", default=None, type=int)
    parser.add_argument("--worker", default=10, type=int)
    parser.add_argument("--extra_tag", default="")
    parser.add_argument("--finetune", default=False, action="store_true")
    parser.add_argument("--seed", default=-1, type=int)
    parser.add_argument("--coordinator", default=None)
    parser.add_argument("--fp32", action="store_true")
    parser.add_argument("--platform", default=None,
                        help="force a jax platform (e.g. cpu for smoke runs; "
                             "env vars are overridden by this host)")
    opt = parser.parse_args()

    from x_as_supervision_tpu.config import apply_overrides, load_config
    from x_as_supervision_tpu.parallel.mesh import initialize_multihost

    import jax

    if opt.platform:
        jax.config.update("jax_platforms", opt.platform)
    from x_as_supervision_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    initialize_multihost(opt.coordinator)

    import jax.numpy as jnp

    from train import setup_seed
    from x_as_supervision_tpu.train.logging import create_writer
    from x_as_supervision_tpu.train.trainer import Trainer, create_run_dir

    config = load_config(opt.config)
    config = apply_overrides(config, opt.batch_size, opt.epoch)
    setup_seed(opt.seed)

    save_dir = create_run_dir(
        opt.log_dir, opt.config, opt.seed, opt.extra_tag, opt.finetune,
        opt.checkpoint,
    )
    tb_logger = (
        create_writer(os.path.join(save_dir, "tensorboard"))
        if jax.process_index() == 0
        else None
    )

    dataset = build_tiktok_dataset(config, seed=max(opt.seed, 0))
    trainer = Trainer(
        config, dataset, save_dir,
        checkpoint_path=opt.checkpoint,
        mode="finetune" if opt.finetune else "train",
        seed=opt.seed,
        dtype=jnp.float32 if opt.fp32 else jnp.bfloat16,
        num_workers=opt.worker,
    )
    trainer.train(tb_logger)
    if tb_logger is not None:
        tb_logger.close()


if __name__ == "__main__":
    main()
