"""Train CLI.

Same flags as the reference (reference: train.py:304-344):
  python train.py --config <yaml> [--checkpoint <ckpt_dir>] [--finetune]
                  [--batch_size N] [--epoch N] [--seed S] [--extra_tag T]
                  [--log_dir DIR] [--worker N]

TPU-native: one process per host (multi-host via --coordinator), global
data-parallel mesh, fused jitted GAN step. `--synthetic` trains on the
in-memory fixture dataset (no downloaded data needed).
"""

from __future__ import annotations

import os
import random
from argparse import ArgumentParser

import numpy as np


def setup_seed(seed: int) -> None:
    """Host-side RNG seeding; device randomness is keyed from the seed in
    the trainer (JAX PRNG is deterministic by construction — the reference's
    cudnn.deterministic knobs have no TPU analogue;
    reference: train.py:32-41)."""
    if seed != -1:
        np.random.seed(seed)
        random.seed(seed)


def build_dataset(config: dict, synthetic: bool, eval_only: bool = False):
    if synthetic:
        from x_as_supervision_tpu.data.synthetic import SyntheticPoseDataset

        tp = config["train_params"]
        return SyntheticPoseDataset(
            num_samples=max(tp["batch_size"] * 4, 64),
            cam_id_list=config["dataset_params"]["cam_id_list"],
            patch_size=tp.get("patch_width", 256),
            rect_3d_width=tp.get("rect_3d_width", 2000),
        )
    from x_as_supervision_tpu.data.factory import basic_data

    return basic_data(config, eval_only=eval_only)


def main() -> None:
    parser = ArgumentParser()
    parser.add_argument("--config", required=True, help="path to config")
    parser.add_argument("--log_dir", default="log", help="path to log into")
    parser.add_argument("--checkpoint", default=None,
                        help="path to checkpoint to restore")
    parser.add_argument("--batch_size", default=None, type=int)
    parser.add_argument("--epoch", default=None, type=int)
    parser.add_argument("--worker", default=10, type=int,
                        help="data pipeline worker threads")
    parser.add_argument("--extra_tag", default="")
    parser.add_argument("--finetune", default=False, action="store_true",
                        help="finetune the model (S1 -> S2)")
    parser.add_argument("--seed", default=-1, type=int)
    parser.add_argument("--coordinator", default=None,
                        help="jax.distributed coordinator addr for multi-host")
    parser.add_argument("--num_processes", default=None, type=int,
                        help="world size for non-TPU multi-host launches "
                             "(TPU pods discover it from metadata)")
    parser.add_argument("--process_id", default=None, type=int,
                        help="this host's rank for non-TPU multi-host "
                             "launches (torchrun RANK equivalent)")
    parser.add_argument("--synthetic", action="store_true",
                        help="train on the in-memory synthetic fixture")
    parser.add_argument("--fp32", action="store_true",
                        help="disable bfloat16 compute")
    parser.add_argument("--backbone_init", default=None,
                        help="converted ImageNet backbone npz "
                             "(tools/convert_torch_resnet)")
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
    initialize_multihost(opt.coordinator, opt.num_processes, opt.process_id)

    import jax.numpy as jnp

    config = load_config(opt.config)
    config = apply_overrides(config, opt.batch_size, opt.epoch)

    setup_seed(opt.seed)

    from x_as_supervision_tpu.train.logging import create_writer
    from x_as_supervision_tpu.train.trainer import Trainer, create_run_dir

    checkpoint = opt.checkpoint
    if checkpoint == "auto":
        # convenience resume: newest checkpoint of the newest run of this
        # config under --log_dir (crash-restart without bookkeeping)
        import glob

        from x_as_supervision_tpu.train.checkpoint import latest_checkpoint

        name = os.path.basename(opt.config).split(".")[0]
        runs = sorted(glob.glob(os.path.join(opt.log_dir, name + "_*")))
        checkpoint = latest_checkpoint(runs[-1]) if runs else None
        print(f"auto-resume from {checkpoint}")

    save_dir = create_run_dir(
        opt.log_dir, opt.config, opt.seed, opt.extra_tag, opt.finetune,
        checkpoint,
    )
    tb_logger = (
        create_writer(os.path.join(save_dir, "tensorboard"))
        if jax.process_index() == 0
        else None
    )

    dataset = build_dataset(config, opt.synthetic)
    trainer = Trainer(
        config,
        dataset,
        save_dir,
        checkpoint_path=checkpoint,
        mode="finetune" if opt.finetune else "train",
        seed=opt.seed,
        dtype=jnp.float32 if opt.fp32 else jnp.bfloat16,
        backbone_init=opt.backbone_init,
        num_workers=opt.worker,
    )
    trainer.train(tb_logger)
    if tb_logger is not None:
        tb_logger.close()


if __name__ == "__main__":
    main()
