"""Eval CLI.

Same flags as the reference (reference: eval.py:341-409):
  python eval.py --config <yaml> --checkpoint <ckpt_dir>
                 [--multi_hypo best|confident] [--batch_size N]

Loads the detector-only weights out of a composite train checkpoint
(reference strips the 'regressor.' prefix at eval.py:310-313; our
checkpoints store the detector tree directly), runs the jitted eval step
per batch, and writes <ckpt_dir>/eval/eval_result.txt.
"""

from __future__ import annotations

import os
from argparse import ArgumentParser


def main() -> None:
    parser = ArgumentParser()
    parser.add_argument("--config", required=True, help="path to config")
    parser.add_argument("--log_dir", default="log", help="path to log into")
    parser.add_argument("--checkpoint", default=None,
                        help="path to checkpoint to restore")
    parser.add_argument("--batch_size", default=None, type=int)
    parser.add_argument("--worker", default=10, type=int)
    parser.add_argument("--extra_tag", default=" ")
    parser.add_argument("--multi_hypo", default="best",
                        choices=["best", "confident"],
                        help="multi-hypothesis eval mode")
    parser.add_argument("--synthetic", action="store_true",
                        help="evaluate on the in-memory synthetic fixture")
    parser.add_argument("--platform", default=None,
                        help="force a jax platform (e.g. cpu for smoke runs; "
                             "env vars are overridden by this host)")
    parser.add_argument("--coordinator", default=None,
                        help="jax.distributed coordinator address for "
                             "multi-host eval (each process walks its own "
                             "shard of the dataset; the torchrun analogue, "
                             "reference eval.py:317-326)")
    parser.add_argument("--num_processes", default=None, type=int,
                        help="world size (only needed off-TPU)")
    parser.add_argument("--process_id", default=None, type=int,
                        help="this process's rank (only needed off-TPU)")
    parser.add_argument("--reduce_hosts", action="store_true",
                        help="average metric tables across processes before "
                             "recording (opt-in deviation; the reference "
                             "reports rank-0's shard only)")
    opt = parser.parse_args()

    if opt.checkpoint is None:
        raise SystemExit("Must specify checkpoint path")
    log_dir = os.path.dirname(os.path.abspath(opt.checkpoint))

    from x_as_supervision_tpu.config import apply_overrides, load_config
    from x_as_supervision_tpu.train import checkpoint as ckpt
    from x_as_supervision_tpu.train.evaluator import Evaluator
    from x_as_supervision_tpu.train.factory import build_gan_spec

    import jax

    if opt.platform:
        jax.config.update("jax_platforms", opt.platform)
    from x_as_supervision_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    if opt.coordinator:
        from x_as_supervision_tpu.parallel.mesh import initialize_multihost

        initialize_multihost(opt.coordinator, opt.num_processes,
                             opt.process_id)

    import jax.numpy as jnp

    config = load_config(opt.config)
    config = apply_overrides(config, opt.batch_size, None)

    spec = build_gan_spec(config, dtype=jnp.bfloat16)
    det_params, det_stats = ckpt.restore_detector(opt.checkpoint)
    det_vars = {"params": det_params, "batch_stats": det_stats}

    from train import build_dataset

    from x_as_supervision_tpu.train.logging import create_writer

    dataset = build_dataset(config, opt.synthetic, eval_only=True)
    evaluator = Evaluator(config, spec.detector, det_vars, dataset, log_dir)
    # rank 0 logs TB images, like the reference (eval.py:152)
    tb_logger = (
        create_writer(os.path.join(log_dir, "eval", "tensorboard"))
        if jax.process_index() == 0 else None
    )
    tables = evaluator.eval(mode=opt.multi_hypo, tb_log=tb_logger)
    if opt.reduce_hosts or jax.process_index() == 0:
        evaluator.record(*tables, reduce_hosts=opt.reduce_hosts)
    if tb_logger is not None:
        tb_logger.close()


if __name__ == "__main__":
    main()
