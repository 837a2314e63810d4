"""Training harness: run-dir management, epoch loop, GAN update cadence,
TB logging, checkpointing.

The loop mirrors the reference Trainer (reference: train.py:47-210):
alternating disc/gen updates on the `update_interval` cadence, rank-0
TensorBoard logging every step (images every 50), per-epoch LR decay
(inside the optax schedules), checkpoints every `checkpoint_freq` epochs +
the final epoch. On TPU the whole iteration is one jitted function; the
host only drives data and logging.
"""

from __future__ import annotations

import math
import os
import time
from shutil import copy as copy_file

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel import mesh as M
from . import checkpoint as ckpt
from .factory import build_gan_spec
from .logging import tb_vis
from .profiling import Profiler, StepTimer
from .state import (
    TrainState,
    init_train_state,
    make_optimizers,
    make_train_step,
    multistep_schedule,
)


def create_run_dir(
    log_root: str,
    config_path: str,
    seed: int,
    extra_tag: str = "",
    finetune: bool = False,
    checkpoint_path: str | None = None,
) -> str:
    """log/<cfg>[_FINETUNE]_seed<y>_<tag><timestamp>/ with the config copied
    in; resuming reuses the checkpoint's directory.
    Reference: train.py:282-302."""
    if checkpoint_path is not None and not finetune:
        return os.path.dirname(os.path.abspath(checkpoint_path))
    seed_tag = f"seed{seed if seed != -1 else '_rand'}_"
    name = os.path.basename(config_path).split(".")[0]
    if finetune:
        name += "_FINETUNE"
    stamp = time.strftime("%d_%m_%y_%H.%M.%S", time.gmtime())
    run_dir = os.path.join(log_root, name + "_" + seed_tag + extra_tag + stamp)
    if jax.process_count() > 1:
        # every process must agree on the (timestamped) run dir — the
        # sharded checkpoint save is collective over it — so process 0's
        # choice is broadcast (clock skew would otherwise fork the name)
        from jax.experimental import multihost_utils

        data = np.frombuffer(run_dir.encode(), dtype=np.uint8)
        # fixed-size buffer (broadcast needs identical shapes on every
        # process); sized to the path, with a hard error instead of a
        # numpy broadcast cliff on pathological log roots
        size = 4096
        if len(data) >= size:
            raise ValueError(
                f"run_dir path too long for the multi-host broadcast "
                f"buffer ({len(data)} >= {size}): {run_dir}"
            )
        padded = np.zeros(size, np.uint8)
        padded[: len(data)] = data
        agreed = np.asarray(multihost_utils.broadcast_one_to_all(padded))
        run_dir = bytes(agreed[agreed != 0]).decode()
    if jax.process_index() == 0:
        os.makedirs(run_dir, exist_ok=True)
        dst = os.path.join(run_dir, os.path.basename(config_path))
        if os.path.isfile(config_path) and not os.path.exists(dst):
            copy_file(config_path, run_dir)
    return run_dir


class Trainer:
    def __init__(
        self,
        config: dict,
        dataset,
        save_dir: str,
        checkpoint_path: str | None = None,
        mode: str = "train",
        seed: int = 0,
        dtype=None,
        profile_dir: str | None = None,
        backbone_init: str | None = None,
        num_workers: int = 10,
    ):
        import jax.numpy as jnp

        self.config = config
        self.dataset = dataset
        self.save_dir = save_dir
        self.profile_dir = profile_dir

        tp = config["train_params"]
        self.global_batch = tp["batch_size"]
        self.local_batch, self.batch_offset = M.process_local_batch_slice(
            self.global_batch
        )
        self.steps_per_epoch = max(1, len(dataset) // self.global_batch)
        self.num_epochs = tp["num_epochs"]
        self.ckpt_freq = tp.get("checkpoint_freq", 1)

        self.spec = build_gan_spec(
            config, dtype=dtype if dtype is not None else jnp.bfloat16
        )

        # GAN cadence (reference: train.py:94-99) — needed before the
        # optimizers so each chain's LR milestones land in its own
        # update-count units (state.py:multistep_schedule).
        interval = config["model_params"]["loss_config"].get(
            "smpl_disc_loss", {}
        ).get("update_interval", 1)
        if interval >= 1:
            self.disc_interval, self.gen_interval = int(interval), 1
        else:
            self.disc_interval, self.gen_interval = 1, int(round(1.0 / interval))

        self.opt_det, self.opt_disc = make_optimizers(
            tp, self.steps_per_epoch,
            disc_every=self.disc_interval, gen_every=self.gen_interval,
        )
        self._lr_schedule = multistep_schedule(
            float(tp["lr_kp_detector"]), tp.get("epoch_milestones", []),
            self.steps_per_epoch, every=self.gen_interval,
        )

        # TB scalar cadence (1 = every step, reference parity; raise it on
        # high-latency links — each log costs one device->host round trip).
        self.log_interval = int(config["train_params"].get("log_interval", 1))
        # Image-panel cadence: the reference logs panels every 50 steps
        # (reference: train.py:196-199). Align it with log_interval so the
        # expensive with_outputs=True step only renders outputs on steps
        # that actually reach tb_vis.
        self.vis_interval = math.lcm(50, self.log_interval)
        # Optional tensor parallelism over the mesh's `model` axis
        # (train_params.model_parallelism, default 1 = pure DP like the
        # reference's DDP; parallel/tp.py for the sharding rules).
        self.model_parallelism = int(
            config["train_params"].get("model_parallelism", 1)
        )
        self.mesh = M.make_mesh(model_parallelism=self.model_parallelism)
        self.seed = seed if seed != -1 else int(time.time()) % (2**31)
        self.rng = jax.random.PRNGKey(self.seed)

        sample = dataset.device_batch(0, self.local_batch)
        state = init_train_state(
            self.spec, self.rng, sample, self.opt_det, self.opt_disc
        )
        det_p = config["model_params"].get("detector_params", {})
        backbone_init = backbone_init or det_p.get("backbone_init")
        from ..tools.convert_torch_resnet import (
            load_npz_into_variables, resolve_backbone_init,
        )

        # ImageNet initialization, reference-default style (the reference
        # loads the model zoo at construction, network.py:46-54): an
        # explicit npz/pth (pth auto-converted), or auto-detection under
        # data/pretrained/ when nothing is configured.
        backbone_init = resolve_backbone_init(
            backbone_init, det_p.get("num_layers", 50)
        )
        if backbone_init:
            det_vars = load_npz_into_variables(
                backbone_init,
                {"params": state.det_params, "batch_stats": state.det_stats},
            )
            state = state.replace(
                det_params=det_vars["params"],
                det_stats=det_vars["batch_stats"],
            )
            print(f"backbone initialized from {backbone_init}")
        self.epochs_run = 0
        if checkpoint_path is not None and mode == "finetune":
            # weights-only graft onto the fresh state; placed below with
            # everything else (reference: train.py:115-121)
            state = ckpt.restore_finetune(checkpoint_path, state)
            print("Finetuning from checkpoint (optimizers reset)")
        elif checkpoint_path is not None and mode != "train":
            raise NotImplementedError(mode)
        if self.model_parallelism > 1:
            from ..parallel.tp import shard_state

            self.state = shard_state(state, self.mesh)
        else:
            self.state = M.replicate_state(state, self.mesh)
        if checkpoint_path is not None and mode == "train":
            # restore AFTER mesh placement so the template carries the
            # production shardings: each process reads only its own shards
            # of TP-partitioned leaves (no full-array gather anywhere)
            self.state = ckpt.restore_resume(checkpoint_path, self.state)
            self.epochs_run = int(self.state.epoch)
            print(f"Resuming training from epoch {self.epochs_run}")

        from ..data.loader import BatchLoader

        # Thread-parallel prefetching feed (the DataLoader-worker
        # equivalent; cv2 warps and the native FMM release the GIL).
        self.loader = BatchLoader(
            dataset,
            batch_size=self.global_batch,
            shuffle=True,
            num_workers=num_workers,
            prefetch=2,
            seed=self.seed,
            num_shards=jax.process_count(),
            shard_index=jax.process_index(),
        )
        self.steps_per_epoch = len(self.loader)

        self.step_fn = make_train_step(self.spec, self.opt_det, self.opt_disc)
        self.tb_parent_ids = np.array(config["model_params"]["parent_ids"])
        self.tb_pair_ids = np.array(config["model_params"]["flip_pairs"])
        if jax.process_index() == 0:
            from ..utils import summarize

            print(summarize("detector", state.det_params))
            if state.phys_params:
                print(summarize("physique", state.phys_params))
            if state.disc_params:
                print(summarize("discriminator", state.disc_params))
        self.profiler = Profiler.from_config(config, save_dir)
        self.timer = StepTimer()
        self.images_per_step = self.global_batch * max(
            len(self.spec.cam_id_list), 1
        )

    def _batches(self, epoch: int):
        """Per-epoch batches: epoch-keyed shuffle + per-process shard (the
        DistributedSampler equivalent; reference: train.py:153,278),
        prefetched by the thread-pool loader."""
        yield from self.loader.epoch(epoch)

    def train(self, tb_logger=None) -> None:
        for epoch in range(self.epochs_run, self.num_epochs):
            for it, batch in enumerate(self._batches(epoch)):
                cur_step = epoch * self.steps_per_epoch + it
                do_disc = (
                    self.spec.discriminator is not None
                    and cur_step % self.disc_interval == 0
                )
                do_gen = cur_step % self.gen_interval == 0
                if not (do_disc or do_gen):
                    continue

                self.profiler.maybe_start(cur_step)
                # split host-only fields (act tags, paths) from the device batch
                device_batch = {
                    k: v for k, v in batch.items()
                    if not isinstance(v, (list, str))
                }
                sharded = M.shard_batch(device_batch, self.mesh)
                step_rng = jax.random.fold_in(self.rng, cur_step)
                # UNIFORM across processes: with_outputs selects a distinct
                # compiled program (different collective schedule), and a
                # per-process choice deadlocks the mesh on vis steps
                # (caught by tests/test_launcher_integration.py — gloo recv
                # timeout with process 0 in the outputs program and the
                # rest in the other one). Non-zero processes compute the
                # vis outputs and drop them, like DDP ranks do.
                want_outputs = cur_step % self.vis_interval == 0
                self.state, metrics, outputs = self.step_fn(
                    self.state, sharded, step_rng,
                    do_disc=do_disc, do_gen=do_gen,
                    with_outputs=want_outputs,
                )
                if want_outputs and outputs and jax.process_count() > 1:
                    # vis outputs are batch-sharded GLOBAL arrays: a host
                    # fetch from process 0 alone raises (spans
                    # non-addressable devices). Gather collectively on
                    # EVERY process — uniform program, numpy everywhere —
                    # then only process 0 logs. (Scalar metrics are fully
                    # replicated and fetch locally without this.)
                    from jax.experimental import multihost_utils
                    outputs = multihost_utils.process_allgather(
                        outputs, tiled=True
                    )

                self.profiler.maybe_stop(cur_step)
                self.timer.tick()
                if cur_step % 50 == 0:
                    self.timer.log(tb_logger, cur_step, self.images_per_step)

                if (
                    jax.process_index() == 0 and tb_logger is not None
                    and cur_step % self.log_interval == 0
                ):
                    # ONE device->host transfer for all scalar metrics: the
                    # per-key float() fetches inside tb_vis would each pay a
                    # full link round trip (minutes/step through a remote
                    # tunnel; measurable even on a local PCIe host).
                    keys = sorted(metrics)
                    packed = np.asarray(jnp.stack(
                        [jnp.asarray(metrics[k], jnp.float32).mean()
                         for k in keys]
                    ))
                    metrics = dict(zip(keys, packed))
                    loss_kp = {
                        k.split("loss/", 1)[1]: v
                        for k, v in metrics.items()
                        if k.startswith("loss/")
                    }
                    tb_vis(
                        tb_logger, cur_step, self.tb_pair_ids,
                        self.tb_parent_ids,
                        metrics.get("loss_total"), loss_kp,
                        metrics.get("loss_disc"), outputs, batch, self.config,
                        # the schedule is built in optimizer-update-count
                        # units (every=gen_interval); index it with the
                        # update count, not the global step, so the logged
                        # LR doesn't drop gen_interval× too early
                        detector_lr=float(
                            self._lr_schedule(cur_step // self.gen_interval)
                        ),
                    )

            self.state = self.state.replace(
                epoch=self.state.epoch + 1
            )
            if epoch % self.ckpt_freq == 0 or epoch == self.num_epochs - 1:
                # collective: every process writes its addressable shards
                # (orbax commits the directory from the primary host)
                path = ckpt.save_checkpoint(self.save_dir, epoch, self.state)
                if jax.process_index() == 0:
                    print(f"checkpoint saved: {path}")
        self.profiler.close()
