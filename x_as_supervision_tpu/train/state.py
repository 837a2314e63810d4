"""Train state + the fused GAN train step.

One jitted function performs the whole reference iteration (reference:
train.py:160-194): optional discriminator update, then optional generator
update (detector + physique), with:

  * two Adam(b1=0.5) optimizers on MultiStepLR-equivalent schedules
    (reference: train.py:78-84,257-262);
  * BatchNorm statistics threaded through every detector forward in
    reference order (SyncBN parity under GSPMD);
  * the reference's leftover-gradient quirk reproduced exactly: the
    generator's smpl_gen loss back-propagates into the discriminator's
    parameters, and torch's `.grad` buffers carry that gradient into the
    *next* discriminator step (zero_grad only runs after the disc update;
    reference: train.py:164-190 + modules/model.py:128). We carry it in
    `pending_disc_grads`.

Update cadence (`update_interval`, reference train.py:94-99) is static per
config, so the host picks between jitted step variants; no traced control
flow is needed.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models.composed import (
    GanSpec,
    discriminator_forward,
    generator_forward,
    preprocess_batch,
)


@flax.struct.dataclass
class TrainState:
    # Generator side: detector + optional physique net (one optimizer, like
    # the reference's joint param list; reference train.py:252-258).
    det_params: Any
    det_stats: Any
    phys_params: Any
    phys_stats: Any
    # Discriminator side.
    disc_params: Any
    opt_det: Any
    opt_disc: Any
    pending_disc_grads: Any
    step: jax.Array  # int32 global step
    epoch: jax.Array  # int32, bumped by the trainer loop


def multistep_schedule(
    base_lr: float, milestones, steps_per_epoch: int, gamma: float = 0.1,
    every: int = 1,
):
    """MultiStepLR(gamma) in step units. Reference: train.py:78-84.

    `every`: the optimizer's update cadence in global steps. The optax
    count only advances when the optimizer actually updates, while torch's
    MultiStepLR steps per EPOCH regardless of cadence — so a milestone at
    epoch m corresponds to update count ceil(m * steps_per_epoch / every),
    not m * steps_per_epoch. (Caught by the trajectory parity harness,
    tests/test_reference_parity_trainer.py, with update_interval=2.)
    """
    if base_lr == 0.0:
        return optax.constant_schedule(0.0)
    boundaries = {
        -(-int(m) * steps_per_epoch // every): gamma
        for m in (milestones or [])
    }
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_optimizers(train_params: dict, steps_per_epoch: int,
                    disc_every: int = 1, gen_every: int = 1):
    """Two Adam(0.5, 0.999) chains. Reference: train.py:257-262.

    disc_every / gen_every: the update_interval cadence (reference
    train.py:94-99), needed to time the LR milestones in each chain's own
    update-count units (see multistep_schedule)."""
    milestones = train_params.get("epoch_milestones", [])
    opt_det = optax.adam(
        multistep_schedule(
            float(train_params["lr_kp_detector"]), milestones,
            steps_per_epoch, every=gen_every,
        ),
        b1=0.5,
        b2=0.999,
    )
    opt_disc = optax.adam(
        multistep_schedule(
            float(train_params.get("lr_discriminator", 0.0)),
            milestones,
            steps_per_epoch,
            every=disc_every,
        ),
        b1=0.5,
        b2=0.999,
    )
    return opt_det, opt_disc


def init_train_state(
    spec: GanSpec,
    rng: jax.Array,
    sample_batch: dict,
    opt_det,
    opt_disc,
) -> TrainState:
    """Initialize all module variables + optimizer states from one batch."""
    k_det, k_phys, k_disc = jax.random.split(rng, 3)
    sample_batch = preprocess_batch(sample_batch, spec)  # uint8 feeds
    cam0 = "cam_mono" if "cam_mono_img" in sample_batch else (
        f"cam_{spec.cam_id_list[0]}"
    )
    img = sample_batch[f"{cam0}_img"]

    det_vars = spec.detector.init(k_det, img, train=False)
    det_params = det_vars["params"]
    det_stats = det_vars.get("batch_stats", {})

    if spec.physique is not None:
        side = img.shape[1]
        phys_vars = spec.physique.init(
            k_phys, jnp.zeros((1, side, side, 1)), train=False
        )
        phys_params = phys_vars["params"]
        phys_stats = phys_vars.get("batch_stats", {})
    else:
        phys_params, phys_stats = {}, {}

    if spec.discriminator is not None:
        dummy_kps = jnp.zeros(
            (1, spec.discriminator.num_nodes, spec.disc_sup_dim)
        )
        disc_params = spec.discriminator.init(
            k_disc, dummy_kps, train=False
        )["params"]
    else:
        disc_params = {}

    gen_params = {"detector": det_params, "physique": phys_params}
    return TrainState(
        det_params=det_params,
        det_stats=det_stats,
        phys_params=phys_params,
        phys_stats=phys_stats,
        disc_params=disc_params,
        opt_det=opt_det.init(gen_params),
        opt_disc=opt_disc.init(disc_params),
        pending_disc_grads=jax.tree.map(jnp.zeros_like, disc_params),
        step=jnp.asarray(0, jnp.int32),
        epoch=jnp.asarray(0, jnp.int32),
    )


def make_train_step(spec: GanSpec, opt_det, opt_disc) -> Callable:
    """Returns step(state, batch, rng, do_disc, do_gen) -> (state, metrics).

    do_disc / do_gen are static (cadence is config-static); metrics carries
    scalar losses plus the reference's visualization outputs.
    """

    has_disc = spec.discriminator is not None
    # Fused path: when both updates run in the same iteration, the
    # disc phase reuses the gen phase's detector forward (see
    # models/composed.py discriminator_forward docstring). The gen losses
    # then see the pre-update discriminator parameters — a one-iteration
    # lag on the smpl_gen term only (whose detector gradient is zero in
    # all shipped configs due to the reference's detach).
    fuse = getattr(spec, "fuse_gan_step", True) and has_disc

    def _disc_update(state: TrainState, batch, rng):
        def loss_fn(disc_params):
            det_vars = {
                "params": state.det_params,
                "batch_stats": state.det_stats,
            }
            loss, outputs, det_vars2 = discriminator_forward(
                spec, disc_params, det_vars, batch, rng, train=True
            )
            return loss, (outputs, det_vars2["batch_stats"])

        (loss, (outputs, det_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.disc_params)
        # Fold in the generator-side leftover gradient (torch .grad carry).
        grads = jax.tree.map(
            jnp.add, grads, state.pending_disc_grads
        )
        updates, opt_state = opt_disc.update(
            grads, state.opt_disc, state.disc_params
        )
        disc_params = optax.apply_updates(state.disc_params, updates)
        state = state.replace(
            disc_params=disc_params,
            opt_disc=opt_state,
            det_stats=det_stats,
            pending_disc_grads=jax.tree.map(
                jnp.zeros_like, state.pending_disc_grads
            ),
        )
        return state, loss, outputs

    def _gen_update(state: TrainState, batch, rng):
        def loss_fn(gen_params, disc_params):
            det_vars = {
                "params": gen_params["detector"],
                "batch_stats": state.det_stats,
            }
            phys_vars = (
                {
                    "params": gen_params["physique"],
                    "batch_stats": state.phys_stats,
                }
                if spec.physique is not None
                else None
            )
            losses, outputs, det_vars2, phys_vars2 = generator_forward(
                spec, det_vars, phys_vars, disc_params if has_disc else None,
                batch, rng, train=True,
            )
            total = jnp.asarray(0.0)
            for v in losses.values():
                total = total + jnp.mean(v)
            aux = (
                losses,
                outputs,
                det_vars2["batch_stats"],
                phys_vars2["batch_stats"] if phys_vars2 else {},
            )
            return total, aux

        gen_params = {
            "detector": state.det_params,
            "physique": state.phys_params,
        }
        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
        (total, aux), (g_gen, g_disc) = grad_fn(gen_params, state.disc_params)
        losses, outputs, det_stats, phys_stats = aux

        updates, opt_state = opt_det.update(g_gen, state.opt_det, gen_params)
        new_gen = optax.apply_updates(gen_params, updates)
        state = state.replace(
            det_params=new_gen["detector"],
            phys_params=new_gen["physique"],
            opt_det=opt_state,
            det_stats=det_stats,
            phys_stats=phys_stats,
            pending_disc_grads=jax.tree.map(
                jnp.add, state.pending_disc_grads, g_disc
            ),
        )
        return state, total, losses, outputs

    def _fused_update(state: TrainState, batch, k_disc, k_gen, with_outputs):
        metrics: dict[str, Any] = {}
        outputs: dict[str, Any] = {}

        def gen_loss_fn(gen_params, disc_params):
            det_vars = {
                "params": gen_params["detector"],
                "batch_stats": state.det_stats,
            }
            phys_vars = (
                {
                    "params": gen_params["physique"],
                    "batch_stats": state.phys_stats,
                }
                if spec.physique is not None
                else None
            )
            losses, gouts, det_vars2, phys_vars2, decode = generator_forward(
                spec, det_vars, phys_vars, disc_params, batch, k_gen,
                train=True, return_cam_decode=True,
            )
            total = jnp.asarray(0.0)
            for v in losses.values():
                total = total + jnp.mean(v)
            aux = (
                losses, gouts, det_vars2["batch_stats"],
                phys_vars2["batch_stats"] if phys_vars2 else {},
                jax.lax.stop_gradient(decode),
            )
            return total, aux

        gen_params = {
            "detector": state.det_params,
            "physique": state.phys_params,
        }
        grad_fn = jax.value_and_grad(gen_loss_fn, argnums=(0, 1), has_aux=True)
        (total, aux), (g_gen, g_disc_from_gen) = grad_fn(
            gen_params, state.disc_params
        )
        losses, gouts, det_stats, phys_stats, decode = aux

        # Discriminator update (reference order: disc before gen, using the
        # same-forward predictions).
        def disc_loss_fn(disc_params):
            det_vars = {
                "params": state.det_params,
                "batch_stats": state.det_stats,
            }
            loss, douts, _ = discriminator_forward(
                spec, disc_params, det_vars, batch, k_disc, train=True,
                precomputed_decode=decode,
            )
            return loss, douts

        (loss_disc, douts), grads_disc = jax.value_and_grad(
            disc_loss_fn, has_aux=True
        )(state.disc_params)
        grads_disc = jax.tree.map(
            jnp.add, grads_disc, state.pending_disc_grads
        )
        d_updates, d_opt = opt_disc.update(
            grads_disc, state.opt_disc, state.disc_params
        )
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        g_updates, g_opt = opt_det.update(g_gen, state.opt_det, gen_params)
        new_gen = optax.apply_updates(gen_params, g_updates)

        state = state.replace(
            det_params=new_gen["detector"],
            phys_params=new_gen["physique"],
            disc_params=disc_params,
            opt_det=g_opt,
            opt_disc=d_opt,
            det_stats=det_stats,
            phys_stats=phys_stats,
            pending_disc_grads=g_disc_from_gen,
        )
        metrics["loss_disc"] = loss_disc
        metrics["loss_total"] = total
        for name, val in losses.items():
            metrics[f"loss/{name}"] = jnp.mean(val)
        if with_outputs:
            outputs.update(douts)
            outputs.update(gouts)
        return state, metrics, outputs

    @functools.partial(
        jax.jit,
        static_argnames=("do_disc", "do_gen", "with_outputs"),
        donate_argnums=(0,),
    )
    def step(state: TrainState, batch: dict, rng: jax.Array,
             do_disc: bool = True, do_gen: bool = True,
             with_outputs: bool = True):
        # with_outputs=False drops the visualization outputs from the
        # compiled program: they are only consumed by the image panels every
        # 50 steps, and returning them every step costs real host<->device
        # bandwidth.
        metrics: dict[str, Any] = {}
        outputs: dict[str, Any] = {}
        k_disc, k_gen = jax.random.split(rng)

        # uint8-shipped tensors normalize on device (fused into the step;
        # float32 feeds pass through untouched)
        batch = preprocess_batch(batch, spec)

        if do_disc and do_gen and fuse:
            state, metrics, outputs = _fused_update(
                state, batch, k_disc, k_gen, with_outputs
            )
        else:
            if do_disc and has_disc:
                state, loss_disc, disc_out = _disc_update(state, batch, k_disc)
                metrics["loss_disc"] = loss_disc
                if with_outputs:
                    outputs.update(disc_out)

            if do_gen:
                state, total, losses, gen_out = _gen_update(state, batch, k_gen)
                metrics["loss_total"] = total
                for name, val in losses.items():
                    metrics[f"loss/{name}"] = jnp.mean(val)
                if with_outputs:
                    outputs.update(gen_out)

        state = state.replace(step=state.step + 1)
        return state, metrics, outputs

    return step
