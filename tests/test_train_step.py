import numpy as np
import jax
import jax.numpy as jnp

from x_as_supervision_tpu.data.synthetic import SyntheticPoseDataset
from x_as_supervision_tpu.parallel import mesh as M
from x_as_supervision_tpu.train.factory import build_gan_spec
from x_as_supervision_tpu.train.state import (
    init_train_state,
    make_optimizers,
    make_train_step,
)

TINY_CONFIG = {
    "dataset_params": {"cam_id_list": [0, 1]},
    "model_params": {
        "cam_id_list": [0, 1],
        "detector_params": {
            "name": "resnet_multi",
            "num_kp": 18,
            "depth_dim": 8,
            "num_hypo": 2,
            "neighbor_size": 3,
            "num_layers": 18,
        },
        "smpl_disc_params": {
            "name": "res_sage_gcn_decouple",
            "input_dim": 16,
            "hidden_dim": 16,
            "output_dim": 16,
            "num_node": 18,
            "disc_sup_dim": 3,
            "num_layers": 1,
            "use_self_loop": True,
            "use_pe": True,
        },
        "physique_mask_generator_params": {"layers": [4, 8]},
        "parent_ids": [0, 0, 1, 2, 0, 4, 5, 0, 17, 8, 9, 17, 11, 12, 17, 14, 15, 7],
        "child_ids": list(range(18)),
        "flip_pairs": [[1, 4], [2, 5], [3, 6], [14, 11], [15, 12], [16, 13]],
        "line_select_ids": list(range(17)),
        "body_width": 3.0,
        "loss_config": {
            "recons_loss": {"use_dis_map": False, "weight": 0.02},
            "physique_recons_loss": {"use_dis_map": True, "weight": 0.02},
            "smpl_pseudo_img_loss": {"weight": 3.0},
            "symmetry_loss": {"weight": {"bone": 0.1, "kp": 0.1, "kp_2d": 0.0}},
            "smpl_disc_loss": {"weight": 0.5, "update_interval": 1},
            "smpl_gen_loss": {"weight": 0.5},
        },
    },
    "train_params": {
        "num_epochs": 1,
        "batch_size": 8,
        "epoch_milestones": [40],
        "lr_kp_detector": 1.0e-4,
        "lr_discriminator": 1.0e-4,
        "checkpoint_freq": 2,
        "patch_width": 64,
        "patch_height": 64,
        "rect_3d_width": 2000,
        "rect_3d_height": 2000,
    },
}


def test_fused_train_step_runs_on_8_device_mesh():
    assert jax.device_count() == 8

    spec = build_gan_spec(TINY_CONFIG)
    ds = SyntheticPoseDataset(
        num_samples=8, cam_id_list=(0, 1), patch_size=64
    )
    batch = ds.device_batch(0, 8)

    opt_det, opt_disc = make_optimizers(TINY_CONFIG["train_params"], 10)
    state = init_train_state(
        spec, jax.random.PRNGKey(0), batch, opt_det, opt_disc
    )

    mesh = M.make_mesh()
    state = M.replicate_state(state, mesh)
    sharded = M.shard_batch(batch, mesh)

    step = make_train_step(spec, opt_det, opt_disc)
    # the jitted step donates the input state; snapshot what we compare
    det_params_before = jax.device_get(state.det_params)
    state2, metrics, outputs = step(
        state, sharded, jax.random.PRNGKey(1), do_disc=True, do_gen=True
    )

    for name, val in metrics.items():
        assert np.isfinite(float(val)), name
    assert "loss_disc" in metrics and "loss_total" in metrics
    assert "loss/smpl_pseudo_img" in metrics
    assert "loss/reconstruction" in metrics
    assert "loss/physique_recons" in metrics
    assert "loss/symmetry" in metrics
    assert "loss/smpl_gen" in metrics
    assert int(state2.step) == 1

    # params actually moved
    delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(
            lambda a, b: float(jnp.abs(jnp.asarray(a) - b).sum()),
            det_params_before,
            jax.device_get(state2.det_params),
        ),
    )
    assert delta > 0

    # pending disc grads captured for the torch-parity carry
    pend = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(
            lambda g: float(jnp.abs(g).sum()), state2.pending_disc_grads
        ),
    )
    assert np.isfinite(pend)

    # second step consumes pending grads and keeps everything finite
    state3, metrics3, _ = step(
        state2, sharded, jax.random.PRNGKey(2), do_disc=True, do_gen=True
    )
    assert np.isfinite(float(metrics3["loss_total"]))
    assert int(state3.step) == 2


def test_gen_only_step_variant():
    spec = build_gan_spec(TINY_CONFIG)
    ds = SyntheticPoseDataset(num_samples=4, cam_id_list=(0, 1), patch_size=64)
    batch = ds.device_batch(0, 4)
    opt_det, opt_disc = make_optimizers(TINY_CONFIG["train_params"], 10)
    state = init_train_state(
        spec, jax.random.PRNGKey(0), batch, opt_det, opt_disc
    )
    step = make_train_step(spec, opt_det, opt_disc)
    disc_before = jax.device_get(state.disc_params)
    state2, metrics, _ = step(
        state, batch, jax.random.PRNGKey(1), do_disc=False, do_gen=True
    )
    assert "loss_disc" not in metrics
    # disc params untouched by a gen-only step
    same = jax.tree.all(
        jax.tree.map(
            lambda a, b: bool((jnp.asarray(a) == b).all()),
            disc_before,
            jax.device_get(state2.disc_params),
        )
    )
    assert same


def test_single_hypothesis_detector_step():
    """The 'resnet' (single-hypothesis) detector through the fused step."""
    import copy

    cfg = copy.deepcopy(TINY_CONFIG)
    cfg["model_params"]["detector_params"] = {
        "name": "resnet",
        "num_kp": 18,
        "depth_dim": 8,
        "num_layers": 18,
    }
    spec = build_gan_spec(cfg)
    ds = SyntheticPoseDataset(num_samples=4, cam_id_list=(0, 1), patch_size=64)
    batch = ds.device_batch(0, 4)
    opt_det, opt_disc = make_optimizers(cfg["train_params"], 10)
    state = init_train_state(
        spec, jax.random.PRNGKey(0), batch, opt_det, opt_disc
    )
    step = make_train_step(spec, opt_det, opt_disc)
    state2, metrics, _ = step(
        state, batch, jax.random.PRNGKey(1), do_disc=True, do_gen=True
    )
    assert np.isfinite(float(metrics["loss_total"]))
    assert np.isfinite(float(metrics["loss_disc"]))


def test_remat_modes_numerically_identical():
    """'none' / 'head_decode' / 'full' rematerialization must be pure
    memory/scheduling choices: identical loss values and gradients."""
    import numpy as np
    from x_as_supervision_tpu.models import composed as C

    ds = SyntheticPoseDataset(num_samples=4, cam_id_list=(0, 1),
                              patch_size=64)
    batch = {k: jnp.asarray(v) for k, v in ds.device_batch(0, 2).items()}

    results = {}
    for mode in ("none", "head_decode", "full", "pseudo"):
        cfg = {k: (dict(v) if isinstance(v, dict) else v)
               for k, v in TINY_CONFIG.items()}
        cfg["model_params"] = dict(cfg["model_params"], remat=mode)
        spec = build_gan_spec(cfg)
        det_vars = spec.detector.init(jax.random.PRNGKey(0),
                                      batch["cam_0_img"])
        phys_vars = spec.physique.init(jax.random.PRNGKey(1),
                                       batch["cam_0_mask"])
        disc_params = spec.discriminator.init(
            jax.random.PRNGKey(2), jnp.zeros((1, 18, 3))
        )["params"]

        def lossfn(p):
            losses, _, _, _ = C.generator_forward(
                spec, {**det_vars, "params": p}, phys_vars, disc_params,
                batch, jax.random.PRNGKey(3), train=True,
            )
            return sum(jnp.asarray(v) for v in losses.values())

        v, g = jax.value_and_grad(lossfn)(det_vars["params"])
        results[mode] = (float(v), float(jax.tree.leaves(g)[0].sum()))

    ref = results["none"]
    for mode in ("head_decode", "full"):
        np.testing.assert_allclose(results[mode][0], ref[0], rtol=1e-6)
        np.testing.assert_allclose(results[mode][1], ref[1], rtol=1e-5)


def test_hypo0_weight_pseudo_pull():
    """The opt-in confident-mode knob (smpl_pseudo_img_loss.hypo0_weight)
    adds exactly `w * per_hypo[0]` to the pseudo term: with num_hypo=1
    (per_hypo[0] IS the min) a pseudo-only loss must scale by (1 + w);
    with the knob absent the loss is bit-identical to the baseline."""
    import copy

    from x_as_supervision_tpu.models import composed as C

    ds = SyntheticPoseDataset(num_samples=4, cam_id_list=(0, 1),
                              patch_size=64)
    batch = {k: jnp.asarray(v) for k, v in ds.device_batch(0, 2).items()}

    def pseudo_loss(h0w):
        cfg = copy.deepcopy(TINY_CONFIG)
        cfg["model_params"]["detector_params"]["num_hypo"] = 1
        lc = {"smpl_pseudo_img_loss": {"weight": 3.0}}
        if h0w is not None:
            lc["smpl_pseudo_img_loss"]["hypo0_weight"] = h0w
        cfg["model_params"]["loss_config"] = lc
        spec = build_gan_spec(cfg)
        det_vars = spec.detector.init(jax.random.PRNGKey(0),
                                      batch["cam_0_img"])
        phys_vars = spec.physique.init(jax.random.PRNGKey(1),
                                       batch["cam_0_mask"])
        losses, _, _, _ = C.generator_forward(
            spec, det_vars, phys_vars, None, batch, jax.random.PRNGKey(3),
            train=True,
        )
        assert set(losses) == {"smpl_pseudo_img"}
        return float(jnp.asarray(losses["smpl_pseudo_img"]))

    base = pseudo_loss(None)
    assert pseudo_loss(0.0) == base
    np.testing.assert_allclose(pseudo_loss(0.5), 1.5 * base, rtol=1e-6)
