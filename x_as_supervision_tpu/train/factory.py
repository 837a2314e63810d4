"""Model factory: config dict -> GanSpec (detector, discriminator, physique).

Mirrors the reference's prepare_model dispatch (reference: train.py:212-269)
minus the torch optimizers (built in train/state.py) and with the SMPL layer
loaded lazily from its converted .npz (reference loads chumpy pkls at
train.py:230-238; see tools/smpl_pkl_to_npz.py).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..models.composed import GanSpec, cal_links
from ..models.detector import build_detector
from ..models.discriminator import build_discriminator
from ..models.physique import PhysiqueMaskGenerator
from ..models import smpl as smpl_mod
from ..utils.platform import pallas_ok as _pallas_ok


def build_gan_spec(config: dict, dtype=jnp.float32) -> GanSpec:
    mp = config["model_params"]
    # remat policy: True = checkpoint whole detector forwards; "decode" =
    # checkpoint only the softmax-volume decode (keeps conv activations);
    # False = none.
    remat_cfg = mp.get("remat", True)
    # per_camera_bn: compute BN train statistics per camera instead of
    # pooled over the folded camera axis — the reference's exact semantics
    # (it loops cameras; modules/model.py:62-69). Default stays pooled
    # (the documented SyncBN generalization, models/composed.py docstring);
    # the A/B is measured in PERF.md.
    bn_groups = (
        len(mp.get("cam_id_list", [0]))
        if mp.get("per_camera_bn", False) else 1
    )
    det_params = dict(mp["detector_params"])
    if bn_groups > 1:
        det_params["bn_groups"] = bn_groups
    detector = build_detector(
        det_params, dtype=dtype,
        remat_decode=(remat_cfg == "decode"),
    )

    discriminator = None
    if "smpl_disc_params" in mp:
        # Discriminator graph uses the un-extended skeleton edges
        # (reference: modules/model.py:202-210).
        parents, children = cal_links(
            mp["parent_ids"],
            line_select_ids=mp.get("line_select_ids"),
            use_root=False,
            extension=False,
        )
        discriminator = build_discriminator(
            mp["smpl_disc_params"], parents, children
        )

    physique = None
    if "physique_mask_generator_params" in mp:
        pp = mp["physique_mask_generator_params"]
        physique = PhysiqueMaskGenerator(
            num_features=tuple(pp["layers"]),
            dtype=dtype,
            use_pallas=bool(pp.get("pallas", False)) and _pallas_ok(),
            bn_groups=bn_groups,
        )

    spec = GanSpec.from_config(mp, detector, discriminator, physique)

    # Device-side feed normalization for uint8-shipped batches
    # (dataset_params.uint8_feed; data/pipeline.py + composed.py
    # preprocess_batch). Wired whenever dataiter stats exist — float32
    # batches pass through preprocess_batch untouched, so this is safe for
    # the host-normalized default path too.
    dp = config.get("dataset_params", {})
    di = dp.get("dataiter", {})
    import dataclasses

    # feed_rm_bg is wired independently of the normalization stats: a
    # uint8 feed defers rm_bg to the device even when dataiter mean/std
    # are null, and the Evaluator sets it unconditionally — the step must
    # agree. (preprocess_batch only applies it to was-uint8 images, so
    # host-normalized float feeds are never double-masked.)
    updates: dict = {"feed_rm_bg": bool(dp.get("rm_bg", False))}
    if di.get("mean") is not None and di.get("std") is not None:
        updates.update(
            feed_mean=tuple(float(v) for v in di["mean"]),
            feed_std=tuple(float(v) for v in di["std"]),
        )
    return dataclasses.replace(spec, **updates)


def load_smpl_assets(config: dict):
    """(SmplModel, h36m_regressor) when smpl_layer_params is configured and
    the converted assets exist; (None, None) otherwise. The in-repo training
    path only touches SMPL through the pre-rendered pseudo stream (reference
    SURVEY.md §3.5), so training proceeds without the files."""
    mp = config["model_params"]
    if "smpl_layer_params" not in mp:
        return None, None
    root = mp["smpl_layer_params"]["model_path"]
    npz = os.path.join(root, "smpl_neutral.npz")
    reg = os.path.join(root, "J_regressor_h36m.npy")
    model = smpl_mod.load_smpl_npz(npz) if os.path.exists(npz) else None
    regressor = (
        jnp.asarray(np.load(reg), jnp.float32) if os.path.exists(reg) else None
    )
    return model, regressor
