"""Flip/rotation augmentation parity against the reference data pipeline.

The one previously test-dead pipeline branch (VERDICT r3 weak #2): the
same image/mask/joints pushed through the reference's
`generate_patch_sample_data` (reference dataloader.py:17-91 +
affine.py:56-114 + augment.py:18-26) with flip and ±30° rotation draws
must agree with `data/pipeline.py:generate_patch_sample_data` on the image
patch, the joints, and the integral label — the SURVEY §7.4 #1
"coordinate-convention parity" corner.

The mask patch carries ONE documented deviation: the reference warps the
UNFLIPPED mask with the flipped-frame trans (dataloader.py:63), leaving
the mask misaligned with the image whenever flip aug fires (latent — all
shipped reference configs disable flip aug). This build mirrors the mask
source like the image. Both facts are pinned below: our mask equals the
reference's own image-warp machinery applied to the mask, and the
reference's raw mask provably disagrees with its own image patch under
flip.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
torch = pytest.importorskip("torch")

from refshim import load_reference

from x_as_supervision_tpu.data import pipeline as P

PATCH = 64


class _Smp:
    """Attribute-style patch_sample (the reference uses easydict)."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


@pytest.fixture(scope="module")
def sample_on_disk(tmp_path_factory):
    """Asymmetric image + blob mask at reference-layout paths (the mask
    path rewrite keys on 'hm36/images'; reference dataloader.py:31-36)."""
    base = tmp_path_factory.mktemp("aug")
    img_dir = base / "hm36" / "images" / "s_01_act_02_subact_01_ca_01"
    mask_dir = base / "sam_masks" / "hm36" / "s_01_act_02_subact_01_ca_01"
    img_dir.mkdir(parents=True)
    mask_dir.mkdir(parents=True)

    rng = np.random.default_rng(3)
    h = w = 200
    img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    # smooth asymmetric structure so interpolation differences show up
    yy, xx = np.mgrid[0:h, 0:w]
    img[..., 0] = (xx * 255 // w).astype(np.uint8)
    img[..., 1] = (yy * 255 // h).astype(np.uint8)
    cv2.circle(img, (60, 90), 25, (255, 40, 180), -1)
    mask = np.zeros((h, w), np.uint8)
    cv2.ellipse(mask, (95, 100), (38, 60), 20, 0, 360, 255, -1)

    img_path = str(img_dir / "s_01_act_02_subact_01_ca_01_000001.jpg")
    cv2.imwrite(img_path, img)
    cv2.imwrite(
        img_path.replace("hm36/images", "sam_masks/hm36").replace(
            "jpg", "png"
        ),
        mask,
    )

    joints = np.stack(
        [
            rng.uniform(40, 160, 18),
            rng.uniform(40, 160, 18),
            rng.uniform(-300, 300, 18),
        ],
        axis=1,
    )
    flip_pairs = np.array(
        [[1, 4], [2, 5], [3, 6], [14, 11], [15, 12], [16, 13]]
    )
    return dict(
        image=img_path, joints=joints, flip_pairs=flip_pairs,
        center_x=95.0, center_y=100.0, width=130.0, height=130.0,
    )


AUG_CASES = [
    # (do_flip, rot_draw, scale, sample_rot)
    (False, 30.0, 1.0, 0.0),
    (False, -30.0, 0.85, 0.0),
    (True, 0.0, 1.0, 0.0),
    (True, 30.0, 1.15, 0.0),
    (True, -30.0, 0.9, 0.0),
    (True, 30.0, 1.0, 15.0),  # nonzero SAMPLE rot: flip negates it
    (False, -30.0, 1.1, 15.0),
]


def _run_both(sample, do_flip, rot, scale, smp_rot, monkeypatch,
              color=(1.0, 1.0, 1.0)):
    ref = load_reference()
    draw = (scale, rot, do_flip, list(color))
    monkeypatch.setattr(ref.dataloader, "do_augmentation",
                        lambda cfg: draw)
    monkeypatch.setattr(P, "do_augmentation", lambda cfg, rng: draw)

    mk = lambda: _Smp(  # noqa: E731 - fresh per side (reference mutates)
        image=sample["image"],
        center_x=sample["center_x"], center_y=sample["center_y"],
        width=sample["width"], height=sample["height"], rot=smp_rot,
        joints_3d=sample["joints"].copy(),
        joints_3d_vis=np.ones_like(sample["joints"]),
        flip_pairs=sample["flip_pairs"].copy(),
        parent_ids=np.arange(18),
    )
    mean = [0.2, 0.3, 0.4]
    std = [255.0, 254.0, 253.0]
    ref_img, ref_mask, ref_label, ref_label_w, ref_joints, ref_trans = (
        ref.dataloader.generate_patch_sample_data(
            mk(), PATCH, PATCH, 2000, 2000, mean, std, True,
            {}, ref.integral.get_label_func(),
        )
    )
    our_img, our_mask, our_joints, our_trans = P.generate_patch_sample_data(
        mk(), PATCH, PATCH, 2000, 2000, mean, std, True, {},
        np.random.default_rng(0),
    )
    return (ref, (ref_img, ref_mask, ref_label, ref_joints, ref_trans),
            (our_img, our_mask, our_joints, our_trans))


@pytest.mark.parametrize("do_flip,rot,scale,smp_rot", AUG_CASES)
def test_augmented_patch_joints_label_parity(
    sample_on_disk, do_flip, rot, scale, smp_rot, monkeypatch
):
    ref, r, o = _run_both(sample_on_disk, do_flip, rot, scale, smp_rot,
                          monkeypatch)
    ref_img, ref_mask, ref_label, ref_joints, ref_trans = r
    our_img, our_mask, our_joints, our_trans = o

    # affine agrees (we solve the 3-point system linearly; the reference
    # calls cv2.getAffineTransform on float32 points)
    np.testing.assert_allclose(our_trans, ref_trans, atol=1e-4)

    # image patch: ours is HWC RGB, reference CHW RGB (convert_cvimg_to_
    # tensor); warps may differ by 1 intensity step where the float32
    # trans rounding moves an interpolation weight across cv2's
    # fixed-point quantization
    ours_chw = np.transpose(our_img, (2, 0, 1))
    diff = np.abs(ours_chw - ref_img)
    assert diff.max() <= 1.0 / 253.0 + 1e-7, diff.max()
    assert (diff > 1e-7).mean() < 0.02

    # joints: flip pair swap + x-mirror + affine + depth scale (1e-4 px:
    # the reference's getAffineTransform consumes float32 points, we solve
    # the same 3-point system in float64)
    np.testing.assert_allclose(our_joints, ref_joints, atol=1e-4)

    # integral label from the joints (reference integral.py:2-11)
    lbl, _ = ref.integral.generate_joint_location_label(
        PATCH, PATCH, our_joints.copy(), np.ones_like(our_joints)
    )
    np.testing.assert_allclose(lbl, ref_label, atol=1e-5)

    # mask: pinned against the reference's OWN image-flip machinery (3-ch
    # replicated mask through gen_patch_image_from_box_cv — mirrors the
    # source before warping, exactly like the image patch)
    cvmask = cv2.imread(
        sample_on_disk["image"].replace(
            "hm36/images", "sam_masks/hm36"
        ).replace("jpg", "png"),
        cv2.IMREAD_GRAYSCALE,
    )
    rot_eff = ref.affine.norm_rot_angle(
        rot + (-smp_rot if do_flip else smp_rot)
    )
    aligned, _ = ref.affine.gen_patch_image_from_box_cv(
        np.repeat(cvmask[..., None], 3, axis=2),
        sample_on_disk["center_x"], sample_on_disk["center_y"],
        sample_on_disk["width"], sample_on_disk["height"],
        PATCH, PATCH, do_flip, scale, rot_eff,
    )
    assert np.abs(our_mask[..., 0] - aligned[..., 0]).max() <= 1


def test_reference_mask_misalignment_under_flip(sample_on_disk, monkeypatch):
    """Documents the latent reference quirk this build intentionally fixes:
    under flip the reference's mask patch disagrees with a mask warped the
    way the reference warps the IMAGE, while without flip they agree."""
    for do_flip, expect_aligned in ((False, True), (True, False)):
        ref, r, o = _run_both(sample_on_disk, do_flip, 0.0, 1.0, 0.0,
                              monkeypatch)
        _, ref_mask, _, _, _ = r
        _, our_mask, _, _ = o
        agree = np.abs(ref_mask[0] - our_mask[..., 0]).max() <= 1
        assert agree == expect_aligned, (do_flip, expect_aligned)


def test_color_scale_parity(sample_on_disk, monkeypatch):
    """Per-channel color scaling order (clip before normalize) matches
    (reference dataloader.py:72-75)."""
    ref, r, o = _run_both(sample_on_disk, False, 0.0, 1.0, 0.0, monkeypatch,
                          color=(1.15, 0.85, 1.05))
    ref_img = r[0]
    our_img = o[0]
    np.testing.assert_allclose(
        np.transpose(our_img, (2, 0, 1)), ref_img, atol=1e-5
    )
