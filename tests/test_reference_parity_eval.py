"""Numerical parity vs the reference torch implementation (part 3: eval).

  * metrics: MPJPE family (none/scale/procrustes), 3DPCK, 3DAUC
    (reference metrics.py)
  * eval utils: switch_points, per_act_mse, cal_per_class_error
    (reference eval_utils.py:7-65)
  * the FULL eval loop: the reference Eval.eval (eval.py:110-204) driven on
    identical stubbed detector outputs and the same synthetic batch as our
    Evaluator, comparing every accumulated table (2D, 3D x 3 alignments x
    per-action buckets, triangulated 3D, ambiguity ratio) and the written
    eval_result.txt files line by line.
"""

import copy
import os

import numpy as np
import pytest
import jax.numpy as jnp
import jax

torch = pytest.importorskip("torch")

import refshim  # noqa: E402

from x_as_supervision_tpu.data.synthetic import SyntheticPoseDataset  # noqa: E402
from x_as_supervision_tpu.train import eval_utils as EU  # noqa: E402
from x_as_supervision_tpu.train import metrics as MET  # noqa: E402
from x_as_supervision_tpu.train.evaluator import Evaluator  # noqa: E402

REF = refshim.load_reference()
RNG = np.random.default_rng(20260818)


def t(x):
    return torch.tensor(np.asarray(x))


def n(x):
    return np.asarray(x.detach().numpy() if hasattr(x, "detach") else x)


# --- metrics ------------------------------------------------------------------


@pytest.mark.parametrize("alignment", ["none", "scale", "procrustes"])
def test_keypoint_mpjpe_parity(alignment):
    pred = (RNG.normal(size=(6, 18, 3)) * 200).astype(np.float64)
    gt = pred + RNG.normal(size=pred.shape) * 30
    mask = np.ones(pred.shape[:2], dtype=bool)
    ref = REF.metrics.keypoint_mpjpe(t(pred), t(gt), mask, alignment=alignment)
    ours = MET.keypoint_mpjpe(pred, gt, mask, alignment=alignment)
    np.testing.assert_allclose(ours, n(ref), rtol=1e-6, atol=1e-8)


def test_pck_auc_parity():
    pred = (RNG.normal(size=(6, 18, 3)) * 0.3).astype(np.float64)
    gt = pred + RNG.normal(size=pred.shape) * 0.08
    mask = np.ones(pred.shape[:2], dtype=bool)
    ref_pck = REF.metrics.keypoint_3d_pck(t(pred), t(gt), mask)
    np.testing.assert_allclose(
        MET.keypoint_3d_pck(pred, gt, mask), n(ref_pck), rtol=1e-6
    )
    ref_auc = REF.metrics.keypoint_3d_auc(t(pred), t(gt), mask)
    np.testing.assert_allclose(
        MET.keypoint_3d_auc(pred, gt, mask), float(ref_auc), rtol=1e-6
    )


def test_switch_points_and_per_act_mse_parity():
    pts = RNG.normal(size=(5, 18, 3)).astype(np.float32)
    gt = RNG.normal(size=(5, 18, 3)).astype(np.float32)
    for switch_all in (False, True):
        ref_pts, ref_mask = REF.eval_utils.switch_points(
            t(pts), t(gt), switch_all=switch_all
        )
        our_pts, our_mask = EU.switch_points(pts, gt, switch_all=switch_all)
        np.testing.assert_allclose(n(our_pts), n(ref_pts), rtol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(our_mask), n(ref_mask).astype(bool)
        )

    ref_err = REF.eval_utils.per_act_mse(t(pts[..., :2]), t(gt[..., :2]))
    np.testing.assert_allclose(
        EU.per_act_mse(pts[..., :2], gt[..., :2]), n(ref_err), rtol=1e-5
    )


def test_cal_per_class_error_parity():
    rec_ref = copy.deepcopy(REF.eval.act)
    cnt_ref = copy.deepcopy(REF.eval.act)
    rec_ours = EU.new_act_table()
    cnt_ours = EU.new_act_table()
    for name in rec_ref:
        v = float(RNG.uniform(10, 80))
        c = float(RNG.integers(1, 20))
        rec_ref[name] = v
        cnt_ref[name] = c
        rec_ours[name] = v
        cnt_ours[name] = c
    ref_full, ref_sel = REF.eval_utils.cal_per_class_error(rec_ref, cnt_ref)
    our_full, our_sel = EU.cal_per_class_error(rec_ours, cnt_ours)
    np.testing.assert_allclose(our_full, ref_full, rtol=1e-9)
    np.testing.assert_allclose(our_sel, ref_sel, rtol=1e-9)


# --- full eval loop -----------------------------------------------------------


class _ListLoader(list):
    """Minimal stand-in for the reference DataLoader (len + iteration)."""


def _fresh_ref_tables():
    act = REF.eval.act
    mk3 = lambda: {
        "mpjpe": copy.deepcopy(act),
        "n-mpjpe": copy.deepcopy(act),
        "p-mpjpe": copy.deepcopy(act),
    }
    return (
        copy.deepcopy(act), copy.deepcopy(act), mk3(), mk3(), mk3(), mk3(),
    )


class _RefStubDetector(torch.nn.Module):
    """Returns fixed precomputed predictions — the detector itself is
    covered by test_reference_parity_models; stubbing it makes the eval
    pipeline comparison exact (no near-tie switch_points flips from fp
    noise between the two conv stacks)."""

    def __init__(self, preds, dpm):
        super().__init__()
        self.preds = torch.tensor(preds)
        self.dpm = torch.tensor(dpm)

    def forward(self, img):
        return self.preds.clone(), self.dpm.clone()


class _OurStubDetector:
    def __init__(self, preds, dpm):
        from x_as_supervision_tpu.ops.integral import IntegralDecode

        self._out = IntegralDecode(jnp.asarray(preds), jnp.asarray(dpm))

    def apply(self, det_vars, img, train=False):
        return self._out


@pytest.mark.parametrize("mode", ["best", "confident"])
def test_full_eval_loop_parity(mode, tmp_path):
    num_hypo = 2
    batch_size = 3
    preds = RNG.uniform(-0.9, 0.9, size=(batch_size, num_hypo, 18, 3)).astype(
        np.float32
    )
    dpm = RNG.uniform(0, 1, size=(18, 16)).astype(np.float32)
    ref_det = _RefStubDetector(preds, dpm)
    ref_det.eval()

    ds = SyntheticPoseDataset(
        num_samples=batch_size, cam_id_list=(0, 1), patch_size=64, seed=9
    )
    batch = ds.batch(0, batch_size)
    acts = batch["act"]

    # --- reference side: Eval via __new__ (skips DDP/env wiring) ---
    ref_eval = REF.eval.Eval.__new__(REF.eval.Eval)
    ref_eval.gpu_id = "cpu"  # != 0 -> TB logging paths skipped
    ref_eval.cam_id_list = [0, 1]
    ref_eval.cal_per_act = True
    ref_eval.detector = ref_det
    ref_eval.img_size = 64.0
    ref_eval.mean = ref_eval.std = None
    ref_eval.tb_parent_ids = ref_eval.tb_pair_ids = None
    ref_eval.log_dir = str(tmp_path / "ref")
    os.makedirs(os.path.join(ref_eval.log_dir, "eval"))

    tb = {}
    for key, v in batch.items():
        if key == "act":
            tb[key] = v
            continue
        arr = t(v)
        if key.endswith("_img") or key.endswith("_mask") or key.endswith(
            "_geodesic_dis"
        ):
            arr = arr.permute(0, 3, 1, 2).contiguous()
        tb[key] = arr
    ref_eval.eval_data = _ListLoader([tb])

    REF.eval.cal_per_act = True  # module-global the loop body reads
    with torch.no_grad():
        tables = ref_eval.eval(
            None, *_fresh_ref_tables(), 0.0, mode=mode
        )
    (r2d, c2d, r3d, c3d, r3dt, c3dt, amb) = tables
    ref_eval.record(*[copy.deepcopy(x) for x in tables])

    # --- our side ---
    config = {
        "model_params": {
            "cam_id_list": [0, 1],
            "flip_pairs": [[1, 4], [2, 5], [3, 6], [14, 11], [15, 12], [16, 13]],
            "parent_ids": [0, 0, 1, 2, 0, 4, 5, 0, 17, 8, 9, 17, 11, 12, 17,
                           14, 15, 7],
        },
        "dataset_params": {"dataset": {"name": "hm36"}},
        "train_params": {"batch_size": batch_size},
    }
    our_det = _OurStubDetector(preds, dpm)
    det_vars = {}
    our_log = str(tmp_path / "ours")
    os.makedirs(our_log)
    ev = Evaluator(
        config, our_det, det_vars, ds, our_log, img_size=64.0,
        batch_size=batch_size,
    )
    (o2d, oc2d, o3d, oc3d, o3dt, oc3dt, oamb) = ev.eval(mode=mode)
    ev.record(*[copy.deepcopy(x) for x in ev._tables])

    # --- table-level comparison (raw accumulators, before normalization) ---
    for name in r2d:
        np.testing.assert_allclose(
            o2d[name], float(r2d[name]), rtol=5e-3, atol=1e-6, err_msg=name
        )
        assert oc2d[name] == c2d[name], name
    for metric in ("mpjpe", "n-mpjpe", "p-mpjpe"):
        for name in r3d[metric]:
            np.testing.assert_allclose(
                o3d[metric][name], float(r3d[metric][name]), rtol=5e-3,
                atol=1e-5, err_msg=f"3d {metric} {name}",
            )
            np.testing.assert_allclose(
                o3dt[metric][name], float(r3dt[metric][name]), rtol=5e-3,
                atol=1e-5, err_msg=f"tri {metric} {name}",
            )
    # ambiguity: ours accumulates per-batch means, the reference a tensor
    # mean per batch — identical for one batch.
    np.testing.assert_allclose(oamb, float(amb), rtol=1e-5, atol=1e-7)

    # --- eval_result.txt files agree line by line ---
    ref_lines = open(
        os.path.join(ref_eval.log_dir, "eval", "eval_result.txt")
    ).read().strip().splitlines()
    our_lines = open(
        os.path.join(our_log, "eval", "eval_result.txt")
    ).read().strip().splitlines()
    assert len(ref_lines) == len(our_lines)
    for rl, ol in zip(ref_lines, our_lines):
        rk, rv = rl.split(":") if ":" in rl else (rl, None)
        ok, ov = ol.split(":") if ":" in ol else (ol, None)
        assert rk == ok, (rl, ol)
        if rv is not None:
            rnum = float(rv.replace("%", "").strip())
            onum = float(ov.replace("%", "").strip())
            np.testing.assert_allclose(onum, rnum, rtol=5e-3, atol=1e-6,
                                       err_msg=rl)
