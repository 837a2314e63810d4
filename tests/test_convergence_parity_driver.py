"""Unit tests for the cross-framework convergence-parity driver
(`scripts/convergence_parity.py`) — the render staleness check and the
eval_result parser. The full driver (torch reference via runpy + this
framework) is exercised manually (benchmarks/convergence_parity.md);
these pin the pure logic that decides whether an existing mini render
can be reused: a --smoke run leaves a 2-frames-per-folder dataset whose
manifest must NOT satisfy a later full-scale run (the exact silent-reuse
failure hit in round 5).
"""

import importlib.util
import json
import os
import sys

MOD_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts", "convergence_parity.py",
)


def _load(tmp_data_dir):
    spec = importlib.util.spec_from_file_location("convpar", MOD_PATH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["convpar"] = mod
    spec.loader.exec_module(mod)
    mod.DATA = str(tmp_data_dir)
    return mod


def _write_manifest(data_dir, frames_by_folder):
    payload = {
        "data": {
            "hm36": {
                name: {"frames": n, "masks": n}
                for name, n in frames_by_folder.items()
            }
        }
    }
    os.makedirs(data_dir, exist_ok=True)
    with open(os.path.join(data_dir, "manifest.json"), "w") as f:
        json.dump(payload, f)


def test_no_manifest_is_incomplete(tmp_path):
    mod = _load(tmp_path / "mini")
    assert not mod._render_complete_at_scale(24)


def test_smoke_manifest_rejected_for_full_scale(tmp_path):
    data = tmp_path / "mini"
    mod = _load(data)
    _write_manifest(data, {"s_01_act_02_subact_01_ca_01": 2,
                           "s_01_act_02_subact_01_ca_02": 2})
    assert mod._render_complete_at_scale(2)
    assert not mod._render_complete_at_scale(24)


def test_partial_rerender_rejected(tmp_path):
    data = tmp_path / "mini"
    mod = _load(data)
    _write_manifest(data, {"a": 24, "b": 2})
    assert not mod._render_complete_at_scale(24)
    assert not mod._render_complete_at_scale(2)


def test_empty_manifest_rejected(tmp_path):
    data = tmp_path / "mini"
    mod = _load(data)
    _write_manifest(data, {})
    assert not mod._render_complete_at_scale(24)


def test_eval_parser_reads_metric_lines(tmp_path):
    mod = _load(tmp_path / "mini")
    p = tmp_path / "eval_result.txt"
    p.write_text(
        "2D MSE: 0.49 %\nMPJPE: 482.38 %\n--------select---------\n"
        "MPJPE: 111.0 %\n"
    )
    out = mod._parse_eval(str(p))
    assert out["MPJPE"] == 482.38  # pre-select section only
    assert out["2D MSE"] == 0.49
