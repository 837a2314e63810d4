"""Offline SMPL pkl -> npz converter (chumpy-free).

The original SMPL model files are chumpy-array pickles; the reference
deserializes them with chumpy at model-load time (reference:
modules/smplpytorch/native/webuser/serialization.py:1-39). chumpy is not a
runtime dependency here: this one-off tool unpickles the file with stub
classes that capture the raw ndarray state, densifies the sparse
J_regressor, and writes a plain .npz that models/smpl.py loads.

Usage:
  python -m x_as_supervision_tpu.tools.smpl_pkl_to_npz \
      --pkl data/smpl_models/basicModel_neutral_lbs_10_207_0_v1.0.0.pkl \
      --out data/smpl_models/smpl_neutral.npz
"""

from __future__ import annotations

import argparse
import io
import pickle

import numpy as np


class _ChumpyStub:
    """Captures the pickled state of a chumpy.Ch array without chumpy.

    chumpy arrays pickle their data under 'x' (dict state); plain ndarray
    subclass state comes through __setstate__ tuples.
    """

    def __init__(self, *args, **kwargs):
        self._args = args

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self._state = state

    @property
    def r(self):
        for key in ("x", "a", "_data"):
            if key in getattr(self, "__dict__", {}):
                return np.asarray(self.__dict__[key])
        if hasattr(self, "_state"):
            for item in self._state:
                if isinstance(item, np.ndarray):
                    return item
        raise ValueError("could not extract array from chumpy stub")


class _StubUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.startswith("chumpy"):
            return _ChumpyStub
        return super().find_class(module, name)


def _to_array(v):
    if isinstance(v, _ChumpyStub):
        return np.asarray(v.r)
    if hasattr(v, "toarray"):  # scipy sparse
        return np.asarray(v.toarray())
    return np.asarray(v)


def convert(pkl_path: str, out_path: str) -> dict:
    with open(pkl_path, "rb") as f:
        data = _StubUnpickler(f, encoding="latin1").load()

    shapedirs = _to_array(data["shapedirs"])[..., :10]
    out = dict(
        v_template=_to_array(data["v_template"]).astype(np.float32),
        shapedirs=shapedirs.astype(np.float32),
        posedirs=_to_array(data["posedirs"]).astype(np.float32),
        j_regressor=_to_array(data["J_regressor"]).astype(np.float32),
        weights=_to_array(data["weights"]).astype(np.float32),
        kintree_parents=np.asarray(
            data["kintree_table"]
        )[0].astype(np.int32),
        faces=np.asarray(data["f"]).astype(np.int32),
        betas_mean=np.zeros(10, np.float32),
    )
    np.savez(out_path, **out)
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--pkl", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()
    out = convert(args.pkl, args.out)
    print(
        f"wrote {args.out}: verts {out['v_template'].shape}, "
        f"weights {out['weights'].shape}"
    )


if __name__ == "__main__":
    main()
