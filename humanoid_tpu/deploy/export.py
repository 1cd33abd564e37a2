"""Policy export: actor + velocity-estimator weights to a portable .npz.

The reference exports TorchScript modules (helpers.py:242-254 ->
policy_1.pt + base_lin_vel.pt); the TPU-native equivalent is a framework
-free npz of the MLP weights plus metadata, consumed by deploy/npz_policy.py
(pure numpy — runs on a robot or in the MuJoCo sim2sim gate with no JAX)."""
from __future__ import annotations

from typing import Dict

import numpy as np


def _collect_mlp(tree: Dict, prefix: str):
    """Flatten flax Dense params {layers_i: {kernel, bias}} in layer order."""
    layers = sorted(
        (k for k in tree if k.startswith("Dense_")),
        key=lambda k: int(k.split("_")[1]),
    )
    out = {}
    for i, name in enumerate(layers):
        out[f"{prefix}_w{i}"] = np.asarray(tree[name]["kernel"])
        out[f"{prefix}_b{i}"] = np.asarray(tree[name]["bias"])
    return out


def export_policy_npz(params, path: str, meta: Dict | None = None) -> str:
    """params: the ActorCritic variables dict ({'params': {...}})."""
    p = params["params"]
    arrays = {}
    arrays.update(_collect_mlp(p["actor"], "actor"))
    arrays.update(_collect_mlp(p["vel_est"], "vel"))
    arrays["std"] = np.asarray(p["std"])
    for k, v in (meta or {}).items():
        arrays[f"meta_{k}"] = np.asarray(v)
    np.savez(path, **arrays)
    return path
