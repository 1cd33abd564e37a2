"""Framework-free policy runner: ELU MLP forward from an exported .npz.

Counterpart of loading the reference's TorchScript export in sim2sim
(scripts/sim2sim.py:326). Pure numpy so the deployment side has zero JAX
dependency."""
from __future__ import annotations

import numpy as np


def _elu(x):
    return np.where(x > 0, x, np.expm1(x))


class NpzPolicy:
    def __init__(self, path: str, prefix: str = "actor"):
        data = np.load(path)
        self.layers = []
        i = 0
        while f"{prefix}_w{i}" in data:
            self.layers.append(
                (data[f"{prefix}_w{i}"], data[f"{prefix}_b{i}"])
            )
            i += 1
        if not self.layers:
            raise ValueError(f"no '{prefix}' layers in {path}")

    def __call__(self, obs: np.ndarray) -> np.ndarray:
        x = np.asarray(obs, dtype=np.float32)
        for k, (w, b) in enumerate(self.layers):
            x = x @ w + b
            if k < len(self.layers) - 1:
                x = _elu(x)
        return x
