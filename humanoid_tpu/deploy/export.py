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


def _torch_mlp(params_tree, prefix: str):
    """Build a torch ELU MLP from the flax params (CPU torch is only a
    deployment dependency, never on the training path)."""
    import torch

    arrays = _collect_mlp(params_tree, prefix)
    n_layers = len(arrays) // 2
    mods = []
    for i in range(n_layers):
        w = torch.from_numpy(np.asarray(arrays[f"{prefix}_w{i}"]).copy())
        b = torch.from_numpy(np.asarray(arrays[f"{prefix}_b{i}"]).copy())
        lin = torch.nn.Linear(w.shape[0], w.shape[1])
        with torch.no_grad():
            lin.weight.copy_(w.T)
            lin.bias.copy_(b)
        mods.append(lin)
        if i < n_layers - 1:
            mods.append(torch.nn.ELU())
    return torch.nn.Sequential(*mods).eval()


def export_policy_torchscript(params, out_dir: str) -> Dict[str, str]:
    """TorchScript export matching the reference's artifact pair
    (helpers.py:242-254): policy_1.pt (actor) + base_lin_vel.pt
    (velocity-estimator head)."""
    import os

    import torch

    p = params["params"]
    paths = {}
    for tree, prefix, fname in (
        (p["actor"], "actor", "policy_1.pt"),
        (p["vel_est"], "vel", "base_lin_vel.pt"),
    ):
        mod = _torch_mlp(tree, prefix)
        path = os.path.join(out_dir, fname)
        torch.jit.script(mod).save(path)
        paths[fname] = path
    return paths


# ---- minimal hand-rolled ONNX writer (no onnx package in this image;
# symmetric to the wire-level reader in onnx_loader.py) ----


def _pb_varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _pb_field(field: int, wire: int, payload: bytes) -> bytes:
    return _pb_varint((field << 3) | wire) + payload


def _pb_len(field: int, payload: bytes) -> bytes:
    return _pb_field(field, 2, _pb_varint(len(payload)) + payload)


def _pb_int(field: int, v: int) -> bytes:
    return _pb_field(field, 0, _pb_varint(v))


def _pb_str(field: int, s: str) -> bytes:
    return _pb_len(field, s.encode())


def _onnx_tensor(name: str, arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    buf = b"".join(_pb_int(1, d) for d in arr.shape)
    buf += _pb_int(2, 1)                       # data_type = FLOAT
    buf += _pb_str(8, name)
    buf += _pb_len(9, arr.tobytes())           # raw_data
    return buf


def _onnx_value_info(name: str, dim1: int) -> bytes:
    # TypeProto.tensor_type: elem_type=1(FLOAT), shape: [batch, dim1]
    dim_batch = _pb_str(3, "batch")            # dim_param
    dim_fixed = _pb_int(1, dim1)               # dim_value
    shape = _pb_len(1, dim_batch) + _pb_len(1, dim_fixed)
    tensor_type = _pb_int(1, 1) + _pb_len(2, shape)
    type_proto = _pb_len(1, tensor_type)
    return _pb_str(1, name) + _pb_len(2, type_proto)


def _onnx_node(op: str, inputs, outputs, attrs=()) -> bytes:
    buf = b"".join(_pb_str(1, i) for i in inputs)
    buf += b"".join(_pb_str(2, o) for o in outputs)
    buf += _pb_str(4, op)
    for name, ival in attrs:                   # int attributes only
        a = _pb_str(1, name) + _pb_int(3, ival) + _pb_int(20, 2)  # type=INT
        buf += _pb_len(5, a)
    return buf


def export_policy_onnx(params, path: str, num_obs: int) -> str:
    """ONNX export of the actor: the same artifact shape the reference
    ships (Gemm/Elu x(L-1) + Gemm, dynamic batch — OnnxTest.onnx), written
    at the protobuf wire level (no onnx package required)."""
    arrays = _collect_mlp(params["params"]["actor"], "actor")
    n_layers = len(arrays) // 2
    nodes = b""
    inits = b""
    x = "input"
    out_dim = 0
    for i in range(n_layers):
        W = np.asarray(arrays[f"actor_w{i}"])      # (in, out)
        b = np.asarray(arrays[f"actor_b{i}"])
        out_dim = W.shape[1]
        wname, bname = f"w{i}", f"b{i}"
        inits += _pb_len(5, _onnx_tensor(wname, W.T))   # (out, in), transB
        inits += _pb_len(5, _onnx_tensor(bname, b))
        y = "output" if i == n_layers - 1 else f"h{i}"
        nodes += _pb_len(
            1, _onnx_node("Gemm", [x, wname, bname], [y],
                          attrs=[("transB", 1)])
        )
        if i < n_layers - 1:
            nodes += _pb_len(1, _onnx_node("Elu", [y], [f"a{i}"]))
            x = f"a{i}"
    graph = (
        nodes
        + _pb_str(2, "actor")
        + inits
        + _pb_len(11, _onnx_value_info("input", num_obs))
        + _pb_len(12, _onnx_value_info("output", out_dim))
    )
    opset = _pb_str(1, "") + _pb_int(2, 13)
    model = (
        _pb_int(1, 8)                      # ir_version
        + _pb_str(2, "humanoid_tpu")       # producer_name
        + _pb_len(7, graph)
        + _pb_len(8, opset)
    )
    with open(path, "wb") as f:
        f.write(model)
    return path
