"""Checkpoint save/restore (reference OnPolicyRunner.save/load,
on_policy_runner.py:293-310: model + optimizer + iteration).

Uses orbax for the pytree payload; run/checkpoint discovery mirrors the
reference's latest-run/latest-model resolution (helpers.py:109-132):
logs/<experiment>/<datetime>_<run>/model_<iter>."""
from __future__ import annotations

import os
import re
from typing import Optional, Tuple

import jax


def _have_orbax() -> bool:
    try:
        import orbax.checkpoint  # noqa: F401

        return True
    except ImportError:
        return False


def save_checkpoint(path: str, payload) -> None:
    """Write one checkpoint. Multi-host: the runner guards this to process
    0 and the payload is host-local numpy (replicated params pulled off
    device), so orbax must NOT run its cross-process barriers — a default
    StandardCheckpointer deadlocks waiting for processes that never call
    save. Restrict it to the calling process instead."""
    if not _have_orbax():
        _save_npz(path, payload)
        return
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if jax.process_count() > 1:
        ckptr = ocp.AsyncCheckpointer(
            ocp.StandardCheckpointHandler(),
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                active_processes={jax.process_index()},
                primary_host=jax.process_index(),
            ),
        )
        ckptr.save(path, args=ocp.args.StandardSave(payload), force=True)
    else:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, template):
    path = os.path.abspath(path)
    if os.path.isfile(path + ".npz") or not _have_orbax():
        return _load_npz(path, template)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=template)


def _save_npz(path: str, payload) -> None:
    """Fallback pytree checkpoint with no orbax dependency: flat
    '/'-joined key paths -> arrays in one .npz (written atomically)."""
    import numpy as np

    flat, _ = jax.tree_util.tree_flatten_with_path(payload)
    arrays = {
        jax.tree_util.keystr(kp): np.asarray(v) for kp, v in flat
    }
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path + ".npz")


def _load_npz(path: str, template):
    import numpy as np

    with np.load(path + ".npz") as data:
        flat, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = [
            np.asarray(data[jax.tree_util.keystr(kp)]).astype(
                np.asarray(t).dtype
            )
            for kp, t in flat
        ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def get_load_path(
    root: str,
    load_run: str = "-1",
    checkpoint: int = -1,
) -> str:
    """Latest-run / latest-checkpoint discovery (helpers.py:109-132)."""
    runs = sorted(
        d for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d))
    )
    if not runs:
        raise FileNotFoundError(f"no runs in {root}")
    run = runs[-1] if str(load_run) == "-1" else str(load_run)
    run_dir = os.path.join(root, run)
    if checkpoint == -1:
        # accept both orbax directories (model_<it>) and the no-orbax npz
        # fallback (model_<it>.npz); always return the extensionless path
        # so load_checkpoint's `path + ".npz"` probe resolves either form
        matches = {}
        for m in os.listdir(run_dir):
            g = re.match(r"model_(\d+)(?:\.npz)?$", m)
            if g:
                matches[int(g.group(1))] = f"model_{g.group(1)}"
        if not matches:
            raise FileNotFoundError(f"no checkpoints in {run_dir}")
        model = matches[max(matches)]
    else:
        model = f"model_{checkpoint}"
    return os.path.join(run_dir, model)
