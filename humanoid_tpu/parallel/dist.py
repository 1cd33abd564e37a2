"""Multi-host process utilities (VERDICT r1 next #1).

The reference is single-process (SURVEY.md §2: the --horovod flag is parsed
and dropped, helpers.py:202-206), so everything here is new TPU-native
capability: the conventions JAX multi-host programs must follow so that
N processes behave as ONE logical trainer:

  * every process runs the same program over a GLOBAL device mesh;
  * exactly one process (index 0) owns the side effects — run naming,
    checkpoint writes, metric logging, the sim2sim eval gate;
  * anything host-generated that must agree across processes (the run-dir
    name, derived from wall clock) is broadcast from process 0 instead of
    recomputed per host.
"""
from __future__ import annotations

import numpy as np


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def is_main() -> bool:
    """True on the one process that owns logging/checkpoint side effects."""
    return process_index() == 0


def sync_run_name(name: str, maxlen: int = 96) -> str:
    """Return process 0's `name` on every process.

    Fixes the multihost hazard of per-process `datetime.now()` run-dir
    naming (hosts would disagree on the directory the checkpointer and
    resume logic must agree on). Single-process: identity, no collective.
    """
    import jax

    if jax.process_count() == 1:
        return name
    from jax.experimental import multihost_utils

    buf = np.zeros(maxlen, dtype=np.uint8)
    raw = name.encode("utf-8")[:maxlen]
    buf[: len(raw)] = np.frombuffer(raw, dtype=np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return bytes(out).rstrip(b"\x00").decode("utf-8")
