"""Recount every committed validation artifact from its raw JSONL records
(VERDICT r4 next #7: make every documented number regenerable).

For each `validation/<tag>/` directory this prints, from the raw files —
never from summary.json:

  * eval_gate.jsonl          -> passed/total, passed/total from iter 600
  * eval_gate_terrain.jsonl  -> same, for the terrain-MJCF verdict stream
  * gate_matrix.jsonl        -> cells passed/total + failing cell names
  * metrics.jsonl            -> tail-200 reward / ep len / fail frac

and then DIFFS the recount against the committed summary.json, flagging
any mismatch. Run before committing docs:

    python scripts_dev/recount_validation.py [--tag TAG]

Exit status 1 if any summary.json disagrees with its raw records.
"""
from __future__ import annotations

import json
import os
import sys

VAL_ROOT = os.path.join(os.path.dirname(__file__), "..", "validation")


def _rows(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def recount_tag(tag: str) -> dict:
    d = os.path.join(VAL_ROOT, tag)
    out: dict = {"tag": tag}
    p = os.path.join(d, "eval_gate.jsonl")
    if os.path.exists(p):
        rows = _rows(p)
        late = [r for r in rows if r.get("iteration", 0) >= 600]
        out["gate_passed"] = sum(bool(r.get("passed")) for r in rows)
        out["gate_total"] = len(rows)
        out["gate_passed_from_600"] = sum(
            bool(r.get("passed")) for r in late)
        out["gate_total_from_600"] = len(late)
        out["gate_fail_iters"] = sorted(
            r.get("iteration", 0) for r in rows if not r.get("passed"))
    p = os.path.join(d, "eval_gate_terrain.jsonl")
    if os.path.exists(p):
        rows = _rows(p)
        late = [r for r in rows if r.get("iteration", 0) >= 600]
        out["terrain_gate_passed"] = sum(
            bool(r.get("passed")) for r in rows)
        out["terrain_gate_total"] = len(rows)
        out["terrain_gate_passed_from_600"] = sum(
            bool(r.get("passed")) for r in late)
        out["terrain_gate_total_from_600"] = len(late)
    p = os.path.join(d, "gate_matrix.jsonl")
    if os.path.exists(p):
        rows = _rows(p)
        # multi-checkpoint matrices tag rows with "iteration"; group them
        by_it: dict = {}
        for r in rows:
            by_it.setdefault(r.get("iteration", "final"), []).append(r)
        last_it = sorted(by_it, key=lambda k: (str(k) != "final", k))[-1]
        last = by_it[last_it]
        out["matrix_cells_passed"] = sum(bool(r.get("passed")) for r in last)
        out["matrix_cells_total"] = len(last)
        out["matrix_failing_cells"] = [
            r["cell"] for r in last if not r.get("passed")]
        if len(by_it) > 1:
            out["matrix_by_iteration"] = {
                str(k): f"{sum(bool(r.get('passed')) for r in v)}/{len(v)}"
                for k, v in sorted(by_it.items(), key=lambda kv: str(kv[0]))
            }
    p = os.path.join(d, "metrics.jsonl")
    if os.path.exists(p):
        rows = _rows(p)

        def tail(key, n=200):
            vals = [r[key] for r in rows[-n:] if key in r]
            return round(sum(vals) / len(vals), 4) if vals else None

        out["tail200_mean_reward"] = tail("Train/mean_reward")
        out["tail200_mean_ep_len"] = tail("Train/mean_episode_length")
        out["tail200_ep_fail_frac"] = tail("Train/ep_fail_frac")
    return out


def diff_vs_summary(tag: str, recount: dict) -> list:
    p = os.path.join(VAL_ROOT, tag, "summary.json")
    if not os.path.exists(p):
        return []
    summary = json.load(open(p))
    mism = []
    for k, v in recount.items():
        if k in ("tag", "gate_fail_iters", "matrix_failing_cells",
                 "matrix_by_iteration"):
            continue
        if k in summary and summary[k] is not None:
            sv = summary[k]
            if isinstance(v, float):
                if abs(sv - v) > 1e-3 * max(1.0, abs(v)):
                    mism.append((k, sv, v))
            elif sv != v:
                mism.append((k, sv, v))
    return mism


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    only = None
    if "--tag" in argv:
        only = argv[argv.index("--tag") + 1]
    tags = sorted(
        t for t in os.listdir(VAL_ROOT)
        if os.path.isdir(os.path.join(VAL_ROOT, t))
    )
    bad = 0
    for tag in tags:
        if only and tag != only:
            continue
        rec = recount_tag(tag)
        print(json.dumps(rec))
        for k, sv, rv in diff_vs_summary(tag, rec):
            bad += 1
            print(f"  MISMATCH {tag}.{k}: summary={sv} recount={rv}",
                  file=sys.stderr)
    if bad:
        print(f"{bad} summary/raw mismatches", file=sys.stderr)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
