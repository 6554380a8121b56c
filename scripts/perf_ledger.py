"""Round-over-round on-chip performance ledger.

Consolidates one chip session's phase JSONs (scripts/chip_session.py
writes them to /tmp/chip_session/) into a committed per-round artifact
`artifacts/chip_session_r<N>.json`, and diffs every numeric metric against
the previous round's ledger — any rate >10% down is FLAGGED.  This
generalizes bench.py's headline guard (VERDICT r4 #1/#8) to every measured
number: train variants, population phases, multi-traffic, headline
repeats.

    python scripts/perf_ledger.py --round 5 [--session-dir /tmp/chip_session]

Writes artifacts/chip_session_r05.json and prints the delta table; exits
non-zero only on usage errors (a flagged regression is a finding to
root-cause, not a crash).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# metrics where LOWER is better (or that are not rates): excluded from the
# >10%-down flagging, still shown in the delta table.  `(?<!per)_s$`
# excludes seconds (first_call_s, measure_wall_s) but NOT rates named
# *_per_s (agg_steps_per_s must stay flaggable)
_NOT_A_RATE = re.compile(r"(cost|error|_ms|(?<!per)_s$|wall|ratio|date|platform)")


def numeric_leaves(tree: dict, prefix: str = "") -> dict:
    """Flatten nested dicts/lists to {dotted.path: float} for every numeric
    leaf (lists index as .0/.1/...)."""
    out = {}
    if isinstance(tree, dict):
        items = tree.items()
    elif isinstance(tree, list):
        items = ((str(i), v) for i, v in enumerate(tree))
    else:
        return out
    for k, v in items:
        path = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, bool):
            continue
        if isinstance(v, (int, float)):
            out[path] = float(v)
        elif isinstance(v, (dict, list)):
            out.update(numeric_leaves(v, path))
    return out


def delta_table(cur: dict, prev: dict, threshold: float = 0.10):
    """(deltas, flags): ratio cur/prev per shared numeric metric; flags are
    the rate-like metrics down more than `threshold`."""
    c = numeric_leaves(cur)
    p = numeric_leaves(prev)
    deltas, flags = {}, []
    for k in sorted(set(c) & set(p)):
        if p[k] == 0:
            continue
        ratio = c[k] / p[k]
        deltas[k] = round(ratio, 3)
        if ratio < 1.0 - threshold and not _NOT_A_RATE.search(k):
            flags.append(f"{k}: {c[k]:.4g} vs {p[k]:.4g} ({ratio:.0%})")
    return deltas, flags


def collect(session_dir: str) -> dict:
    phases = {}
    for path in sorted(glob.glob(os.path.join(session_dir, "*.json"))):
        name = os.path.splitext(os.path.basename(path))[0]
        try:
            with open(path) as f:
                phases[name] = json.load(f)
        except (OSError, ValueError) as e:
            phases[name] = {"error": f"{type(e).__name__}: {e}"}
    return phases


def previous_ledger(round_n: int) -> tuple[str, dict] | None:
    for n in range(round_n - 1, 0, -1):
        path = os.path.join(REPO, "artifacts", f"chip_session_r{n:02d}.json")
        if os.path.exists(path):
            with open(path) as f:
                return os.path.basename(path), json.load(f)
    return None


def build_ledger(round_n: int, phases: dict) -> dict:
    ledger = {
        "round": round_n,
        "date": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "phases": phases,
    }
    prev = previous_ledger(round_n)
    if prev:
        prev_name, prev_ledger_d = prev
        deltas, flags = delta_table(phases, prev_ledger_d.get("phases", {}))
        ledger["delta_vs"] = prev_name
        ledger["deltas"] = deltas
        ledger["flags_over_10pct_down"] = flags
    return ledger


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--session-dir", default="/tmp/chip_session")
    ap.add_argument("--out", default=None,
                    help="default artifacts/chip_session_r<N>.json")
    ap.add_argument("--note", default=None,
                    help="free-text annotation recorded in the ledger "
                         "(e.g. the root cause of flagged deltas)")
    args = ap.parse_args(argv)
    phases = collect(args.session_dir)
    if not phases:
        print(f"no phase JSONs under {args.session_dir}", file=sys.stderr)
        return 2
    ledger = build_ledger(args.round, phases)
    if args.note:
        ledger["note"] = args.note
    out = args.out or os.path.join(
        REPO, "artifacts", f"chip_session_r{args.round:02d}.json")
    with open(out, "w") as f:
        json.dump(ledger, f, indent=1)
    print(f"wrote {out} ({len(phases)} phases)")
    for k, v in ledger.get("deltas", {}).items():
        print(f"  {k}: x{v}")
    for flag in ledger.get("flags_over_10pct_down", []):
        print(f"  FLAG >10% down: {flag}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
