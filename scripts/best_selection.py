"""The ONE definition of 'best selection across pipeline stage dirs'.

Ranks each stage dir's population.json by its risk-adjusted selection
score (falling back to the raw re-eval mean) — the same currency
PopulationTracker.finalize selects by.  Used twice by
scripts/population_pipeline.sh (the escalation gate and the final
best-across-attempts pick); keeping both on this helper prevents the two
from drifting onto different scores.

    python scripts/best_selection.py <stage_dir> [...]   # -> "score\tdir"
"""

from __future__ import annotations

import json
import os
import sys


def stage_score(stage_dir: str) -> float | None:
    try:
        with open(os.path.join(stage_dir, "population.json")) as f:
            d = json.load(f)
    except (OSError, ValueError):
        return None
    return d.get("selected_score") or d.get("selected_reval")


def best(stage_dirs) -> tuple[float, str | None]:
    bv, bd = float("-inf"), None
    for c in stage_dirs:
        v = stage_score(c)
        if v is not None and v > bv:
            bv, bd = v, c
    return bv, bd


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print(__doc__, file=sys.stderr)
        return 2
    bv, bd = best(argv)
    print(f"{bv:.2f}\t{bd or ''}")
    return 0 if bd else 1


if __name__ == "__main__":
    sys.exit(main())
