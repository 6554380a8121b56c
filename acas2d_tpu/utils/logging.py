"""Structured metrics logging: CSV + JSONL + console (+ TensorBoard if present).

The reference's observability is ad-hoc (SURVEY.md §5): stdout redirected to
txt logs, ~20 per-step telemetry lists harvested to pandas CSVs, SB3
TensorBoard scalars.  Here the jitted train step returns one small metrics
dict per iteration and this module persists it: append-only CSV (the
pandas-friendly equivalent of the reference's logs), JSONL (machine
consumption), console lines, and TensorBoard events when the `tensorboard`
package is importable (it is not a hard dependency).
"""

from __future__ import annotations

import csv
import json
import os
import sys
import time
from typing import Dict, Optional


def _to_py(v):
    try:
        return v.item()
    except AttributeError:
        return v


class MetricsLogger:
    def __init__(self, out_dir: str, run_name: str = "run",
                 tensorboard: bool = True, echo: bool = True):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.csv_path = os.path.join(out_dir, f"{run_name}.csv")
        self.jsonl_path = os.path.join(out_dir, f"{run_name}.jsonl")
        self._csv_file = None
        self._csv_writer = None
        self._fields = None
        self.echo = echo
        self._t0 = time.time()
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter  # noqa
                self._tb = SummaryWriter(os.path.join(out_dir, "tb", run_name))
            except Exception:
                self._tb = None

    def _open_csv(self, fields):
        """Open the CSV for append with a header that is the union of the
        file's existing header (a resumed run may have logged columns this
        process never will) and `fields`; rewrite the file if the header
        must widen (old rows get empty cells in the new columns)."""
        fields = list(fields)
        existing = []
        if os.path.exists(self.csv_path) and os.path.getsize(self.csv_path):
            with open(self.csv_path, newline="") as f:
                reader = csv.DictReader(f)
                existing = list(reader.fieldnames or [])
                old_rows = (list(reader)
                            if any(k not in existing for k in fields) else None)
            if old_rows is not None:
                merged = existing + [k for k in fields if k not in existing]
                # write-then-rename: a crash mid-rewrite must not lose the
                # already-logged rows of a resumed run
                tmp_path = self.csv_path + ".tmp"
                with open(tmp_path, "w", newline="") as f:
                    w = csv.DictWriter(f, fieldnames=merged,
                                       extrasaction="ignore")
                    w.writeheader()
                    w.writerows(old_rows)
                os.replace(tmp_path, self.csv_path)
                existing = merged
        self._fields = existing or fields
        self._csv_file = open(self.csv_path, "a", newline="")
        self._csv_writer = csv.DictWriter(self._csv_file,
                                          fieldnames=self._fields,
                                          extrasaction="ignore")
        if self._csv_file.tell() == 0:
            self._csv_writer.writeheader()

    def _widen_csv(self, new_fields):
        """A later log() introduced keys unseen in the header: reopen with
        the widened field set instead of silently dropping the columns."""
        self._csv_file.close()
        self._open_csv(self._fields
                       + [k for k in new_fields if k not in self._fields])

    def log(self, metrics: Dict, step: Optional[int] = None,
            echo: Optional[bool] = None):
        """Persist one row.  `echo` overrides the instance default for this
        row — a fused K-iteration train call logs K rows at once and only
        echoes the last (console formatting for thousands of rows costs
        real wall-clock on short TPU runs; CSV/JSONL/TB stay complete)."""
        row = {k: _to_py(v) for k, v in metrics.items()}
        row.setdefault("wall_time_s", round(time.time() - self._t0, 3))
        if step is not None:
            row.setdefault("global_step", step)
        if self._csv_writer is None:
            self._open_csv(row.keys())
        elif any(k not in self._fields for k in row):
            self._widen_csv(row.keys())
        self._csv_writer.writerow(row)
        self._csv_file.flush()
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        if self._tb is not None:
            s = int(row.get("global_step", 0))
            for k, v in row.items():
                if isinstance(v, (int, float)) and k != "global_step":
                    self._tb.add_scalar(k, v, s)
        if self.echo if echo is None else echo:
            parts = [f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                     for k, v in row.items()]
            print(" | ".join(parts), file=sys.stderr)

    def close(self):
        if self._csv_file:
            self._csv_file.close()
        if self._tb is not None:
            self._tb.close()
