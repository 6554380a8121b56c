"""Episode-telemetry CSV writer with the reference drivers' exact schema.

Reproduces the DataFrame layouts of testing_main.py:113-138 (full telemetry)
and baseline_main.py:66-74 (compact), so notebooks/tools written against the
reference's CSVs work unchanged on this framework's output.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pandas as pd

from acas2d_tpu.config import OUTCOME_NAMES


def episode_records(init: Dict, tel, n_steps: int, num_traffic: int) -> Dict:
    """Convert one env's (init seed values, stacked Telemetry, #steps taken)
    into the reference's per-episode record lists.

    `init` is initial_telemetry()'s dict of t=0 values; `tel` a Telemetry
    pytree of numpy arrays with leading time axis; `n_steps` the number of
    actions taken (done step inclusive).
    """
    k = n_steps
    f = float
    path = [(f(init["px"]), f(init["py"]))]
    path += [(f(x), f(y)) for x, y in zip(tel.px[:k], tel.py[:k])]
    traffic_paths = []
    for n in range(num_traffic):
        tp = [(f(init["tx"][n]), f(init["ty"][n]))]
        tp += [(f(x), f(y)) for x, y in zip(tel.tx[:k, n], tel.ty[:k, n])]
        traffic_paths.append(tp)

    def rec(name):
        return [f(init[name])] + [f(v) for v in getattr(tel, name)[:k]]

    return {
        "Outcome": OUTCOME_NAMES[int(tel.outcome[k - 1])],
        "Total Reward": f(np.sum(tel.reward[:k])),
        "Time Steps": k + 1,          # steps counter includes the reset observe
        "Path Length": f(np.sum(tel.d_path_inc[:k])),
        "Path": path,
        "Traffic Paths": traffic_paths,
        "psi": rec("psi"),
        "d_sep": rec("d_sep"),
        "a_lat": rec("a_lat"),
        "d_goal": rec("d_goal"),
        "delta_heading": rec("delta_h_goal"),
        "v_closing": rec("v_closing"),
        "d_cpa": rec("d_cpa"),
        "d_dev": rec("d_dev"),
        "r_d_goal": rec("r_d_goal"),
        "r_h_goal": rec("r_h_goal"),
        "r_d_cpa": rec("r_d_cpa"),
        "r_d_dev": rec("r_d_dev"),
        "r_step": rec("r_step"),
    }


FULL_COLUMNS = ["Episode", "Outcome", "Total Reward", "Time Steps",
                "Path Length", "Path", "Traffic Paths", "psi", "d_sep",
                "a_lat", "d_goal", "delta_heading", "v_closing", "d_cpa",
                "d_dev", "r_d_goal", "r_h_goal", "r_d_cpa", "r_d_dev",
                "r_step"]

BASELINE_COLUMNS = ["Episode", "Outcome", "Total Reward", "Time Steps",
                    "Path", "Traffic Paths"]


def to_dataframe(episodes: List[Dict], columns=None) -> pd.DataFrame:
    columns = columns or FULL_COLUMNS
    df = pd.DataFrame()
    df["Episode"] = range(1, len(episodes) + 1)
    for col in columns:
        if col == "Episode":
            continue
        df[col] = [e[col] for e in episodes]
    return df
