"""Host-side rendering: offline trajectory replay, decoupled from training.

The reference renders with pygame inside the step loop (game.py:316-431),
throttling the whole engine; here rendering is a pure host-side consumer of
recorded trajectories (the SURVEY.md §7 'optional host-side replay' design).
Matplotlib (Agg) draws the same scene elements the reference's view() does:
sky-blue airspace, player/traffic markers with red collision-radius circles,
yellow goal-radius circle, and HUD text.  Outputs PNG frames, episode
overview plots, or rgb_array frames for the gymnasium wrapper.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from acas2d_tpu.config import EnvParams, DEFAULT_PARAMS, OUTCOME_NAMES

SKY = (60 / 255, 150 / 255, 220 / 255)      # settings.py:23 SKY_RGB
RED = (1.0, 0.0, 0.0)
YELLOW = (1.0, 1.0, 0.0)
GREEN = (0.0, 1.0, 0.0)


def _new_axes(params: EnvParams, dpi=80):
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(
        figsize=(params.width / 160, params.height / 160), dpi=dpi)
    ax.set_xlim(0, params.width)
    ax.set_ylim(params.height, 0)            # screen coords: y down
    ax.set_aspect("equal")
    ax.set_facecolor(SKY)
    return fig, ax


def _draw_scene(ax, px, py, tx, ty, num_traffic, params: EnvParams):
    import matplotlib.patches as mpatches
    ax.add_patch(mpatches.Circle((params.goal_x, params.goal_y),
                                 params.goal_radius, fill=False,
                                 color=YELLOW, lw=1.5))
    ax.plot([params.goal_x], [params.goal_y], marker="*", ms=14,
            color=YELLOW)
    ax.add_patch(mpatches.Circle((px, py), params.collision_radius,
                                 fill=False, color=RED, lw=1.0))
    ax.plot([px], [py], marker="^", ms=8, color="white")
    for n in range(num_traffic):
        ax.add_patch(mpatches.Circle((tx[n], ty[n]), params.collision_radius,
                                     fill=False, color=RED, lw=1.0))
        ax.plot([tx[n]], [ty[n]], marker="v", ms=8, color="black")


def render_frame(px, py, psi, tx, ty, num_traffic,
                 params: EnvParams = DEFAULT_PARAMS,
                 trail: Optional[Sequence[Tuple[float, float]]] = None
                 ) -> np.ndarray:
    """One live frame as an HxWx3 uint8 array (gymnasium rgb_array mode)."""
    fig, ax = _new_axes(params)
    if trail:
        t = np.asarray(trail)
        ax.plot(t[:, 0], t[:, 1], color="white", lw=0.8, alpha=0.7)
    _draw_scene(ax, px, py, tx, ty, num_traffic, params)
    ax.text(20, 40, f"pos: ({px:.1f}, {py:.1f})  psi: {psi:.1f}",
            fontsize=8, color="black")
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    import matplotlib.pyplot as plt
    plt.close(fig)
    return buf


def plot_episode(path: Sequence[Tuple[float, float]],
                 traffic_paths: Sequence[Sequence[Tuple[float, float]]],
                 params: EnvParams = DEFAULT_PARAMS,
                 outcome: Optional[int] = None,
                 title: str = "", out_png: Optional[str] = None):
    """Whole-episode trajectory overview (the notebooks' scatter plots)."""
    import matplotlib.pyplot as plt
    fig, ax = _new_axes(params)
    p = np.asarray(path)
    ax.plot(p[:, 0], p[:, 1], color="white", lw=1.2, label="player")
    for n, tp in enumerate(traffic_paths):
        tp = np.asarray(tp)
        ax.plot(tp[:, 0], tp[:, 1], color="black", lw=1.0,
                label="traffic" if n == 0 else None)
    _draw_scene(ax, p[-1, 0], p[-1, 1],
                [np.asarray(tp)[-1, 0] for tp in traffic_paths],
                [np.asarray(tp)[-1, 1] for tp in traffic_paths],
                len(traffic_paths), params)
    label = OUTCOME_NAMES.get(outcome, "") if outcome else ""
    ax.set_title(f"{title} {label}".strip())
    ax.legend(loc="lower left", fontsize=8)
    if out_png:
        os.makedirs(os.path.dirname(out_png) or ".", exist_ok=True)
        fig.savefig(out_png, bbox_inches="tight")
        plt.close(fig)
        return out_png
    return fig


def render_run_csv(csv_path: str, out_dir: str,
                   episodes: Optional[List[int]] = None,
                   params: EnvParams = DEFAULT_PARAMS) -> List[str]:
    """Replay episodes from a driver CSV (baseline.py / eval.py output or
    the reference's own logs) into per-episode PNGs."""
    import ast
    import pandas as pd
    df = pd.read_csv(csv_path)
    outs = []
    idxs = episodes if episodes is not None else range(1, len(df) + 1)
    name_to_code = {v: k for k, v in OUTCOME_NAMES.items()}
    for e in idxs:
        row = df[df["Episode"] == e].iloc[0]
        path = ast.literal_eval(row["Path"])
        tps = ast.literal_eval(row["Traffic Paths"])
        out_png = os.path.join(out_dir, f"episode_{e:03d}.png")
        plot_episode(path, tps, params,
                     outcome=name_to_code.get(row["Outcome"]),
                     title=f"Episode {e}", out_png=out_png)
        outs.append(out_png)
    return outs
