"""Greedy-policy evaluation driver (testing_main.py /
checkpoint_testing_main.py rebuilt TPU-native).

Loads a trained checkpoint (latest, best, or a specific step — the
checkpoint_testing_main.py:142-151 use case), rolls N greedy episodes in
lockstep on device, and writes the full telemetry CSV with the reference's
exact schema (testing_main.py:113-138).

Examples:
    python eval.py --run runs/ppo/<run-name>                 # latest ckpt
    python eval.py --run runs/ppo/<run-name> --best
    python eval.py --run runs/ppo/<run-name> --step 524288   # checkpoint eval
    python eval.py --run ... --episodes 100 --out runs/eval.csv
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run", default=None,
                   help="training run directory (contains checkpoints/)")
    p.add_argument("--params-npz", default=None,
                   help="evaluate a portable params artifact "
                        "(utils/params_io.py) instead of a run checkpoint")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step to load (default: latest)")
    p.add_argument("--best", action="store_true",
                   help="load the best-eval checkpoint")
    p.add_argument("--episodes", type=int, default=100)    # TEST_EPISODES
    p.add_argument("--out", default=None)
    p.add_argument("--exact", action="store_true",
                   help="float64 CPU stepping + Mersenne spawn stream")
    p.add_argument("--skip-episodes", type=int, default=2)
    p.add_argument("--seed", type=int, default=13)
    p.add_argument("--platform", choices=["default", "cpu"], default="default",
                   help="force the CPU backend (e.g. while the accelerator "
                        "is held by a training run)")
    p.add_argument("--render-every", type=int, default=0, metavar="N",
                   help="dump a full-HUD PNG frame every N steps of the "
                        "rendered episodes (the reference renders live "
                        "during eval, testing_main.py:80; here frames are "
                        "written offline, never on the device step path)")
    p.add_argument("--view", action="store_true",
                   help="live on-screen replay of the eval episodes: every "
                        "step rendered sprite-faithfully into one "
                        "interactive window at the reference's FPS cap "
                        "(testing_main.py:80 + game.py:316-431; pacing = "
                        "clock.tick(FPS), environment.py:31).  Episodes "
                        "roll on device first, then replay — the render "
                        "path never touches the device step loop.  Uses "
                        "the same frame source as --render-every")
    p.add_argument("--view-fps", type=float, default=100.0,
                   help="--view frame-rate cap (reference: FPS=100, "
                        "settings.py:17)")
    p.add_argument("--render-episodes", default=None,
                   help="comma-separated 1-based episode numbers to render "
                        "(with --render-every / --view; default: episode 1 "
                        "for --render-every, ALL episodes for --view — the "
                        "reference replays every eval episode)")
    p.add_argument("--render-dir", default=None,
                   help="frame output dir (default <run or .>/frames)")
    return p.parse_args(argv)


def episode_frames(tel_b, n_traffic, tv_row, tpsi_row, params, every: int,
                   episode: int):
    """The ONE frame source shared by --render-every (PNG dump) and --view
    (live replay): yields (t, RGBA frame) for every `every`-th step of one
    completed episode, always including the final step.  Mirrors the
    reference's per-step view() during eval (testing_main.py:80,
    game.py:316-431)."""
    import numpy as np
    from acas2d_tpu.render import render_frame

    done = np.asarray(tel_b.done)
    done_idx = np.nonzero(done)[0]
    k = int(done_idx[0]) + 1 if done_idx.size else len(done)
    total = 0.0
    trail = []
    for t in range(k):
        total += float(tel_b.reward[t])
        trail.append((float(tel_b.px[t]), float(tel_b.py[t])))
        if t % every and t != k - 1:
            continue
        yield t, render_frame(
            tel_b.px[t], tel_b.py[t], tel_b.psi[t],
            np.atleast_1d(tel_b.tx[t]), np.atleast_1d(tel_b.ty[t]),
            n_traffic, params, trail=trail,
            tv=tv_row, tpsi=tpsi_row,
            a_lat=float(tel_b.a_lat[t]),
            # steps counter as displayed live: observe() has run once at
            # reset and once per step (game.py:197)
            steps=t + 2, episode=episode, total_reward=total)


def view_episodes(episode_frame_iters, fps: float = 100.0,
                  caption: str = "ACAS-2D") -> int:
    """Live replay window: one persistent interactive figure updated in
    place (the pygame.display.update equivalent), paced to the reference's
    FPS cap — draw, then sleep off the remainder of the 1/fps budget
    (clock.tick semantics: a cap, not a guarantee).  Caption and (where
    the backend allows) the compass window icon mirror game.py:14-15.
    Returns the number of frames shown."""
    import time

    import matplotlib.pyplot as plt

    plt.ion()
    fig, ax = plt.subplots(figsize=(10, 6.25))
    ax.set_axis_off()
    try:
        fig.canvas.manager.set_window_title(caption)
    except Exception:
        pass
    try:    # TkAgg only: the reference's compass logo as the window icon
        import tkinter
        from acas2d_tpu.utils.reference import reference_path
        icon = tkinter.PhotoImage(
            file=reference_path("gym_ACAS2D", "png", "004-compass.png"))
        fig.canvas.manager.window.iconphoto(False, icon)
    except Exception:
        pass
    im = None
    budget = 1.0 / max(fps, 1e-6)
    shown = 0
    for episode, frames in episode_frame_iters:
        for t, frame in frames:
            t0 = time.perf_counter()
            if im is None:
                im = ax.imshow(frame)
            else:
                im.set_data(frame)
            fig.canvas.draw_idle()
            fig.canvas.flush_events()
            left = budget - (time.perf_counter() - t0)
            if left > 0:
                time.sleep(left)
            shown += 1
    plt.close(fig)
    return shown


def main(argv=None):
    args = parse_args(argv)
    import jax
    if args.exact:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    elif args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from acas2d_tpu.config import DEFAULT_PARAMS
    from acas2d_tpu.envs import core, telemetry
    from acas2d_tpu.models.actor_critic import ActorCritic
    from acas2d_tpu.oracle import MersenneSpawner
    from acas2d_tpu.utils import episode_csv
    from acas2d_tpu.utils.checkpoint import CheckpointManager

    P = DEFAULT_PARAMS
    dtype = jnp.float64 if args.exact else jnp.float32
    B, T = args.episodes, P.max_steps

    # validate render selection up front: a bad value must not discard a
    # completed eval (the CSV is written after the render block)
    render_eps = []
    if args.render_every > 0 or args.view:
        # default: episode 1 for PNG dumps, ALL episodes whenever --view is
        # on (the reference replays every eval episode,
        # testing_main.py:62-80) — the view semantic wins when combined
        spec = args.render_episodes or (
            ",".join(str(i) for i in range(1, B + 1)) if args.view
            else "1")
        try:
            render_eps = [int(e) for e in spec.split(",")]
        except ValueError:
            print(f"error: --render-episodes {spec!r} is not "
                  "a comma-separated list of integers", file=sys.stderr)
            return 2
        bad = [e for e in render_eps if not 1 <= e <= B]
        if bad:
            print(f"error: --render-episodes {bad} out of range 1..{B} "
                  "(--episodes)", file=sys.stderr)
            return 2

    model = ActorCritic()
    if args.params_npz:
        from acas2d_tpu.utils.params_io import load_params_npz
        params = jax.tree.map(jnp.asarray, load_params_npz(args.params_npz))
        print(f"loaded params artifact {args.params_npz}", file=sys.stderr)
    elif args.run:
        # Raw (structure-free) restore: eval needs only params + the step
        # tag, and must work regardless of the training run's optimizer
        # topology (e.g. --anneal-lr schedules change the opt_state pytree).
        ckpt = CheckpointManager(os.path.join(args.run, "checkpoints"))
        raw = ckpt.restore_raw(step=args.step, best=args.best)
        params = jax.tree.map(jnp.asarray, raw["params"])
        tag = raw.get("iteration", raw.get("global_step", -1))
        print(f"loaded checkpoint (iteration {int(tag)})", file=sys.stderr)
    else:
        print("error: one of --run / --params-npz is required",
              file=sys.stderr)
        return 2

    spawner = MersenneSpawner(P, skip_episodes=args.skip_episodes)
    inits = spawner.spawn_batch(B)
    psi = np.array([i.player_psi for i in inits])
    tx = np.stack([i.traffic_x for i in inits])
    ty = np.stack([i.traffic_y for i in inits])
    tv = np.stack([i.traffic_v for i in inits])
    tpsi = np.stack([i.traffic_psi for i in inits])
    nt = np.array([i.num_traffic for i in inits])

    def policy(o):
        mean, _, _ = model.apply(params, o.astype(jnp.float32))
        return jnp.clip(mean[..., 0], -1.0, 1.0).astype(dtype)

    @jax.jit
    def run(psi, tx, ty, tv, tpsi, nt):
        def one(psi, tx, ty, tv, tpsi, nt):
            state, obs = core.reset_from(psi, tx, ty, tv, tpsi, nt, P, dtype)
            init = telemetry.initial_telemetry(state, P)
            _, tel = telemetry.rollout_telemetry_policy(state, obs, T, policy, P)
            return init, tel
        return jax.vmap(one)(psi, tx, ty, tv, tpsi, nt)

    init, tel = jax.device_get(run(psi, tx, ty, tv, tpsi, nt))

    episodes = []
    for b in range(B):
        tel_b = jax.tree.map(lambda x: x[b], tel)
        init_b = {k: v[b] for k, v in init.items()}
        done_idx = np.nonzero(np.asarray(tel_b.done))[0]
        k = int(done_idx[0]) + 1 if done_idx.size else T
        rec = episode_csv.episode_records(init_b, tel_b, k, int(nt[b]))
        episodes.append(rec)
        print(f"Episode {b+1:<3}: Time steps: {k-1:<7} - "
              f"Outcome: {rec['Outcome']:<10} - "
              f"Total Reward = {rec['Total Reward']}")

    if args.render_every > 0:
        frames_dir = args.render_dir or os.path.join(args.run or ".", "frames")
        for e in render_eps:
            b = e - 1
            tel_b = jax.tree.map(lambda x: np.asarray(x[b]), tel)
            ep_dir = os.path.join(frames_dir, f"episode_{e:03d}")
            os.makedirs(ep_dir, exist_ok=True)
            n_frames = 0
            for t, frame in episode_frames(tel_b, int(nt[b]), tv[b, :1],
                                           tpsi[b, :1], P,
                                           args.render_every, e):
                import matplotlib.image as mpimg
                mpimg.imsave(os.path.join(ep_dir, f"step_{t:04d}.png"), frame)
                n_frames += 1
            print(f"wrote {n_frames} frames to {ep_dir}", file=sys.stderr)

    out = args.out or os.path.join(args.run or ".", f"eval_{B}.csv")
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    df = episode_csv.to_dataframe(episodes, episode_csv.FULL_COLUMNS)
    df.to_csv(out, index=False)

    rewards = [e["Total Reward"] for e in episodes]
    outcomes = [e["Outcome"] for e in episodes]
    print(f"\n{B} episodes | Goal {outcomes.count('Goal')} / "
          f"Collision {outcomes.count('Collision')} / "
          f"Timeout {outcomes.count('Timeout')} | "
          f"mean reward {np.mean(rewards):.2f} +/- {np.std(rewards):.2f} | "
          f"mean steps {np.mean([e['Time Steps'] for e in episodes]):.2f}",
          file=sys.stderr)
    print(f"wrote {out}", file=sys.stderr)

    if args.view:
        # after the CSV: a closed window / Ctrl-C must not lose the eval
        def _iters():
            for e in render_eps:
                b = e - 1
                tel_b = jax.tree.map(lambda x: np.asarray(x[b]), tel)
                yield e, episode_frames(tel_b, int(nt[b]), tv[b, :1],
                                        tpsi[b, :1], P, 1, e)
        try:
            shown = view_episodes(_iters(), fps=args.view_fps)
            print(f"replayed {len(render_eps)} episode(s), {shown} frames",
                  file=sys.stderr)
        except KeyboardInterrupt:
            print("view interrupted", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
