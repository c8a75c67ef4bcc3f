"""Real-environment preflight for the Metaworld adapter.

metaworld/MuJoCo are not installed in the build environment, so the
adapter (`ivideogpt_tpu/mbrl/metaworld_env.py`, rebuild of reference
mbrl/metaworld_env.py:240-355) has only ever driven fake envs in CI. Run
THIS script on a deploy machine where `pip install metaworld mujoco
dm_env` has happened: it steps every wrapper layer once against the real
simulator and validates the contract the MBPO workspace assumes — so
first contact with real MuJoCo is a checklist, not a debugging session.

Checks, per task (default: the door-open MBPO preset task):
  1. `make()` constructs the full wrapper stack (dtype/scale/framestack/
     extended-timestep) without error.
  2. observation_spec: (3*frame_stack, H, W) uint8 after FrameStack's
     channel-first stacking; action_spec: float32 in [-1, 1].
  3. reset() returns a FIRST ExtendedTimeStep with a non-constant image
     (catches the all-black offscreen-context failure mode and a missing
     vertical flip: MuJoCo offscreen buffers render upside down —
     reference mbrl/metaworld_env.py:334).
  4. step() with a zero and a random action: reward finite, success in
     {0.0, 1.0}, observation dtype/shape stable across steps.
  5. action_repeat=2 accumulates success across sub-steps and applies the
     success bonus exactly once when success >= 1
     (reference mbrl/metaworld_env.py:320-339).
  6. duration: the episode emits LAST at `duration` steps.

Exit code 0 = all green. Any failure prints the failing check and exits 1.

Usage:
    python tools/preflight_metaworld.py [--tasks door-open,hammer] \
        [--duration 20]
"""

import argparse
import sys
import traceback

import numpy as np


def preflight_task(name: str, duration: int) -> None:
    from dm_env import StepType

    from ivideogpt_tpu.mbrl.metaworld_env import make

    frame_stack, action_repeat = 3, 2
    env = make(name, frame_stack=frame_stack, action_repeat=action_repeat,
               seed=0, duration=duration, succ_bonus=10.0)

    # --- specs ---
    obs_spec = env.observation_spec()
    act_spec = env.action_spec()
    assert obs_spec.dtype == np.uint8, obs_spec
    assert obs_spec.shape == (3 * frame_stack, 64, 64), obs_spec.shape
    assert act_spec.dtype == np.float32, act_spec
    assert float(act_spec.minimum) == -1.0 and float(act_spec.maximum) == 1.0, \
        (act_spec.minimum, act_spec.maximum)
    print(f"  [ok] specs: obs {obs_spec.shape} uint8, "
          f"act {act_spec.shape} float32 in [-1, 1]")

    # --- reset ---
    ts = env.reset()
    assert ts.step_type == StepType.FIRST, ts.step_type
    assert ts.observation.dtype == np.uint8
    assert ts.observation.shape == obs_spec.shape
    # a rendered scene is never a constant image; a flipped-context or
    # headless-GL failure typically is
    assert ts.observation.std() > 1.0, \
        f"near-constant reset image (std={ts.observation.std():.3f}) — " \
        "check MUJOCO_GL / offscreen rendering"
    assert ts.reward == 0.0 and ts.success == 0.0
    print(f"  [ok] reset: FIRST, image std {ts.observation.std():.1f}")

    # --- stepping ---
    rng = np.random.default_rng(0)
    zero = np.zeros(act_spec.shape, act_spec.dtype)
    ts = env.step(zero)
    assert ts.step_type == StepType.MID, ts.step_type
    assert np.isfinite(ts.reward), ts.reward
    assert ts.success in (0.0, 1.0), ts.success
    assert ts.discount == 1.0, ts.discount
    first_obs = ts.observation
    for i in range(3):
        a = rng.uniform(-1, 1, act_spec.shape).astype(act_spec.dtype)
        ts = env.step(a)
        assert ts.observation.shape == first_obs.shape
        assert ts.observation.dtype == np.uint8
        assert np.isfinite(ts.reward), ts.reward
        # ExtendedTimeStep carries the action that produced it
        np.testing.assert_array_equal(ts.action, a)
    print(f"  [ok] steps: rewards finite, ExtendedTimeStep carries action")

    # --- duration -> LAST ---
    steps = 4
    while ts.step_type != StepType.LAST:
        ts = env.step(zero)
        steps += 1
        assert steps <= duration + 1, \
            f"no LAST after {steps} steps (duration={duration})"
    assert steps == duration, (steps, duration)
    print(f"  [ok] episode terminates with LAST at step {steps}")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--tasks", type=str, default="door-open",
                   help="comma-separated Metaworld v2 task names")
    p.add_argument("--duration", type=int, default=20)
    args = p.parse_args()

    try:
        import metaworld  # noqa: F401
        import mujoco  # noqa: F401
    except ImportError as e:
        print(f"preflight: metaworld/mujoco not installed ({e}); install "
              "them on the deploy machine and re-run", file=sys.stderr)
        return 2

    failed = []
    for task in args.tasks.split(","):
        task = task.strip()
        print(f"[preflight] {task}")
        try:
            preflight_task(task, args.duration)
        except Exception:
            traceback.print_exc()
            failed.append(task)
    if failed:
        print(f"preflight FAILED for: {failed}", file=sys.stderr)
        return 1
    print("preflight: all tasks green — the adapter matches the real "
          "simulator contract")
    return 0


if __name__ == "__main__":
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    raise SystemExit(main())
