"""MBRL training entry point.

Default: MBPO with the iVideoGPT world model (reference
mbrl/train_metaworld_mbpo.py:389-406). With --drq_only: the model-free
DrQ-v2 baseline (reference mbrl/train_metaworld_drq.py:218-238).

Dataclass config with CLI overrides replaces hydra; auto-resumes from
snapshot.pkl if present in the work dir.

Usage:
  python mbrl_train.py --task_name coffee-push --work_dir log_mbrl/run1
  python mbrl_train.py --drq_only --task_name coffee-push --work_dir log_drq
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    from ivideogpt_tpu.mbrl.mbpo import MBPOConfig, Workspace
    import jax
    from ivideogpt_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("IVG_JAX_CACHE", "/tmp/ivg_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # allow_abbrev=False: explicit-flag detection below reads raw sys.argv,
    # so a prefix abbreviation (--num_train for --num_train_frames) would
    # be accepted by argparse yet missed by the detection — the preset
    # would silently clobber the user's value
    p = argparse.ArgumentParser(allow_abbrev=False)
    p.add_argument("--work_dir", type=str, default="log_mbrl/run")
    p.add_argument("--task_preset", type=str, default=None,
                   help="reference task budget in one flag (mirrors "
                   "mbrl/cfgs/task/*.yaml): coffee_push, hammer, door_lock, "
                   "plate_slide, handle_pull_side, "
                   "button_press_topdown_wall, or easy/medium/hard. "
                   "Explicit CLI flags override preset values.")
    p.add_argument("--fake_env", action="store_true",
                   help="random-pixel env instead of Metaworld (smoke runs "
                        "without MuJoCo)")
    p.add_argument("--drq_only", action="store_true",
                   help="model-free DrQ-v2 baseline, no world model "
                        "(reference mbrl/train_metaworld_drq.py)")
    # expose every MBPOConfig field as a flag (superset of DrQConfig)
    for f in dataclasses.fields(MBPOConfig):
        kind = f.type if isinstance(f.type, type) else str
        if f.default is None or f.type in ("Optional[str]",):
            p.add_argument(f"--{f.name}", type=str, default=f.default)
        elif isinstance(f.default, bool):
            p.add_argument(f"--{f.name}", type=lambda s: s.lower() != "false",
                           default=f.default)
        elif isinstance(f.default, int):
            p.add_argument(f"--{f.name}", type=int, default=f.default)
        elif isinstance(f.default, float):
            p.add_argument(f"--{f.name}", type=float, default=f.default)
        else:
            p.add_argument(f"--{f.name}", type=str, default=f.default)
    args = p.parse_args()

    if args.drq_only:
        from ivideogpt_tpu.mbrl.drq_workspace import DrQConfig, DrQWorkspace
        cfg_cls, ws_cls = DrQConfig, DrQWorkspace
    else:
        cfg_cls, ws_cls = MBPOConfig, Workspace
    cfg_fields = {f.name for f in dataclasses.fields(cfg_cls)}
    cfg = cfg_cls(**{k: v for k, v in vars(args).items()
                     if k in cfg_fields})
    if args.task_preset:
        from ivideogpt_tpu.mbrl.mbpo import apply_task_preset
        # flags the user typed explicitly win over the preset
        explicit = {a[2:].split("=")[0] for a in sys.argv[1:]
                    if a.startswith("--")}
        cfg = apply_task_preset(cfg, args.task_preset,
                                skip=explicit & cfg_fields)
    # underscores->hyphens for metaworld env keys
    # (reference train_metaworld_mbpo.py:69)
    cfg = cfg.replace(task_name="-".join(cfg.task_name.split("_")))
    os.makedirs(args.work_dir, exist_ok=True)
    with open(os.path.join(args.work_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())
    from ivideogpt_tpu.utils.provenance import write_provenance
    write_provenance(args.work_dir, args)  # cmd.json + src_diff.patch

    env_fn = None
    if args.fake_env:
        from ivideogpt_tpu.mbrl.fake_env import make_fake
        env_fn = lambda seed: make_fake(  # noqa: E731
            cfg.task_name, cfg.frame_stack, cfg.action_repeat, seed,
            cfg.camera, cfg.duration, cfg.succ_bonus,
            action_dim=getattr(cfg, "wm_action_dim", 4))
    ws = ws_cls(cfg, work_dir=args.work_dir, env_fn=env_fn)
    snapshot = os.path.join(args.work_dir, "snapshot.pkl")
    if os.path.exists(snapshot):
        print(f"resuming: {snapshot}")
        ws.load_snapshot()
    ws.train()


if __name__ == "__main__":
    main()
