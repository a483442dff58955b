#!/usr/bin/env python
"""Train any README variant by config name.

Replaces the reference's seven near-identical entry scripts with one driver:

  python scripts/train.py --config mnist_ode --data data/rot-mnist.npz \
      --workdir runs/mnist_ode
  python scripts/train.py --config ucf_ode --data data/ucf101-pack ...
  python scripts/train.py --config mnist_ode --synthetic --steps 3   # dry run

Configs: mnist_{ode,sde,cde,ode_rnn,gru,ode_wgan,ode_noise}, ucf_ode,
ucf_wgan_gp_128 (see ganode_tpu/utils/config.py).
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--workdir", default=None)
    p.add_argument("--data", default=None)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--synthetic", action="store_true",
                   help="run on synthetic data (smoke/dry-run mode)")
    p.add_argument("--mesh", default=None,
                   help="device mesh for the step, e.g. 'data=8' (DP) or "
                        "'data=4,seq=2' (DP x sequence-parallel over the frame "
                        "axis); params replicated, batches sharded, gradient "
                        "psums over ICI. On CPU, export "
                        "XLA_FLAGS=--xla_force_host_platform_device_count=N "
                        "for virtual devices")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--set", dest="sets", action="append", default=[],
                   metavar="FIELD=VALUE",
                   help="override any ExperimentConfig field, typed from the "
                        "dataclass (e.g. --set ngf=8 --set ema_decay=0.999); "
                        "repeatable")
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from ganode_tpu.train.runner import run_training
    from ganode_tpu.utils.config import get_config, overrides_from_strings

    overrides = {}
    if args.data:
        overrides["data_path"] = args.data
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    if args.mesh:
        overrides["mesh"] = args.mesh
    try:
        overrides.update(overrides_from_strings(args.sets))
    except ValueError as e:
        p.error(f"--set {e}")
    config = get_config(args.config, **overrides)

    workdir = args.workdir or os.path.join("runs", config.name)
    print(f"config: {dataclasses.asdict(config)}")
    state, metrics = run_training(
        config, workdir, steps=args.steps,
        synthetic=args.synthetic, resume=args.resume)
    if "preempted" in metrics:
        print(f"preempted at step {int(state.step)} (checkpointed); "
              f"rerun with --resume to continue bit-deterministically")
    else:
        print(f"done at step {int(state.step)}: {metrics}")


if __name__ == "__main__":
    main()
