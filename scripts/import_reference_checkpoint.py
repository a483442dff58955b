#!/usr/bin/env python
"""Convert a reference (chechaohp/gan-ode) torch checkpoint into this
framework's orbax layout.

The reference saves ``state_normal{epoch}.ckpt`` dicts every 1000 G-steps
(reference mnist_moco_ode.py:175-190). This script maps the three model
state_dicts into our flax pytrees (ganode_tpu.compat_torch — layouts verified
by executed-reference golden tests) and writes a normal orbax checkpoint under
``<workdir>/checkpoints``, so every downstream tool just works:

    python scripts/import_reference_checkpoint.py \
        --ckpt /path/state_normal41000.ckpt --config mnist_ode --workdir runs/imported
    python scripts/evaluate.py --config mnist_ode --workdir runs/imported ...
    python scripts/generate.py --config mnist_ode --workdir runs/imported ...
    python scripts/train.py    --config mnist_ode --workdir runs/imported --resume ...

Reference torch-Adam moments (exp_avg / exp_avg_sq) ARE imported when the
checkpoint carries them, so fine-tuning continues with the reference's
optimizer statistics; pass --fresh-optimizer to restart Adam from zeros
instead. The step counter is taken from the reference 'epoch' (== G-steps).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True,
                   help="reference state_normal{epoch}.ckpt (torch.save dict)")
    p.add_argument("--config", default="mnist_ode",
                   help="config matching the checkpoint's architecture")
    p.add_argument("--workdir", required=True,
                   help="output run directory (checkpoint lands under "
                        "<workdir>/checkpoints)")
    p.add_argument("--set", dest="sets", action="append", default=[],
                   metavar="FIELD=VALUE",
                   help="config overrides, e.g. --set ngf=64 --set ndf=64 "
                        "(must match the reference model's sizes)")
    p.add_argument("--fresh-optimizer", action="store_true",
                   help="skip the torch Adam moments; fine-tuning then "
                        "restarts Adam from zero-initialized moments")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax

    from ganode_tpu.compat_torch import (import_gan_state,
                                         load_reference_checkpoint)
    from ganode_tpu.train.runner import build_trainer
    from ganode_tpu.utils.checkpoint import CheckpointManager
    from ganode_tpu.utils.config import get_config, overrides_from_strings

    try:
        overrides = overrides_from_strings(args.sets)
    except ValueError as e:
        p.error(f"--set {e}")
    config = get_config(args.config, **overrides)

    ckpt = load_reference_checkpoint(args.ckpt)
    trainer = build_trainer(config)
    state = jax.jit(trainer.init_state)(jax.random.PRNGKey(config.seed))
    state = import_gan_state(ckpt, state, config,
                             import_optimizer=not args.fresh_optimizer)

    mgr = CheckpointManager(os.path.join(args.workdir, "checkpoints"))
    mgr.save(int(state.step), state, wait=True)
    print(f"imported reference step {int(state.step)} -> "
          f"{os.path.join(args.workdir, 'checkpoints')}")


if __name__ == "__main__":
    main()
