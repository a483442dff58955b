"""Pipelined trunk serving: split the deconv trunks into pure eval-mode stages
for ``parallel.pipeline_apply`` (pipeline parallelism over a 'pipe' mesh axis).

The PP object in this model family is the generator trunk's activation
pyramid: decoding the north-star 128x128 geometry, one (B*T)-frame batch's
intermediate feature maps dwarf the weights, and a latency-bound serving step
(small batch, deep trunk) can spread stages over chips that each hold one
stage's weights and one in-flight microbatch (rationale + measured training
counter-argument in docs/DESIGN.md). Stages run the *eval-mode* forward —
BatchNorm in running-average mode, exactly the arithmetic of
``gen.apply(..., train=False)`` that every eval/serving site uses — so the
pipelined decode is bit-compatible with the sequential serving path it shards.

Supports the three deconv trunk geometries (dcgan64 / dcgan128 / mnist28,
reference models/mocogan.py:200-215 and mocogan_ode.py:66-84). The GRes trunks
carry spectral-norm power-iteration state whose per-forward update is
inherently sequential across the whole trunk; they serve via DP/TP instead.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _trunk_units(trunk: str, n_channels: int, ngf: int):
    """The per-layer unit table: (deconv cfg, has_bn, activation)."""
    if trunk == "dcgan64":
        chain = [(ngf * 8, 4, 1, 0), (ngf * 4, 4, 2, 1), (ngf * 2, 4, 2, 1),
                 (ngf, 4, 2, 1), (n_channels, 4, 2, 1)]
    elif trunk == "dcgan128":
        chain = [(ngf * 16, 4, 1, 0), (ngf * 8, 4, 2, 1), (ngf * 4, 4, 2, 1),
                 (ngf * 2, 4, 2, 1), (ngf, 4, 2, 1), (n_channels, 4, 2, 1)]
    elif trunk == "mnist28":
        chain = [(ngf * 8, 4, 1, 0), (ngf * 4, 4, 2, 1), (ngf * 2, 4, 2, 1),
                 (ngf, 4, 2, 1)]
    else:
        raise ValueError(f"trunk {trunk!r} has no pipeline staging "
                         "(deconv trunks only)")
    units = []
    last = len(chain) - 1
    for i, cfg in enumerate(chain):
        is_last = i == last and trunk != "mnist28"
        units.append({
            "deconv": cfg,
            "bn": not is_last,
            "act": "tanh" if is_last else "relu",
            "names": (f"ConvTranspose_{i}",
                      None if is_last else f"BatchNorm_{i}"),
        })
    if trunk == "mnist28":
        # 1x1 conv + 2px crop + tanh (reference mocogan_ode.py:82 k1s1p2)
        units.append({"deconv": None, "bn": False, "act": "tanh",
                      "names": ("Conv_0", None)})
    return units


def _apply_unit(unit, uparams, x):
    if unit["deconv"] is not None:
        features, kernel, stride, torch_padding = unit["deconv"]
        pad = kernel - 1 - torch_padding
        x = nn.ConvTranspose(
            features, (kernel, kernel), strides=(stride, stride),
            padding=((pad, pad), (pad, pad)), use_bias=False,
        ).apply({"params": uparams["deconv"]}, x)
    else:  # mnist28 head: 1x1 conv then crop 2 px per side
        x = nn.Conv(uparams["conv_features"].shape[0], (1, 1),
                    use_bias=False).apply({"params": uparams["deconv"]}, x)
        x = x[:, 2:-2, 2:-2, :]
    if unit["bn"]:
        x = nn.BatchNorm(use_running_average=True, momentum=0.9,
                         epsilon=1e-5).apply(
            {"params": uparams["bn"], "batch_stats": uparams["stats"]}, x)
    return nn.relu(x) if unit["act"] == "relu" else jnp.tanh(x)


def trunk_stage_fns(trunk: str, n_channels: int, ngf: int,
                    trunk_params, trunk_stats, n_stages: int):
    """Split a deconv trunk into ``n_stages`` contiguous stage functions.

    Returns (stage_fns, stage_params): pure fns ``fn(params, z) -> h`` whose
    composition equals the trunk's eval-mode forward on z (B', 1, 1, dim_z) in
    float32, plus the per-stage param pytrees (each stage holds ONLY its
    layers' weights — that is what PP shards).
    """
    units = _trunk_units(trunk, n_channels, ngf)
    if not 1 <= n_stages <= len(units):
        raise ValueError(f"n_stages must be in [1, {len(units)}]")

    def unit_params(u):
        conv_name, bn_name = u["names"]
        p = {"deconv": trunk_params[conv_name]}
        if u["deconv"] is None:
            # static marker for the 1x1 head's feature count (leaf so the
            # stage params stay one pytree)
            p["conv_features"] = jnp.zeros((n_channels,))
        if u["bn"]:
            p["bn"] = trunk_params[bn_name]
            p["stats"] = trunk_stats[bn_name]
        return p

    groups = np.array_split(np.arange(len(units)), n_stages)
    stage_fns, stage_params = [], []
    for idx in groups:
        sub = [units[i] for i in idx]
        stage_params.append([unit_params(u) for u in sub])

        def fn(params, x, sub=sub):
            for u, up in zip(sub, params):
                x = _apply_unit(u, up, x)
            return x

        stage_fns.append(fn)
    return stage_fns, stage_params


def generator_trunk_stages(gen, variables, n_stages: int):
    """Stage the trunk of a VideoGenerator from its variables pytree."""
    return trunk_stage_fns(
        gen.trunk, gen.n_channels, gen.ngf,
        variables["params"]["main"],
        variables.get("batch_stats", {}).get("main", {}),
        n_stages,
    )


def pipelined_sample_videos(gen, variables, n: int, mesh, *,
                            axis: str = "pipe", data_axis=None,
                            n_microbatches=None, sample_key=None):
    """Eval-mode ``sample_videos`` with the trunk decoded through the pipeline:
    the motion/content latents are computed replicated (they are KB-sized),
    then the B*T frame batch streams through the staged trunk.

    Matches ``gen.apply(..., method='sample_videos', train=False)`` under the
    same sample key.
    """
    from ..parallel.pipeline import pipeline_apply

    n_stages = mesh.shape[axis]
    stage_fns, stage_params = generator_trunk_stages(gen, variables, n_stages)
    z, labels = gen.apply(variables, n, gen.video_length, train=False,
                          method="sample_z_video",
                          rngs={"sample": sample_key})
    h = pipeline_apply(stage_fns, stage_params, z[:, None, None, :], mesh,
                       axis=axis, data_axis=data_axis,
                       n_microbatches=n_microbatches)
    return h.reshape(n, gen.video_length, *h.shape[1:]), labels
