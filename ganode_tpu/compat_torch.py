"""Import reference (chechaohp/gan-ode) torch checkpoints into this framework.

The reference trains in PyTorch and checkpoints
``torch.save({'epoch', 'model_state_dict': [gen, disVid, disImg],
'optimizer_state_dict': [...]})`` every 1000 G-steps (reference
mnist_moco_ode.py:175-190, resume order at :92-103). This module converts
those state_dicts into this framework's flax param / batch-stats pytrees so a
reference user can bring trained weights along: evaluate, sample, or keep
training here without re-training from scratch.

Everything is pure name-and-layout mapping over numpy arrays — torch is only
needed to *unpickle* a ``.ckpt`` file (``load_reference_checkpoint``), never
for the conversion itself, so the conversion is testable and usable on hosts
without torch when the state_dict is already materialized.

Layout rules (verified by executed-reference golden tests in
tests/test_compat_torch.py — the reference model is run, its state_dict
converted, and the forwards compared):

* ``nn.Linear``      weight (out, in)            -> Dense kernel = weight.T
* ``nn.Conv2d``      weight (Co, Ci, kh, kw)     -> kernel (kh, kw, Ci, Co)
* ``nn.Conv3d``      weight (Co, Ci, kt, kh, kw) -> kernel (kt, kh, kw, Ci, Co)
* ``nn.ConvTranspose2d`` weight (Ci, Co, kh, kw) -> kernel (kh, kw, Ci, Co)
  **spatially flipped**: torch's transposed conv is the adjoint of a
  correlation (it convolves with the flipped kernel), while flax's
  ``ConvTranspose`` runs an un-flipped fractionally-strided correlation
  (``lax.conv_transpose(transpose_kernel=False)``).
* ``nn.BatchNorm*``  weight/bias -> scale/bias; running_mean/var -> the
  'batch_stats' collection (both sides use eps=1e-5).
* ``nn.GRUCell``     weight_ih (3h, in) rows [r, z, n] -> wi = weight_ih.T
  (our GRUCell is torch-gate-order parity, tests/test_nn.py).

Reference module names mapped per variant (state_dict key prefixes):
``main.{0,3,6,9,12}`` deconv trunk + ``main.{1,4,7,10}`` BN
(models/mocogan.py:200-215, mocogan_ode.py:66-84), ``recurrent`` GRU
(mocogan.py:198), ``linear.{0,2}`` warm-up MLP and ``ode_fn.fn.{0,2}`` RHS
(mocogan_ode.py:10-14,30-35), ``ode_fn.drift_fn/diffusion_fn.{0,2}``
(mocogan_sde.py:10-19), ``ode_fn.linear1/linear2`` + ``f.{0,2}``
(mocogan_cde.py:20-21,52-57). Unused inherited submodules (every ODE variant
still carries a ``recurrent`` GRU it never calls) are ignored.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

__all__ = [
    "load_reference_checkpoint",
    "import_generator",
    "import_image_discriminator",
    "import_video_discriminator",
    "import_gan_state",
]


def _np(a) -> np.ndarray:
    """torch tensor / numpy array -> float32 numpy (no torch import needed)."""
    if hasattr(a, "detach"):
        a = a.detach().cpu().numpy()
    return np.asarray(a, np.float32)


def _dense(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _conv2d(sd, prefix):
    return {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}


def _conv3d(sd, prefix):
    return {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 4, 1, 0)}


def _deconv2d(sd, prefix):
    # (Ci, Co, kh, kw) -> (kh, kw, Ci, Co), spatially flipped (see module doc).
    w = _np(sd[f"{prefix}.weight"]).transpose(2, 3, 0, 1)
    return {"kernel": w[::-1, ::-1].copy()}


def _bn(sd, prefix) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    params = {"scale": _np(sd[f"{prefix}.weight"]),
              "bias": _np(sd[f"{prefix}.bias"])}
    stats = {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])}
    return params, stats


def _gru(sd, prefix) -> Dict[str, np.ndarray]:
    return {"wi": _np(sd[f"{prefix}.weight_ih"]).T,
            "wh": _np(sd[f"{prefix}.weight_hh"]).T,
            "bi": _np(sd[f"{prefix}.bias_ih"]),
            "bh": _np(sd[f"{prefix}.bias_hh"])}


def _mlp2(sd, p0, p1) -> Dict[str, Any]:
    return {"Dense_0": _dense(sd, p0), "Dense_1": _dense(sd, p1)}


def _motion_params(sd: Dict[str, Any], variant: str) -> Dict[str, Any]:
    if variant == "gru":
        return {"gru": _gru(sd, "recurrent")}
    if variant == "ode":
        return {"WarmupMLP_0": _mlp2(sd, "linear.0", "linear.2"),
                "ode_fn": _mlp2(sd, "ode_fn.fn.0", "ode_fn.fn.2")}
    if variant == "sde":
        return {"WarmupMLP_0": _mlp2(sd, "linear.0", "linear.2"),
                "drift_fn": _mlp2(sd, "ode_fn.drift_fn.0", "ode_fn.drift_fn.2"),
                "diffusion_fn": _mlp2(sd, "ode_fn.diffusion_fn.0",
                                      "ode_fn.diffusion_fn.2")}
    if variant == "cde":
        return {"init_net": _mlp2(sd, "f.0", "f.2"),
                "cde_fn": _mlp2(sd, "ode_fn.linear1", "ode_fn.linear2")}
    if variant == "ode_rnn":
        return {"gru": _gru(sd, "recurrent"),
                "ode_fn": _mlp2(sd, "ode_fn.fn.0", "ode_fn.fn.2")}
    raise ValueError(f"unknown motion variant {variant!r}")


def import_generator(sd: Dict[str, Any], *, variant: str = "ode",
                     trunk: str = "mnist28",
                     ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference VideoGenerator* state_dict -> (params, batch_stats).

    ``trunk``: 'mnist28' (reference mocogan_ode.py:66-84 — final k1s1p2
    deconv becomes our 1x1 conv, same weights) or 'dcgan64'
    (mocogan.py:200-215 — final layer is a k4s2p1 deconv).
    """
    params: Dict[str, Any] = {"motion": _motion_params(sd, variant)}
    stats: Dict[str, Any] = {}
    main_p: Dict[str, Any] = {}
    main_s: Dict[str, Any] = {}
    # four deconv+BN stages shared by both trunks: main.{0,3,6,9}/{1,4,7,10}
    for i, (conv_idx, bn_idx) in enumerate(((0, 1), (3, 4), (6, 7), (9, 10))):
        main_p[f"ConvTranspose_{i}"] = _deconv2d(sd, f"main.{conv_idx}")
        bn_p, bn_s = _bn(sd, f"main.{bn_idx}")
        main_p[f"BatchNorm_{i}"] = bn_p
        main_s[f"BatchNorm_{i}"] = bn_s
    if trunk == "mnist28":
        # ConvTranspose2d(ngf, n_ch, k=1, s=1, p=2) == 1x1 conv + 2px crop
        # (our MNISTTrunk28); a 1x1 kernel needs no spatial flip.
        w = _np(sd["main.12.weight"]).transpose(2, 3, 0, 1)
        main_p["Conv_0"] = {"kernel": w}
    elif trunk == "dcgan64":
        main_p["ConvTranspose_4"] = _deconv2d(sd, "main.12")
    else:
        raise ValueError(f"unsupported trunk {trunk!r} for reference import")
    params["main"] = main_p
    stats["main"] = main_s
    return params, stats


def import_image_discriminator(sd: Dict[str, Any], *, kind: str = "patch",
                               ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """PatchImageDiscriminator (mocogan.py:66-93) or ImageDiscriminator
    (:32-63) state_dict -> (params, batch_stats).

    torch Sequential indices skip the parameter-less Noise/LeakyReLU layers;
    the conv/BN positions per kind are fixed by the reference definitions.
    """
    if kind == "patch":
        convs, bns = (1, 4, 8, 12), (5, 9)
    elif kind == "full":
        convs, bns = (1, 4, 8, 12, 15), (5, 9, 13)
    else:
        raise ValueError(f"unknown image discriminator kind {kind!r}")
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i, c in enumerate(convs):
        params[f"Conv_{i}"] = _conv2d(sd, f"main.{c}")
    for i, b in enumerate(bns):
        bn_p, bn_s = _bn(sd, f"main.{b}")
        params[f"BatchNorm_{i}"] = bn_p
        stats[f"BatchNorm_{i}"] = bn_s
    return params, stats


def import_video_discriminator(sd: Dict[str, Any], *, kind: str = "full",
                               ksize: int = 4,
                               ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """VideoDiscriminator / CategoricalVideoDiscriminator (mocogan.py:129-182)
    or PatchVideoDiscriminator (:96-126) state_dict -> (params, batch_stats).

    Our ksize-4 discriminators (and the patch video discriminator) swap the
    first conv for FastGradConv3D (same arithmetic, MXU-folded gradient), so
    the first kernel lands under 'FastGradConv3D_0' and the remaining convs
    renumber from Conv_0.
    """
    if kind in ("full", "categorical"):
        convs, bns = (1, 4, 8, 12, 15), (5, 9, 13)
        fast_first = ksize == 4
    elif kind == "patch":
        convs, bns = (1, 4, 8, 11), (5, 9)
        fast_first = True
    else:
        raise ValueError(f"unknown video discriminator kind {kind!r}")
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    if fast_first:
        names = ["FastGradConv3D_0"] + [f"Conv_{i}"
                                        for i in range(len(convs) - 1)]
    else:
        names = [f"Conv_{i}" for i in range(len(convs))]
    for name, c in zip(names, convs):
        params[name] = _conv3d(sd, f"main.{c}")
    for i, b in enumerate(bns):
        bn_p, bn_s = _bn(sd, f"main.{b}")
        params[f"BatchNorm_{i}"] = bn_p
        stats[f"BatchNorm_{i}"] = bn_s
    if kind == "categorical":
        # our CategoricalVideoDiscriminator nests a VideoDiscriminator body
        params = {"VideoDiscriminator_0": params}
        stats = {"VideoDiscriminator_0": stats}
    return params, stats


def load_reference_checkpoint(path: str) -> Dict[str, Any]:
    """Unpickle a reference ``state_normal{epoch}.ckpt`` (torch required)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=True)


_BUFFER_SUFFIXES = ("running_mean", "running_var", "num_batches_tracked")


def _moment_sds(model_sd: Dict[str, Any], opt_sd: Dict[str, Any]):
    """torch Adam state -> two fake state_dicts valued with exp_avg / exp_avg_sq.

    torch's ``state_dict()`` emits each submodule's parameters before its
    buffers, in registration order — the same traversal ``parameters()`` uses —
    so the state_dict keys minus the BN buffers ARE the optimizer's parameter
    order (the reference passes ``model.parameters()`` straight to Adam,
    mnist_moco_ode.py:86-88). Valuing a copy of the model state_dict with the
    moments lets the SAME name/layout importers convert them (moments are
    elementwise with their parameters, so the deconv flip / transpose rules
    apply identically). Buffer entries keep their model values — the importers
    read BN stats from them but the moment trees never include stats.
    """
    names = [k for k in model_sd if not k.endswith(_BUFFER_SUFFIXES)]
    order = [i for g in opt_sd["param_groups"] for i in g["params"]]
    state = opt_sd["state"]
    if len(order) != len(names):
        raise ValueError(
            f"optimizer has {len(order)} params, model has {len(names)}")
    avg_sd, sq_sd = dict(model_sd), dict(model_sd)
    count = 0
    for name, idx in zip(names, order):
        s = state.get(idx)
        if s is None:
            # torch Adam state is lazy: a parameter that never received a
            # gradient (e.g. the ODE variants' unused inherited GRU) has no
            # entry — its moments are zero, matching optax's init
            z = np.zeros_like(_np(model_sd[name]))
            avg_sd[name], sq_sd[name] = z, z
            continue
        avg_sd[name] = s["exp_avg"]
        sq_sd[name] = s["exp_avg_sq"]
        count = max(count, int(s["step"]))
    return avg_sd, sq_sd, count


def _replace_adam_moments(opt_state, mu, nu, count):
    """Swap the (mu, nu, count) of every ScaleByAdamState inside an optax
    chain state (our reference_adam = add_decayed_weights + adam, matching
    torch Adam's coupled weight decay)."""
    import jax
    import jax.numpy as jnp
    import optax

    def cast(v, like):
        v = jnp.asarray(v, like.dtype)
        if v.shape != like.shape:
            raise ValueError(f"moment shape {v.shape} != {like.shape}")
        return v

    replaced = []

    def rec(node):
        if isinstance(node, optax.ScaleByAdamState):
            replaced.append(True)
            return node._replace(
                count=jnp.asarray(count, node.count.dtype),
                mu=jax.tree.map(lambda like, v: cast(v, like), node.mu, mu),
                nu=jax.tree.map(lambda like, v: cast(v, like), node.nu, nu))
        if isinstance(node, tuple):
            items = [rec(x) for x in node]
            # NamedTuple states take positional fields; plain tuples take one
            # iterable
            return (type(node)(*items) if hasattr(node, "_fields")
                    else tuple(items))
        return node

    new_state = rec(opt_state)
    if not replaced:
        raise ValueError("no ScaleByAdamState found in opt_state")
    return new_state


def import_gan_state(ckpt: Dict[str, Any], state, config, *,
                     import_optimizer: bool = True):
    """Reference checkpoint dict -> our ``GANState`` with imported weights.

    ``ckpt`` is the dict the reference saves ({'epoch', 'model_state_dict':
    [gen, disVid, disImg], 'optimizer_state_dict': [genOpt, disVidOpt,
    disImgOpt]}); ``state`` a freshly-initialized GANState from the matching
    config (it supplies optimizer-state / EMA / key structure). When the
    checkpoint carries torch-Adam moments and ``import_optimizer`` is true
    they are imported too (exp_avg/exp_avg_sq -> the chain's ScaleByAdamState
    mu/nu, same layout transforms as the parameters; our ``reference_adam``
    reproduces torch's coupled weight decay, so fine-tuning continues the
    reference's optimizer trajectory rather than restarting Adam). Returns the
    new state with step = the reference 'epoch' (one reference "epoch" == one
    G-step, mnist_moco_ode.py:113).
    """
    if config.video_disc not in ("full", "patch") or \
            config.image_disc not in ("full", "patch"):
        raise ValueError(
            "reference checkpoints only exist for the BN discriminators "
            f"(got video_disc={config.video_disc!r}, "
            f"image_disc={config.image_disc!r}); the SN critics are this "
            "framework's addition and have no reference counterpart")
    gen_sd, vid_sd, img_sd = ckpt["model_state_dict"]
    gen_p, gen_s = import_generator(
        gen_sd, variant=config.variant, trunk=config.trunk)
    vid_p, vid_s = import_video_discriminator(
        vid_sd, kind=config.video_disc, ksize=config.video_disc_ksize)
    img_p, img_s = import_image_discriminator(img_sd, kind=config.image_disc)

    import jax
    import jax.numpy as jnp

    def align(new, like):
        # cast/assert against the template so shape errors surface here
        flat_new = dict(_flatten(new))
        out = {}
        for path, leaf in _flatten(like):
            if path not in flat_new:
                raise KeyError(f"import missing parameter {path}")
            got = jnp.asarray(flat_new[path], leaf.dtype)
            if got.shape != leaf.shape:
                raise ValueError(
                    f"{path}: reference shape {got.shape} != ours {leaf.shape}")
            out[path] = got
        extra = set(flat_new) - {p for p, _ in _flatten(like)}
        if extra:
            raise KeyError(f"imported parameters our model lacks: {sorted(extra)}")
        return _unflatten(out)

    gen_params = align(gen_p, state.gen.params)
    new_gen = state.gen.replace(
        params=gen_params,
        batch_stats=align(gen_s, state.gen.batch_stats))
    new_vid = state.dis_vid.replace(
        params=align(vid_p, state.dis_vid.params),
        batch_stats=align(vid_s, state.dis_vid.batch_stats))
    new_img = state.dis_img.replace(
        params=align(img_p, state.dis_img.params),
        batch_stats=align(img_s, state.dis_img.batch_stats))

    opt_sds = ckpt.get("optimizer_state_dict") or [None] * 3
    if import_optimizer:
        for net, net_sd, opt_sd, imp in (
                ("gen", gen_sd, opt_sds[0],
                 lambda sd: import_generator(sd, variant=config.variant,
                                             trunk=config.trunk)),
                ("dis_vid", vid_sd, opt_sds[1],
                 lambda sd: import_video_discriminator(
                     sd, kind=config.video_disc,
                     ksize=config.video_disc_ksize)),
                ("dis_img", img_sd, opt_sds[2],
                 lambda sd: import_image_discriminator(
                     sd, kind=config.image_disc))):
            if not opt_sd or not opt_sd.get("state"):
                continue  # fresh / absent optimizer in the checkpoint
            avg_sd, sq_sd, count = _moment_sds(net_sd, opt_sd)
            cur = {"gen": new_gen, "dis_vid": new_vid, "dis_img": new_img}[net]
            mu = align(imp(avg_sd)[0], cur.params)
            nu = align(imp(sq_sd)[0], cur.params)
            cur = cur.replace(opt_state=_replace_adam_moments(
                cur.opt_state, mu, nu, count))
            if net == "gen":
                new_gen = cur
            elif net == "dis_vid":
                new_vid = cur
            else:
                new_img = cur
    return state.replace(
        gen=new_gen, dis_vid=new_vid, dis_img=new_img,
        # EMA (our addition) has no reference history: seed it at the
        # imported weights so eval sampling starts from them
        ema_params=gen_params if state.ema_params is not None else None,
        step=jnp.asarray(int(ckpt.get("epoch", 0)), state.step.dtype))


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    elif tree is not None:
        yield "/".join(prefix), tree


def _unflatten(flat: Dict[str, Any]):
    out: Dict[str, Any] = {}
    for path, leaf in flat.items():
        node = out
        keys = path.split("/")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = leaf
    return out
