"""Optimizer / LR-scheduler registry with regex param groups (optax).

TPU-native counterpart of the reference's optim registry
(R2/optim/optim.py:20-28: SGD / Adam / AdamW + MultiStepLR /
CosineAnnealingLR / OneCycleLR / LambdaLR) and of its regex-driven
param-group builder (R2/src/core/yaml_config.py:134-177,
``get_optim_params``): every group in the YAML carries a regex matched
against torch-style dotted parameter names; matched params get the group's
hyper-overrides (lr / weight_decay / betas), the remainder falls into a
default group built from the optimizer's top-level settings.

Torch name compatibility: flax leaves are renamed ``kernel``/``scale`` ->
``weight`` so the shipped R2 regexes (e.g.
``'^(?=.*encoder(?=.*bias|.*norm.*weight)).*$'``) select the same
membership they do against ``model.named_parameters()``.

Everything compiles to a single ``optax.multi_transform`` — per-group
schedules are closed over at trace time, so the whole update stays one XLA
program (no Python in the step).
"""
from __future__ import annotations

import re
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import flax
import jax.numpy as jnp
import optax

__all__ = [
    "OPTIMIZERS",
    "SCHEDULERS",
    "torch_style_name",
    "build_param_groups",
    "make_schedule",
    "build_optimizer",
]


# Raw flax param leaves that are nn.Embedding WEIGHTS in the torch
# reference (R1/models/detr_speed.py query_embed, R1/models/
# position_encoding.py row/col_embed, R2/src/zoo/rtdetr/rtdetr_decoder.py
# tgt_embed): torch names them '<leaf>.weight'.
_EMBED_LEAVES = frozenset({"query_embed", "row_embed", "col_embed",
                           "tgt_embed"})


def torch_style_name(path: Tuple[str, ...]) -> str:
    """Dotted torch-style parameter name for a flax param path.

    ``kernel`` and ``scale`` leaves both surface as ``weight`` (conv/linear
    kernels and norm scales are ``.weight`` in torch); flax ``nn.Embed``'s
    ``embedding`` leaf and the raw embedding-table leaves in
    ``_EMBED_LEAVES`` surface as ``.weight`` too, so regex groups written
    against torch ``named_parameters()`` (e.g. a ``.*weight$`` no-decay
    group) select the same membership.
    """
    leaf = path[-1]
    if leaf in ("kernel", "scale", "embedding"):
        return ".".join(tuple(path[:-1]) + ("weight",))
    if leaf in _EMBED_LEAVES:
        return ".".join(path) + ".weight"
    return ".".join(path)


def build_param_groups(
    group_cfgs: Sequence[dict], params
) -> Tuple[Any, List[dict]]:
    """Assign every param to a regex group; mirror of R2 get_optim_params.

    Returns ``(labels_tree, groups)`` where ``labels_tree`` matches the
    params pytree with string labels ``"g0".."gN"`` (the last group is the
    default catch-all) and ``groups`` is the per-label hyper-override list.
    A param matching two different groups is an error, matching torch's
    duplicate-parameter rejection (the reference's final
    ``len(visited) == len(names)`` assert).
    """
    flat = flax.traverse_util.flatten_dict(params)
    names = {k: torch_style_name(k) for k in flat}
    labels: Dict[Tuple[str, ...], str] = {}
    for gi, gcfg in enumerate(group_cfgs):
        pattern = gcfg["params"]
        for k, name in names.items():
            if re.findall(pattern, name):
                if k in labels:
                    raise ValueError(
                        f"param '{name}' matched by groups "
                        f"{labels[k]} and g{gi}: patterns must be disjoint"
                    )
                labels[k] = f"g{gi}"
    default_label = f"g{len(group_cfgs)}"
    for k in names:
        labels.setdefault(k, default_label)
    groups = [dict(g) for g in group_cfgs] + [{}]
    labels_tree = flax.traverse_util.unflatten_dict(labels)
    return labels_tree, groups


# --- schedules ------------------------------------------------------------

def _multistep(base_lr, steps_per_epoch, milestones=(), gamma=0.1, **_):
    if not milestones:
        return base_lr
    return optax.piecewise_constant_schedule(
        base_lr, {int(m) * steps_per_epoch: gamma for m in milestones}
    )


def _cosine(base_lr, steps_per_epoch, T_max, eta_min=0.0, **_):
    # Torch CosineAnnealingLR (closed form): eta_min + (base - eta_min) *
    # (1 + cos(pi * t / T_max)) / 2, which CYCLES on a 2*T_max period —
    # optax.cosine_decay_schedule clamps at eta_min past T_max instead
    # (a run with epoches > T_max would silently freeze at eta_min).
    total = int(T_max) * steps_per_epoch

    def sched(step):
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * step / total))

    return sched


def _onecycle(base_lr, steps_per_epoch, max_lr=None, total_steps=None,
              epochs=None, pct_start=0.3, div_factor=25.0,
              final_div_factor=1e4, **_):
    if total_steps is None:
        total_steps = int(epochs) * steps_per_epoch
    peak = float(max_lr) if max_lr is not None else base_lr
    return optax.cosine_onecycle_schedule(
        transition_steps=int(total_steps),
        peak_value=peak,
        pct_start=float(pct_start),
        div_factor=float(div_factor),
        final_div_factor=float(final_div_factor),
    )


def _lambda(base_lr, steps_per_epoch, lr_lambda: Callable[[int], float], **_):
    # Torch LambdaLR takes a Python function of the epoch; YAML cannot carry
    # one, so this variant is for the code path (tools passing a callable).
    def sched(step):
        return base_lr * lr_lambda(step // steps_per_epoch)

    return sched


SCHEDULERS: Dict[str, Callable] = {
    "MultiStepLR": _multistep,
    "CosineAnnealingLR": _cosine,
    "OneCycleLR": _onecycle,
    "LambdaLR": _lambda,
}


def make_schedule(sched_cfg: Optional[dict], base_lr: float,
                  steps_per_epoch: int = 1):
    """Build an optax schedule (or constant) from an R2 lr_scheduler dict."""
    if not sched_cfg:
        return base_lr
    kind = sched_cfg.get("type", "MultiStepLR")
    if kind not in SCHEDULERS:
        raise ValueError(f"unknown lr_scheduler type {kind!r}; "
                         f"known: {sorted(SCHEDULERS)}")
    kwargs = {k: v for k, v in sched_cfg.items() if k != "type"}
    return SCHEDULERS[kind](base_lr, steps_per_epoch, **kwargs)


# --- optimizers -----------------------------------------------------------

def _sgd(lr, weight_decay=0.0, momentum=0.0, nesterov=False, **_):
    # Torch SGD couples weight decay into the gradient BEFORE momentum.
    return optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay
        else optax.identity(),
        optax.sgd(lr, momentum=momentum or None, nesterov=nesterov),
    )


def _adam(lr, weight_decay=0.0, betas=(0.9, 0.999), eps=1e-8, **_):
    # Torch Adam: L2 folded into the gradient (not decoupled).
    return optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay
        else optax.identity(),
        optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps),
    )


def _adamw(lr, weight_decay=0.0, betas=(0.9, 0.999), eps=1e-8, **_):
    return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps,
                       weight_decay=weight_decay)


OPTIMIZERS: Dict[str, Callable] = {
    "SGD": _sgd,
    "Adam": _adam,
    "AdamW": _adamw,
}


def build_optimizer(optim_cfg: dict, params, steps_per_epoch: int = 1,
                    sched_cfg: Optional[dict] = None,
                    clip_max_norm: float = 0.0,
                    frozen_prefixes: frozenset = frozenset()):
    """Full R2 optimizer section -> one optax transformation.

    ``optim_cfg`` is the YAML ``optimizer:`` dict (type / lr / betas /
    weight_decay / momentum / params-group list); ``sched_cfg`` the
    ``lr_scheduler:`` dict. Per-group ``lr`` rescales the shared schedule
    (torch schedulers scale every group's base lr by the same factor).

    ``frozen_prefixes``: module paths of FrozenBatchNorm instances (see
    train/state.frozen_param_prefixes) — their scale/bias are torch
    BUFFERS, invisible to the reference's named_parameters regex groups
    and never touched by the optimizer (incl. weight decay).
    """
    kind = optim_cfg.get("type", "AdamW")
    if kind not in OPTIMIZERS:
        raise ValueError(f"unknown optimizer type {kind!r}; "
                         f"known: {sorted(OPTIMIZERS)}")
    base = {k: v for k, v in optim_cfg.items() if k not in ("type", "params")}
    base_lr = float(base.pop("lr", 1e-4))
    group_cfgs = optim_cfg.get("params", []) or []

    def _freeze_labels(labels_tree):
        from ..train.state import _is_frozen

        flat = flax.traverse_util.flatten_dict(labels_tree)
        flat = {
            k: ("frozen" if _is_frozen(k, frozen_prefixes) else v)
            for k, v in flat.items()
        }
        return flax.traverse_util.unflatten_dict(flat)

    if not group_cfgs:  # single group: no labelling machinery needed
        sched = make_schedule(sched_cfg, base_lr, steps_per_epoch)
        tx = OPTIMIZERS[kind](sched, **base)
        if frozen_prefixes:
            labels = _freeze_labels(flax.traverse_util.unflatten_dict({
                k: "main" for k in flax.traverse_util.flatten_dict(params)
            }))
            tx = optax.multi_transform(
                {"main": tx, "frozen": optax.set_to_zero()},
                lambda _: labels,
            )
        if clip_max_norm and clip_max_norm > 0:
            tx = optax.chain(optax.clip_by_global_norm(clip_max_norm), tx)
        return tx

    labels_tree, groups = build_param_groups(group_cfgs, params)
    transforms = {}
    for gi, overrides in enumerate(groups):
        kw = dict(base)
        kw.update({k: v for k, v in overrides.items() if k != "params"})
        glr = float(kw.pop("lr", base_lr))
        sched = make_schedule(sched_cfg, glr, steps_per_epoch)
        transforms[f"g{gi}"] = OPTIMIZERS[kind](sched, **kw)
    if frozen_prefixes:
        labels_tree = _freeze_labels(labels_tree)
        transforms["frozen"] = optax.set_to_zero()

    tx = optax.multi_transform(transforms, lambda _: labels_tree)
    if clip_max_norm and clip_max_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip_max_norm), tx)
    return tx
