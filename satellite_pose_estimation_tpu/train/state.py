"""Train state: optimizer wiring (AdamW with backbone/main param groups,
MultiStep LR, global-norm clipping) + EMA shadow, all as one pytree.

Optimizer contract mirrors R1/main.py:222-233 (AdamW lr 1e-4, backbone lr
1e-5, weight decay 1e-4, MultiStepLR gamma 0.1 at [80, 120] epochs, grad
clip 0.1) and the R2 regex param groups (R2/src/core/yaml_config.py:134-177)
generalised to path-predicate groups.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from .ema import ema_init


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-4
    lr_backbone: float = 1e-5
    weight_decay: float = 1e-4
    clip_max_norm: float = 0.1
    lr_drop_steps: Tuple[int, ...] = ()  # in optimizer steps
    lr_drop_gamma: float = 0.1
    use_ema: bool = False
    ema_decay: float = 0.9999
    # decay ramp time constant: d = decay * (1 - exp(-t / warmups))
    # (reference ModelEMA 'warmups', R2/optim/ema.py:33-48)
    ema_warmups: float = 2000.0
    betas: Tuple[float, float] = (0.9, 0.999)


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any  # None when EMA disabled
    # EMA shadow of BN running stats: the reference ModelEMA averages every
    # floating-point entry of state_dict — buffers included
    # (R2/optim/ema.py:53-63); None when EMA disabled or no BN stats
    ema_batch_stats: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Callable = flax.struct.field(pytree_node=False)


def _multistep_schedule(base_lr, drop_steps, gamma):
    if not drop_steps:
        return base_lr
    boundaries = {int(s): gamma for s in drop_steps}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def frozen_param_prefixes(variables) -> frozenset:
    """Module paths of FrozenBatchNorm instances, read from the init-time
    'frozen_marker' collection (models/layers.py). Their scale/bias params
    are torch BUFFERS (absent from named_parameters, R1/models/
    backbone.py:18-54): the optimizer must never update them — not even
    via decoupled weight decay, which optax applies to zero-grad params."""
    marker = variables.get("frozen_marker", {})
    flat = flax.traverse_util.flatten_dict(marker)
    return frozenset(path[:-1] for path in flat)


def _is_frozen(path, frozen_prefixes) -> bool:
    return path[-1] in ("scale", "bias") and path[:-1] in frozen_prefixes


def make_optimizer(cfg: TrainConfig, params,
                   backbone_predicate: Optional[Callable] = None,
                   frozen_prefixes: frozenset = frozenset()):
    """AdamW with a separate backbone LR group + clip + MultiStep schedule.
    FrozenBatchNorm affines (buffers in torch) get no updates at all."""
    if backbone_predicate is None:
        backbone_predicate = lambda path: path and path[0] == "backbone"

    def label_fn(tree):
        flat = flax.traverse_util.flatten_dict(tree)
        labels = {
            k: (
                "frozen"
                if _is_frozen(k, frozen_prefixes)
                else ("backbone" if backbone_predicate(k) else "main")
            )
            for k in flat
        }
        return flax.traverse_util.unflatten_dict(labels)

    def adamw(lr):
        return optax.adamw(
            _multistep_schedule(lr, cfg.lr_drop_steps, cfg.lr_drop_gamma),
            b1=cfg.betas[0],
            b2=cfg.betas[1],
            weight_decay=cfg.weight_decay,
        )

    tx = optax.chain(
        optax.clip_by_global_norm(cfg.clip_max_norm),
        optax.multi_transform(
            {
                "backbone": adamw(cfg.lr_backbone),
                "main": adamw(cfg.lr),
                "frozen": optax.set_to_zero(),
            },
            label_fn,
        ),
    )
    return tx


def create_train_state(model, rng, sample_input, cfg: TrainConfig,
                       backbone_predicate=None, tx=None) -> TrainState:
    """Init model variables + optimizer. ``tx`` overrides the default
    two-group AdamW with a registry-built transform (train/optim.py) when
    the config carries a full R2 optimizer/lr_scheduler section."""
    init_kwargs = {}
    if getattr(getattr(model, "config", None), "num_denoising", 0):
        # CDN decoders create denoising params only when the dn branch is
        # traced: init in train mode with placeholder targets (shapes only
        # — batch/target count don't affect param shapes).
        # batch of the placeholder targets must match the (possibly
        # batch-1) sliced sample input or the decoder's dn concat fails
        B_ = min(2, sample_input.shape[0])
        bd = getattr(model.config, "box_dim", 2)
        init_kwargs = {
            "train": True,
            "targets": {
                "labels": jnp.zeros((B_, 11), jnp.int32),
                "points": jnp.full((B_, 11, bd), 0.5, jnp.float32),
            },
        }
        rng = {"params": rng, "denoising": jax.random.PRNGKey(0),
               "dropout": jax.random.PRNGKey(1)}
        variables = model.init(rng, sample_input[:B_], **init_kwargs)
    else:
        variables = model.init(rng, sample_input, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    frozen = frozen_param_prefixes(variables)
    if tx is None:
        tx = make_optimizer(cfg, params, backbone_predicate, frozen)
    elif callable(tx) and not isinstance(tx, optax.GradientTransformation):
        tx = tx(params, frozen)  # factory: regex groups need param names
        if tx is None:
            tx = make_optimizer(cfg, params, backbone_predicate, frozen)
    opt_state = tx.init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        ema_params=ema_init(params) if cfg.use_ema else None,
        ema_batch_stats=(
            ema_init(batch_stats) if cfg.use_ema and batch_stats else None
        ),
        tx=tx,
        apply_fn=model.apply,
    )
