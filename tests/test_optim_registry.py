"""Optimizer/scheduler registry parity tests.

Covers the reference's registry surface (R2/optim/optim.py:20-28) and the
regex param-group contract (R2/src/core/yaml_config.py:134-177):
  * regex group membership on a real RT-DETR param tree, against the
    shipped R2 optimizer.yml patterns (name-list fixture assertions);
  * update-rule parity of SGD/Adam/AdamW vs live torch.optim on CPU;
  * schedule shapes for MultiStep/Cosine/OneCycle/Lambda.
"""
import re

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from satellite_pose_estimation_tpu.train.optim import (
    build_optimizer,
    build_param_groups,
    make_schedule,
    torch_style_name,
)

# The R2 rtdetr_speed optimizer section (schema fixture — the loader must
# accept R2's own YAML surface; R2/configs/rtdetr_speed/include/optimizer.yml).
R2_OPTIMIZER = {
    "type": "AdamW",
    "params": [
        {"params": "backbone", "lr": 0.00001},
        {"params": "^(?=.*encoder(?=.*bias|.*norm.*weight)).*$",
         "weight_decay": 0.0},
        {"params": "^(?=.*decoder(?=.*bias|.*norm.*weight)).*$",
         "weight_decay": 0.0},
    ],
    "lr": 0.0001,
    "betas": [0.9, 0.999],
    "weight_decay": 0.0001,
}


@pytest.fixture(scope="module")
def rtdetr_params():
    from satellite_pose_estimation_tpu.models.rtdetr import (
        RTDETR,
        RTDETRConfig,
    )

    model = RTDETR(RTDETRConfig(
        depth=18, hidden_dim=32, num_queries=8, num_decoder_layers=2,
        nhead=4, dim_feedforward=64,
    ))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    return variables["params"]


def test_regex_group_membership_matches_torch_semantics(rtdetr_params):
    labels_tree, groups = build_param_groups(
        R2_OPTIMIZER["params"], rtdetr_params
    )
    flat_labels = flax.traverse_util.flatten_dict(labels_tree)
    names = {torch_style_name(k): v for k, v in flat_labels.items()}

    # Independent re-derivation with the reference's exact matching rule
    # (re.findall > 0 per named parameter, leftover -> default group).
    for name, label in names.items():
        matches = [i for i, g in enumerate(R2_OPTIMIZER["params"])
                   if re.findall(g["params"], name)]
        expected = f"g{matches[0]}" if matches else "g3"
        assert label == expected, (name, label, expected)

    # Name-list fixture: spot-check membership classes the R2 regexes are
    # designed to produce on backbone/encoder/decoder naming.
    by_label = {}
    for name, label in names.items():
        by_label.setdefault(label, []).append(name)
    assert all(n.startswith("backbone.") for n in by_label["g0"])
    assert any(".norm.weight" in n for n in by_label["g1"])  # enc norms
    assert all("encoder" in n for n in by_label["g1"])
    assert all(n.endswith("bias") or ("norm" in n and n.endswith("weight"))
               for n in by_label["g1"] + by_label["g2"])
    assert all("decoder" in n for n in by_label["g2"])
    # encoder conv kernels stay in the default group (decayed)
    assert any("encoder" in n and n.endswith("weight") and "norm" not in n
               for n in by_label["g3"])
    assert sum(len(v) for v in by_label.values()) == len(names)


def test_overlapping_groups_rejected(rtdetr_params):
    with pytest.raises(ValueError, match="disjoint"):
        build_param_groups(
            [{"params": "backbone"}, {"params": "backbone.*weight"}],
            rtdetr_params,
        )


# --- update-rule parity vs live torch ------------------------------------

def _run_optax(tx, w0, grads, steps):
    w = jnp.asarray(w0)
    state = tx.init(w)
    for g in grads[:steps]:
        updates, state = tx.update(jnp.asarray(g), state, w)
        w = optax.apply_updates(w, updates)
    return np.asarray(w)


def _run_torch(make_opt, w0, grads, steps):
    import torch

    w = torch.nn.Parameter(torch.tensor(w0, dtype=torch.float64))
    opt = make_opt([w])
    for g in grads[:steps]:
        opt.zero_grad()
        w.grad = torch.tensor(g, dtype=torch.float64)
        opt.step()
    return w.detach().numpy()


@pytest.mark.parametrize("kind,kwargs", [
    ("SGD", {"lr": 0.1, "momentum": 0.9, "weight_decay": 0.01}),
    ("SGD", {"lr": 0.05, "momentum": 0.9, "nesterov": True,
             "weight_decay": 0.001}),
    ("Adam", {"lr": 0.01, "betas": [0.9, 0.999], "weight_decay": 0.01}),
    ("AdamW", {"lr": 0.01, "betas": [0.9, 0.999], "weight_decay": 0.01}),
])
def test_update_rule_matches_torch(kind, kwargs):
    import torch

    rng = np.random.RandomState(3)
    w0 = rng.randn(7)
    grads = [rng.randn(7) for _ in range(5)]

    w_opx = _run_optax(
        build_optimizer({"type": kind, **kwargs}, jnp.zeros(7)),
        w0, grads, 5,
    )

    torch_cls = {"SGD": torch.optim.SGD, "Adam": torch.optim.Adam,
                 "AdamW": torch.optim.AdamW}[kind]
    tkw = dict(kwargs)
    if "betas" in tkw:
        tkw["betas"] = tuple(tkw["betas"])
    w_torch = _run_torch(lambda ps: torch_cls(ps, **tkw), w0, grads, 5)

    np.testing.assert_allclose(w_opx, w_torch, rtol=1e-5, atol=1e-6)


# --- schedules -------------------------------------------------------------

def test_multistep_schedule():
    s = make_schedule({"type": "MultiStepLR", "milestones": [2, 4],
                       "gamma": 0.1}, base_lr=1.0, steps_per_epoch=10)
    assert float(s(0)) == pytest.approx(1.0)
    assert float(s(19)) == pytest.approx(1.0)
    assert float(s(20)) == pytest.approx(0.1)
    assert float(s(40)) == pytest.approx(0.01)


def test_cosine_schedule_matches_torch_formula():
    # Torch's closed form CYCLES past T_max (period 2*T_max) rather than
    # clamping at eta_min; t=60 below is past T_max*spe=40 and must rise.
    T_max, base, eta_min, spe = 8, 0.3, 0.03, 5
    s = make_schedule({"type": "CosineAnnealingLR", "T_max": T_max,
                       "eta_min": eta_min}, base_lr=base, steps_per_epoch=spe)
    for t in [0, 7, 20, 40, 60, 80]:
        expected = eta_min + (base - eta_min) * (
            1 + np.cos(np.pi * t / (T_max * spe))) / 2
        assert float(s(t)) == pytest.approx(expected, rel=1e-6)
    assert float(s(60)) > float(s(40))  # cycling back up, not frozen


def test_torch_style_name_embeddings():
    from satellite_pose_estimation_tpu.train.optim import torch_style_name

    # nn.Embedding weights in the torch reference are '<name>.weight'.
    assert torch_style_name(("query_embed",)) == "query_embed.weight"
    assert torch_style_name(("decoder", "tgt_embed")) == \
        "decoder.tgt_embed.weight"
    assert torch_style_name(("pos_enc", "row_embed")) == \
        "pos_enc.row_embed.weight"
    assert torch_style_name(("emb", "embedding")) == "emb.weight"
    assert torch_style_name(("m", "kernel")) == "m.weight"
    assert torch_style_name(("m", "bias")) == "m.bias"


def test_onecycle_schedule_peaks():
    s = make_schedule({"type": "OneCycleLR", "max_lr": 1.0,
                       "total_steps": 100, "pct_start": 0.3,
                       "div_factor": 25.0}, base_lr=0.1, steps_per_epoch=1)
    assert float(s(30)) == pytest.approx(1.0, rel=1e-3)  # peak at pct_start
    assert float(s(0)) == pytest.approx(1.0 / 25.0, rel=1e-3)
    assert float(s(99)) < 0.01


def test_lambda_schedule():
    s = make_schedule({"type": "LambdaLR",
                       "lr_lambda": lambda epoch: 0.5 ** epoch},
                      base_lr=2.0, steps_per_epoch=4)
    assert float(s(0)) == pytest.approx(2.0)
    assert float(s(5)) == pytest.approx(1.0)   # epoch 1
    assert float(s(9)) == pytest.approx(0.5)   # epoch 2


def test_unknown_types_raise():
    with pytest.raises(ValueError, match="unknown optimizer"):
        build_optimizer({"type": "RMSProp"}, jnp.zeros(3))
    with pytest.raises(ValueError, match="unknown lr_scheduler"):
        make_schedule({"type": "StepLR"}, 1.0)


def test_end_to_end_group_lrs(rtdetr_params):
    """Backbone group must step with lr 1e-5, default with 1e-4 (SGD probe:
    update magnitude == lr * |grad| exactly, no momentum)."""
    cfg = {"type": "SGD",
           "params": [{"params": "backbone", "lr": 1e-5}],
           "lr": 1e-4}
    tx = build_optimizer(cfg, rtdetr_params)
    ones = jax.tree.map(jnp.ones_like, rtdetr_params)
    state = tx.init(rtdetr_params)
    updates, _ = tx.update(ones, state, rtdetr_params)
    flat = flax.traverse_util.flatten_dict(updates)
    for k, v in flat.items():
        lr = 1e-5 if k[0] == "backbone" else 1e-4
        np.testing.assert_allclose(np.asarray(v), -lr, rtol=1e-6)


def test_yaml_build_tx_gating(rtdetr_params):
    from satellite_pose_estimation_tpu.core.yaml_config import YAMLConfig

    plain = YAMLConfig(cfg={"optimizer": {"lr": 1e-4},
                            "lr_scheduler": {"milestones": [30]}})
    assert plain.build_tx(rtdetr_params) is None  # TrainConfig default path

    rich = YAMLConfig(cfg={"optimizer": R2_OPTIMIZER,
                           "lr_scheduler": {"type": "CosineAnnealingLR",
                                            "T_max": 10}})
    tx = rich.build_tx(rtdetr_params, steps_per_epoch=5)
    assert tx is not None
    state = tx.init(rtdetr_params)
    ones = jax.tree.map(jnp.ones_like, rtdetr_params)
    updates, _ = tx.update(ones, state, rtdetr_params)
    assert np.isfinite(
        float(jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b), updates, 0.0))
    )


def test_shipped_speed_optimizer_spec_builds(rtdetr_params):
    """The SHIPPED configs/speed include's 3-group regex spec must execute
    through build_tx on a real RT-DETR param tree: disjoint groups, the
    no-decay groups non-empty, frozen-norm membership stable."""
    from satellite_pose_estimation_tpu.core.yaml_config import YAMLConfig
    from satellite_pose_estimation_tpu.train.optim import build_param_groups

    cfg = YAMLConfig("configs/speed/rtdetr_r50vd_kl_1.yml")
    tx = cfg.build_tx(rtdetr_params, steps_per_epoch=10)
    assert tx is not None  # regex spec recognized, not the default fallback

    import flax

    labels_tree, _ = build_param_groups(
        cfg.yaml_cfg["optimizer"]["params"], rtdetr_params
    )
    flat = flax.traverse_util.flatten_dict(labels_tree)
    by_label = {}
    for path, label in flat.items():
        by_label.setdefault(label, []).append("/".join(path))
    # all three regex groups + the default must match something
    assert {"g0", "g1", "g2", "g3"} <= set(by_label), sorted(by_label)
    # g2 = encoder/decoder norm+bias no-decay group
    assert all("norm" in n.lower() or "bias" in n.lower()
               for n in by_label["g2"]), by_label["g2"][:5]


def test_lr_schedule_fn_host_meter():
    """cfg.lr_schedule_fn mirrors the tx's main-group schedule: MultiStep
    drops for plain sections, registry schedules otherwise (feeds the
    train_lr meter, the reference's log.txt key R1/analyze_log.py:13)."""
    from satellite_pose_estimation_tpu.core.yaml_config import YAMLConfig

    plain = YAMLConfig(cfg={
        "task": "landmarker",
        "optimizer": {"lr": 3e-4},
        "lr_scheduler": {"milestones": [2], "gamma": 0.1},
    })
    sched = plain.lr_schedule_fn(steps_per_epoch=10)
    assert abs(sched(0) - 3e-4) < 1e-12
    assert abs(sched(25) - 3e-5) < 1e-12

    cosine = YAMLConfig(cfg={
        "task": "landmarker",
        "optimizer": {"type": "SGD", "lr": 1e-2},
        "lr_scheduler": {"type": "CosineAnnealingLR", "T_max": 4},
    })
    sched_c = cosine.lr_schedule_fn(steps_per_epoch=1)
    assert abs(float(sched_c(0)) - 1e-2) < 1e-9
    assert float(sched_c(2)) < 1e-2  # decayed mid-cycle
