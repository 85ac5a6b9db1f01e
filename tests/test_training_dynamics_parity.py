"""Head-to-head TRAINING-DYNAMICS parity vs the live torch reference.

Every module already has single-step parity tests (forward, loss,
postprocess); this test runs the composite claim end to end: from one
converted init, both frameworks consume the IDENTICAL fixed batch sequence
for 50 optimizer steps and their loss trajectories, final weights, EMA
shadows and BN running statistics must track. This catches the classes of
drift single-step tests structurally cannot: optimizer group membership
(R2/configs/rtdetr_speed/include/optimizer.yml regexes), AdamW update math,
global-norm clipping, the MultiStepLR epoch boundary, the EMA warmup ramp
(R2/optim/ema.py:49-63), the decoder's `.detach()` gradient stops
(R2/src/zoo/rtdetr/rtdetr_decoder.py:580,685), and BN running-stat updates.

Reference loop replicated on the torch side exactly as shipped:
R2/solver/speed_engine.py:58-111 (loss = sum of weighted dict, zero_grad,
backward, clip_grad_norm_, step, ema.update) + the param-group builder
R2/src/core/yaml_config.py:134-177 (re.findall over named_parameters).

Everything runs in float64 on CPU so real drift is not masked by (and not
attributed to) accumulation noise.
"""
import copy
import math
import re

import numpy as np
import pytest

from tests._r2_reference import load_r2_modules, r2_available

pytestmark = pytest.mark.skipif(
    not r2_available(), reason="R2 reference tree not present"
)

HIDDEN = 64
NHEAD = 4
QUERIES = 14
DEC_LAYERS = 2
B = 2
T = 11  # landmarks per image (SPEED keypoint count)
C = 11
INPUT = 64
STEPS = 50
STEPS_PER_EPOCH = 10
MILESTONES = [3]  # fires inside the run: lr*0.1 from step 30 on
GAMMA = 0.1
CLIP_NORM = 0.1
BASE_LR = 1e-4
WEIGHT_DECAY = 1e-4
BETAS = (0.9, 0.999)
EMA_DECAY = 0.9999
EMA_WARMUPS = 20.0  # shipped value is 2000; 20 makes d ramp to ~0.9 in-run

# The shipped R2 speed optimizer groups
# (R2/configs/rtdetr_speed/include/optimizer.yml)
GROUP_CFGS = [
    {"params": "backbone", "lr": 1e-5},
    {"params": "^(?=.*encoder(?=.*bias|.*norm.*weight)).*$",
     "weight_decay": 0.0},
    {"params": "^(?=.*decoder(?=.*bias|.*norm.*weight)).*$",
     "weight_decay": 0.0},
]


def _make_batches(n_steps, seed=11):
    rng = np.random.RandomState(seed)
    batches = []
    for _ in range(n_steps):
        batches.append({
            "image": rng.rand(B, INPUT, INPUT, 3),
            "landmarks": rng.rand(B, T, 2) * 0.8 + 0.1,
            "labels": np.tile(np.arange(T, dtype=np.int64), (B, 1)),
        })
    return batches


def _build_torch(seed=0):
    import torch

    PResNet, HybridEncoder, RTDETRTransformer, TorchRTDETR = load_r2_modules()
    torch.manual_seed(seed)
    backbone = PResNet(depth=18, return_idx=[1, 2, 3], pretrained=False,
                       freeze_at=-1, freeze_norm=False)
    encoder = HybridEncoder(in_channels=[128, 256, 512], hidden_dim=HIDDEN,
                            dim_feedforward=128, nhead=NHEAD, expansion=0.5,
                            dropout=0.0)
    decoder = RTDETRTransformer(
        num_classes=C, hidden_dim=HIDDEN, num_queries=QUERIES,
        feat_channels=[HIDDEN] * 3, nhead=NHEAD,
        num_decoder_layers=DEC_LAYERS, dim_feedforward=128, num_denoising=0,
    )
    model = TorchRTDETR(backbone=backbone, encoder=encoder, decoder=decoder)
    return model.double()


def _torch_param_groups(model):
    """The reference's regex param-group builder
    (R2/src/core/yaml_config.py:134-177) over GROUP_CFGS."""
    param_groups, visited = [], []
    for pg in copy.deepcopy(GROUP_CFGS):
        pattern = pg["params"]
        params = {k: v for k, v in model.named_parameters()
                  if v.requires_grad and len(re.findall(pattern, k)) > 0
                  and k not in visited}
        # the reference asserts disjointness by count; replicate it
        for k in params:
            assert k not in visited, f"group overlap on {k}"
        pg["params"] = list(params.values())
        param_groups.append(pg)
        visited.extend(params.keys())
    rest = [v for k, v in model.named_parameters()
            if v.requires_grad and k not in visited]
    param_groups.append({"params": rest})
    return param_groups


class _TorchEMA:
    """Minimal mirror of the reference ModelEMA (R2/optim/ema.py:32-63):
    deepcopied shadow module, updates counter incremented BEFORE computing
    d = decay * (1 - exp(-updates / warmups)), every floating-point
    state_dict entry (params AND buffers) blended in place."""

    def __init__(self, model, decay=EMA_DECAY, warmups=EMA_WARMUPS):
        import torch

        self.module = copy.deepcopy(model).eval()
        self.decay, self.warmups, self.updates = decay, warmups, 0
        for p in self.module.parameters():
            p.requires_grad_(False)
        self._torch = torch

    def update(self, model):
        with self._torch.no_grad():
            self.updates += 1
            d = self.decay * (1 - math.exp(-self.updates / self.warmups))
            msd = model.state_dict()
            for k, v in self.module.state_dict().items():
                if v.dtype.is_floating_point:
                    v *= d
                    v += (1 - d) * msd[k].detach()


def _run_torch(model, batches):
    import torch

    load_r2_modules()
    from src.zoo.rtdetr.matcher import HungarianMatcher
    from src.zoo.rtdetr.rtdetr_criterion import SetCriterion

    # use_focal_loss=True: the shipped-recipe matcher configuration (every
    # speed include shares the global into the matcher -> sigmoid class
    # cost, R2/configs/rtdetr_speed/include/rtdetr_r50vd.yml:60). The CE
    # (softmax) matcher flavor is covered per-step in
    # test_criterion_torch_parity.py.
    matcher = HungarianMatcher(
        {"cost_class": 2.0, "cost_bbox": 5.0, "cost_giou": 2.0},
        use_focal_loss=True)
    criterion = SetCriterion(
        matcher, weight_dict={"loss_ce": 1.0, "loss_bbox": 5.0},
        losses=["labels", "points_uncert"], eos_coef=1e-4, num_classes=C,
    ).double()

    opt = torch.optim.AdamW(_torch_param_groups(model), lr=BASE_LR,
                            betas=BETAS, weight_decay=WEIGHT_DECAY)
    sched = torch.optim.lr_scheduler.MultiStepLR(
        opt, milestones=MILESTONES, gamma=GAMMA)
    ema = _TorchEMA(model)

    model.train()
    criterion.train()
    losses = []
    for i, batch in enumerate(batches):
        x = torch.from_numpy(batch["image"].transpose(0, 3, 1, 2))
        targets = [
            {"labels": torch.from_numpy(batch["labels"][b]),
             "landmarks": torch.from_numpy(batch["landmarks"][b])}
            for b in range(B)
        ]
        outputs = model(x, targets)
        loss_dict = criterion(outputs, targets)
        loss_dict.pop("class_error")
        loss = sum(loss_dict.values())
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), CLIP_NORM)
        opt.step()
        ema.update(model)
        losses.append(float(loss))
        if (i + 1) % STEPS_PER_EPOCH == 0:
            sched.step()
    return np.asarray(losses), model, ema


def _run_ours(init_state_dict, batches, monkeypatch):
    import jax
    import jax.numpy as jnp

    from satellite_pose_estimation_tpu.losses.criterion import CriterionConfig
    from satellite_pose_estimation_tpu.models.rtdetr import (
        RTDETR,
        RTDETRConfig,
    )
    from satellite_pose_estimation_tpu.train import steps as steps_module
    from satellite_pose_estimation_tpu.train.ema import ema_init
    from satellite_pose_estimation_tpu.train.optim import build_optimizer
    from satellite_pose_estimation_tpu.train.state import (
        TrainConfig,
        TrainState,
        frozen_param_prefixes,
    )
    from satellite_pose_estimation_tpu.utils.checkpoint_convert import (
        convert_r2_rtdetr,
    )

    params, stats = convert_r2_rtdetr(init_state_dict, nhead=NHEAD)
    cfg = RTDETRConfig(depth=18, hidden_dim=HIDDEN, num_queries=QUERIES,
                       num_decoder_layers=DEC_LAYERS, dim_feedforward=128,
                       nhead=NHEAD, expansion=0.5, freeze_norm=False,
                       num_classes=C, dtype=jnp.float64)
    model = RTDETR(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, INPUT, INPUT, 3), jnp.float64),
                           train=False)
    frozen = frozen_param_prefixes(variables)

    optim_cfg = {"type": "AdamW", "lr": BASE_LR, "betas": list(BETAS),
                 "weight_decay": WEIGHT_DECAY, "params": GROUP_CFGS}
    sched_cfg = {"type": "MultiStepLR", "milestones": MILESTONES,
                 "gamma": GAMMA}
    tx = build_optimizer(optim_cfg, params, steps_per_epoch=STEPS_PER_EPOCH,
                         sched_cfg=sched_cfg, clip_max_norm=CLIP_NORM,
                         frozen_prefixes=frozen)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=stats,
        opt_state=tx.init(params),
        ema_params=ema_init(params),
        ema_batch_stats=ema_init(stats),
        tx=tx,
        apply_fn=model.apply,
    )

    # Feed the exact batches: the augment chain lives in the data layer on
    # the reference side (dataset transforms, not speed_engine), so the
    # training-loop A/B bypasses it — the patched hook returns the batch
    # images/targets untouched.
    monkeypatch.setattr(steps_module, "augment_batch",
                        lambda rng, img, bb, lm, cfg: (img, lm))
    crit_cfg = CriterionConfig(num_classes=C, eos_coef=1e-4, cost_class=2.0,
                               cost_pts=5.0, point_loss="uncert",
                               weight_ce=1.0, weight_points=5.0,
                               use_focal=True)
    train_cfg = TrainConfig(use_ema=True, ema_decay=EMA_DECAY,
                            ema_warmups=EMA_WARMUPS)
    train_step = steps_module.make_train_step(crit_cfg, train_cfg)

    losses = []
    rng = jax.random.PRNGKey(42)
    for i, batch in enumerate(batches):
        dev_batch = {
            "image": jnp.asarray(batch["image"], jnp.float64),
            "clip_bbox_buf": jnp.zeros((B, 4), jnp.float64),  # unused (patched)
            "landmarks_buf": jnp.asarray(batch["landmarks"], jnp.float64),
            "labels": jnp.asarray(batch["labels"].astype(np.int32)),
        }
        rng, step_rng = jax.random.split(rng)
        state, loss_dict = train_step(state, dev_batch, step_rng)
        losses.append(float(loss_dict["loss_total"]))
    return np.asarray(losses), state


@pytest.fixture(scope="module")
def trajectories():
    import torch

    torch_model = _build_torch()
    # .copy(): .numpy() aliases the torch storage, which the optimizer then
    # mutates in place — without it our run would start from torch's FINAL
    # weights instead of the shared init.
    sd = {k: v.detach().numpy().copy()
          for k, v in torch_model.state_dict().items()}
    # Knock the deform-attn sampling taps off torch's DEGENERATE init: with
    # zero offset weights and the integer grid bias
    # (R2/src/zoo/rtdetr/rtdetr_decoder.py _reset_parameters), every sampling
    # location lands on an EXACT integer pixel coordinate — a kink of
    # bilinear interpolation where the loss is not differentiable. Verified
    # by central finite differences: at that init BOTH torch autograd and
    # jax.grad disagree with the FD slope (each returns a different, equally
    # valid one-sided subgradient) while the two LOSS functions agree
    # pointwise to <4e-8; after this perturbation all gradients match to
    # ~4e-8. Training dynamics parity is only defined off measure-zero
    # kinks, so the A/B starts from a generic point.
    prng = np.random.RandomState(7)
    for k in sd:
        if "sampling_offsets" in k:
            sd[k] = sd[k] + prng.uniform(-1e-2, 1e-2, sd[k].shape)
    torch_model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()})
    batches = _make_batches(STEPS)
    t_losses, t_model, t_ema = _run_torch(torch_model, batches)

    mp = pytest.MonkeyPatch()
    try:
        f_losses, f_state = _run_ours(sd, batches, mp)
    finally:
        mp.undo()
    return t_losses, t_model, t_ema, f_losses, f_state


def test_loss_trajectories_track(trajectories):
    t_losses, _, _, f_losses, _ = trajectories
    # sanity: training actually moved, so the comparison is meaningful
    assert t_losses[0] - t_losses[-1] > 0.05 * t_losses[0]
    rel = np.abs(f_losses - t_losses) / np.abs(t_losses)
    assert rel.max() < 1e-6, (
        f"loss trajectories diverge: max rel diff {rel.max():.3e} at step "
        f"{int(rel.argmax())}; torch={t_losses[int(rel.argmax())]:.9f} "
        f"ours={f_losses[int(rel.argmax())]:.9f}"
    )


def test_final_weights_match(trajectories):
    from satellite_pose_estimation_tpu.utils.checkpoint_convert import (
        convert_rtdetr_to_torch,
    )

    _, t_model, _, _, f_state = trajectories
    back = convert_rtdetr_to_torch(
        jax_to_numpy(f_state.params), jax_to_numpy(f_state.batch_stats),
        nhead=NHEAD)
    sd = {k: v.detach().numpy()
          for k, v in t_model.state_dict().items()}
    checked = 0
    # Tolerance floor: gradients agree to ~4e-8 (the reference's own f32
    # anchor grid injects that much forward noise into a double model), and
    # 50 Adam steps accumulate it into ~2e-9 absolute / ~1e-5 relative drift
    # on the smallest updated params. Real dynamics bugs (wrong param group,
    # clip, LR boundary, BN momentum) measure 1e-2+ here.
    for k, v in back.items():
        np.testing.assert_allclose(
            v, sd[k], rtol=5e-5, atol=1e-8,
            err_msg=f"final weight diverges after {STEPS} steps: {k}")
        checked += 1
    assert checked > 100


def test_final_ema_shadows_match(trajectories):
    from satellite_pose_estimation_tpu.utils.checkpoint_convert import (
        convert_rtdetr_to_torch,
    )

    _, _, t_ema, _, f_state = trajectories
    back = convert_rtdetr_to_torch(
        jax_to_numpy(f_state.ema_params),
        jax_to_numpy(f_state.ema_batch_stats), nhead=NHEAD)
    sd = {k: v.detach().numpy()
          for k, v in t_ema.module.state_dict().items()}
    # our EMA shadows are f32 by contract (train/ema.py); tolerance is f32
    for k, v in back.items():
        np.testing.assert_allclose(
            v, sd[k], rtol=3e-5, atol=1e-7,
            err_msg=f"EMA shadow diverges after {STEPS} updates: {k}")


def jax_to_numpy(tree):
    import jax

    return jax.tree_util.tree_map(np.asarray, tree)
