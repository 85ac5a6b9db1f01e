"""Solver framework: config-driven fit/val loops with checkpointing, EMA,
per-epoch evaluation and reference-compatible logging.

Plays the role of R2/solver/{solver.py,speed_solver.py,speed_engine.py} and
R1/{main.py,engine.py}:
* fit(): epoch loop -> jitted train step per batch (device aug + model +
  Hungarian + loss + grads + EMA) -> per-epoch eval with the device PnP
  solver -> JSON-lines log.txt + eval_{epoch:04d}_log.json + scalars.json;
* checkpoints every checkpoint_step epochs via orbax (full state: params,
  optimizer, EMA, step, epoch); resume() restores everything,
  load_tuning() does a shape-matched partial load preferring EMA weights
  (R2/solver/solver.py:141-178);
* TASKS registry mirrors R2/solver/__init__.py.
"""
from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.yaml_config import YAMLConfig
from ..data.augment import AugmentConfig
from ..data.dataset import SpeedTrainDataset
from ..geometry.solvers import SolverConfig
from ..parallel.mesh import auto_mesh, replicate_tree
from ..utils.metric_logger import MetricLogger
from .evaluator import SpeedEvaluator
from .state import create_train_state
from .steps import make_eval_step, make_train_step


def _tree_flatten_with_path(params):
    import flax

    return flax.traverse_util.flatten_dict(params)


class CheckpointMixin:
    """Orbax full-state checkpointing + resume/tuning hooks shared by every
    task solver (R2/solver/solver.py:104-178: BaseSolver's save/resume/
    load_tuning are task-independent there too). Host class provides
    self.state, self.output_dir, and optionally self.mesh."""

    def _ckpt_dir(self, name):
        return os.path.abspath(os.path.join(self.output_dir, name))

    def save_checkpoint(self, epoch: int, name: str = "checkpoint"):
        import orbax.checkpoint as ocp

        path = self._ckpt_dir(name)
        ckptr = ocp.StandardCheckpointer()
        payload = {
            "params": jax.device_get(self.state.params),
            "batch_stats": jax.device_get(self.state.batch_stats),
            "opt_state": jax.device_get(self.state.opt_state),
            "ema_params": jax.device_get(self.state.ema_params),
            "ema_batch_stats": jax.device_get(self.state.ema_batch_stats),
            "step": int(self.state.step),
            "last_epoch": epoch,
        }
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()

    def _load_checkpoint(self, path: str):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        target = {
            "params": jax.device_get(self.state.params),
            "batch_stats": jax.device_get(self.state.batch_stats),
            "opt_state": jax.device_get(self.state.opt_state),
            "ema_params": jax.device_get(self.state.ema_params),
            "ema_batch_stats": jax.device_get(self.state.ema_batch_stats),
            "step": 0,
            "last_epoch": 0,
        }
        try:
            restored = ckptr.restore(os.path.abspath(path), target)
        except BaseException:
            # pre-ema_batch_stats checkpoint: restore the old layout and
            # re-seed the stats shadow from the restored running stats
            target.pop("ema_batch_stats")
            restored = ckptr.restore(os.path.abspath(path), target)
            from .ema import ema_init

            restored["ema_batch_stats"] = (
                ema_init(restored["batch_stats"])
                if self.state.ema_batch_stats is not None else None
            )
        self.state = self.state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            ema_params=restored["ema_params"],
            ema_batch_stats=restored["ema_batch_stats"],
            step=jnp.asarray(restored["step"], jnp.int32),
        )
        self.start_epoch = int(restored["last_epoch"]) + 1
        if getattr(self, "mesh", None) is not None:
            self.state = replicate_tree(self.state, self.mesh)
        print(f"Resume checkpoint from {path} (epoch {self.start_epoch})")

    def _load_tuning(self, path: str):
        """Shape-matched partial load, preferring EMA weights
        (R2/solver/solver.py:141-178). The reference loads a state_dict —
        params AND buffers — into the module and then constructs ModelEMA
        from the already-tuned module, so BN running stats are loaded too
        and the EMA shadows start from the tuned weights, not random
        init."""
        import flax
        import orbax.checkpoint as ocp

        from .ema import ema_init

        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(os.path.abspath(path))

        def shape_match(cur_tree, src_tree):
            cur = _tree_flatten_with_path(cur_tree)
            new = _tree_flatten_with_path(src_tree) if src_tree else {}
            matched, skipped = {}, 0
            for k, v in cur.items():
                cand = new.get(k)
                if cand is not None and np.shape(cand) == np.shape(v):
                    matched[k] = jnp.asarray(cand, v.dtype)
                else:
                    matched[k] = v
                    skipped += 1
            return flax.traverse_util.unflatten_dict(matched), skipped

        src = restored.get("ema_params") or restored.get("params") or {}
        params, skipped = shape_match(self.state.params, src)
        batch_stats = self.state.batch_stats
        if batch_stats and restored.get("batch_stats"):
            batch_stats, _ = shape_match(batch_stats,
                                         restored["batch_stats"])
        self.state = self.state.replace(
            params=params,
            batch_stats=batch_stats,
            ema_params=(ema_init(params)
                        if self.state.ema_params is not None else None),
            ema_batch_stats=(
                ema_init(batch_stats)
                if self.state.ema_batch_stats is not None else None
            ),
        )
        n_total = len(_tree_flatten_with_path(params))
        print(f"Load tuning state from {path}: {n_total - skipped} "
              f"matched, {skipped} kept")

    def resume(self, path: str):
        self._resume_path = path

    def tuning(self, path: str):
        self._tuning_path = path

    def surgery(self, path: str):
        """Defer a torch-.pth surgery load (public DETR-R50 semantics,
        R1/main.py:20-87) to after _build creates the state."""
        self._surgery_path = path

    def _load_surgery(self, path: str):
        from ..utils.checkpoint_convert import (
            load_torch_checkpoint,
            surgery_detr_pretrained,
        )

        sd = load_torch_checkpoint(path)
        params, stats = surgery_detr_pretrained(
            sd, self.state.params, self.state.batch_stats)
        self.state = self.state.replace(params=params, batch_stats=stats)
        print(f"surgery-loaded torch checkpoint {path}")


class SpeedSolver(CheckpointMixin):
    """Landmarker-task solver (SPEED keypoints -> pose)."""

    def __init__(self, cfg: YAMLConfig, data_root: str = "./data/speed",
                 mesh=None, seed: int = 42):
        self.cfg = cfg
        self.data_root = data_root
        self.mesh = mesh
        self.seed = seed
        self.output_dir = cfg.output_dir
        os.makedirs(self.output_dir, exist_ok=True)
        self.start_epoch = 0
        self._resume_path = None
        self._tuning_path = None

    # --- construction ---------------------------------------------------
    def _build(self):
        cfg = self.cfg
        train_settings = cfg.dataloader_settings("train")
        val_settings = cfg.dataloader_settings("val")

        self.train_ds = SpeedTrainDataset(
            self.data_root,
            ann_file=train_settings.ann_file,
            index_file=train_settings.index_file,
            img_dir=train_settings.img_dir,
            resize=train_settings.resize,
            train=True,
            seed=self.seed,
        )
        self.val_ds = SpeedTrainDataset(
            self.data_root,
            ann_file=val_settings.ann_file,
            index_file=val_settings.index_file,
            img_dir=val_settings.img_dir,
            resize=val_settings.resize,
            train=False,
            seed=self.seed,
        )
        self.batch_size = train_settings.batch_size
        self.val_batch_size = val_settings.batch_size
        self.resize = train_settings.resize

        steps_per_epoch = max(len(self.train_ds) // self.batch_size, 1)
        self.train_cfg = cfg.train_config(steps_per_epoch)
        self.lr_schedule = cfg.lr_schedule_fn(steps_per_epoch)
        self.criterion_cfg = cfg.criterion_config()

        model = cfg.build_model()
        self.model = model
        rng = jax.random.PRNGKey(self.seed)
        sample = jnp.zeros(
            (2, self.resize, self.resize, 3), jnp.float32
        )
        self.state = create_train_state(
            model, rng, sample, self.train_cfg,
            tx=lambda params, frozen: cfg.build_tx(
                params, steps_per_epoch, frozen_prefixes=frozen
            ),
        )

        if getattr(self, "_surgery_path", None):
            # before replicate_tree so the merged tree gets placed normally
            self._load_surgery(self._surgery_path)

        if self.mesh is None:
            # Largest device count that divides both batch sizes (and keep
            # single-device when batches are tiny).
            self.mesh = auto_mesh(self.batch_size, self.val_batch_size)
        if self.mesh is not None:
            self.state = replicate_tree(self.state, self.mesh)

        model_cfg = getattr(model, "config", None)
        self.train_step = make_train_step(
            self.criterion_cfg, self.train_cfg,
            cfg.augment_config(self.resize),
            denoising=bool(getattr(model_cfg, "num_denoising", 0)),
        )
        solver_kind = "sigma" if self.criterion_cfg.point_loss == "uncert" \
            else "simple"
        self.eval_step = make_eval_step(
            criterion_cfg=self.criterion_cfg,
            solver_cfg=SolverConfig(input_size=self.resize),
            out_size=self.resize,
            solver=solver_kind,
            use_ema=self.train_cfg.use_ema,
        )

        if self._tuning_path:
            self._load_tuning(self._tuning_path)
        if self._resume_path:
            self._load_checkpoint(self._resume_path)

    # --- training -------------------------------------------------------
    def _tb_writer(self):
        """tensorboardX writer (R2/solver/speed_solver.py:18-20 parity);
        None when tensorboardX is unavailable."""
        try:
            from tensorboardX import SummaryWriter

            return SummaryWriter(os.path.join(self.output_dir, "tb"))
        except Exception:
            return None

    def fit(self):
        self._build()
        cfg = self.cfg
        log_path = os.path.join(self.output_dir, "log.txt")
        scalars = []
        best_score = float("inf")
        tb = self._tb_writer()

        rng = jax.random.PRNGKey(self.seed)
        for epoch in range(self.start_epoch, cfg.epoches):
            rng, epoch_rng = jax.random.split(rng)
            train_stats = self.train_one_epoch(epoch, epoch_rng)

            if (epoch + 1) % cfg.checkpoint_step == 0 or \
                    epoch == cfg.epoches - 1:
                self.save_checkpoint(epoch)
                self.save_checkpoint(epoch, name=f"checkpoint{epoch:04d}")

            eval_stats, evaluator = self.evaluate(epoch)
            scalars.append({"epoch": epoch, **eval_stats})
            if eval_stats.get("score", float("inf")) < best_score:
                best_score = eval_stats["score"]
                self.save_checkpoint(epoch, name="checkpoint_best")

            # Same key layout as the reference log.txt JSON-lines
            # (R2/solver/speed_solver.py:203-212, R1/analyze_log.py:13-33):
            # train_*/test_* flattened stats, the stats string under
            # test_speed_eval_pose, epoch, n_parameters.
            log_entry = {
                **{f"train_{k}": v for k, v in train_stats.items()},
                **{f"test_{k}": v for k, v in eval_stats.items()},
                "test_speed_eval_pose": evaluator.stats,
                "epoch": epoch,
                "n_parameters": int(
                    sum(
                        np.prod(x.shape)
                        for x in jax.tree_util.tree_leaves(self.state.params)
                    )
                ),
            }
            with open(log_path, "a") as f:
                f.write(json.dumps(log_entry) + "\n")
            evaluator.dump(
                os.path.join(self.output_dir, f"eval_{epoch:04d}_log.json")
            )
            if tb is not None:
                for k, v in train_stats.items():
                    tb.add_scalar(f"train/{k}", v, epoch)
                for k in ("score", "score_tvec", "score_quat"):
                    if k in eval_stats:
                        tb.add_scalar(f"eval/{k}", eval_stats[k], epoch)
        with open(os.path.join(self.output_dir, "scalars.json"), "w") as f:
            json.dump(scalars, f)
        if tb is not None:
            tb.export_scalars_to_json(
                os.path.join(self.output_dir, "all_scalars.json")
            )
            tb.close()

    def train_one_epoch(self, epoch: int, rng):
        from ..data.prefetch import prefetch_to_device

        logger = MetricLogger()
        n_batches = 0

        def host_batches():
            for b in self.train_ds.batches(self.batch_size):
                for key in ("filename", "clip_bbox", "quat_gt", "tvec_gt",
                            "bbox_area", "scale", "offset"):
                    b.pop(key, None)
                yield b

        for batch in logger.log_every(
            prefetch_to_device(host_batches(), size=2, mesh=self.mesh),
            self.cfg.log_step,
            header=f"Epoch: [{epoch}]",
        ):
            rng, step_rng = jax.random.split(rng)
            self.state, losses = self.train_step(self.state, batch, step_rng)
            n_batches += 1
            if n_batches % self.cfg.log_step == 0:
                host_losses = {
                    k: float(v) for k, v in losses.items()
                }
                if not np.isfinite(host_losses["loss_total"]):
                    # Loss-finite check (R1/engine.py:55-58): stop training.
                    raise FloatingPointError(
                        f"Loss is {host_losses['loss_total']}, stopping"
                    )
                # train_lr meter (reference log.txt key, R1/analyze_log.py:13)
                host_losses["lr"] = float(
                    self.lr_schedule(int(self.state.step))
                )
                logger.update(**host_losses)
        return {k: m.global_avg for k, m in logger.meters.items()}

    # --- evaluation -----------------------------------------------------
    def evaluate(self, epoch: int = -1):
        evaluator = SpeedEvaluator()
        loss_sums: dict = {}
        n_loss_batches = 0
        for batch in self.val_ds.batches(
            self.val_batch_size, shuffle=False, drop_last=False, pad_last=True
        ):
            filenames = batch.pop("filename")
            pad = batch.pop("pad", 0)
            # Shard the eval batch over the data mesh like the train path —
            # eval is data-parallel with no cross-chip communication (the
            # reference wraps the eval loader in DistributedSampler too,
            # R2/src/misc/dist.py:114-126); pad_last guarantees
            # divisibility (auto_mesh divides the val batch size).
            if self.mesh is not None:
                from ..parallel.mesh import shard_batch

                device_batch = shard_batch(batch, self.mesh)
            else:
                device_batch = {k: jnp.asarray(v) for k, v in batch.items()}
            results = self.eval_step(self.state, device_batch)
            results = dict(jax.device_get(results))
            # batch-mean eval losses (reference evaluate() logs criterion
            # losses on eval batches, R2/solver/speed_engine.py:123-172;
            # like the reference's MetricLogger these are per-batch means —
            # the padded tail batch weighs its pad images in)
            for k, v in results.pop("eval_losses", {}).items():
                loss_sums[k] = loss_sums.get(k, 0.0) + float(v)
            n_loss_batches += 1
            # carry GT into the per-image log (tvec-abs summary stats)
            for key in ("quat_gt", "tvec_gt"):
                if key in batch:
                    results[key] = np.asarray(batch[key])
            evaluator.update_batch(filenames, results, pad=pad)
        stats_str = evaluator.summarize()
        print(f"Eval epoch {epoch}: {stats_str}")
        stats = evaluator.scalar_summary()
        if loss_sums:
            stats.update(
                {k: v / max(n_loss_batches, 1) for k, v in loss_sums.items()}
            )
        return stats, evaluator

    def val(self):
        self._build()
        stats = self.evaluate()
        # GFLOPs at the reference's measurement point (2, S, S, 3)
        # (R2/solver/speed_solver.py:255-260).
        try:
            from ..utils.flops import count_gflops

            variables = {"params": jax.device_get(self.state.params)}
            if self.state.batch_stats:
                variables["batch_stats"] = jax.device_get(
                    self.state.batch_stats
                )
            g = count_gflops(
                self.model, variables, (2, self.resize, self.resize, 3)
            )
            print(f"model GFLOPs @ (2,{self.resize},{self.resize},3): {g:.2f}")
        except Exception as e:  # cost analysis unsupported on some backends
            print(f"GFLOPs count unavailable: {e}")
        return stats


def _det_solver(*args, **kwargs):
    from .det_solver import DetSolver

    return DetSolver(*args, **kwargs)


TASKS = {
    "landmarker": SpeedSolver,
    "detection": _det_solver,
}
