"""WeightedProcrustesTrainer — training orchestration (core/trainer.py:38-679).

Drives the jitted train step (core/train_step.py) over the host data pipeline:
per-epoch training with gradient accumulation (iter_size), epoch-level
ExponentialLR, checkpoint-every-epoch plus best-validation checkpointing on
``best_val_metric`` (default succ_rate), resume, and the reference's validation
metrics (hit ratio, precision/recall/F1, balanced accuracy, RTE/RRE, success
rate — trainer.py:353-489). Scalar logs go to JSONL (and tensorboardX when
importable), mirroring the reference's train/* val/* scalar streams.
"""

from __future__ import annotations

import json
import logging
import os.path as osp
from pathlib import Path
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import load_model
from ..ops import metrics as metric_ops
from ..utils import checkpoint as ckpt_utils
from ..utils.timer import AverageMeter, Timer
from . import train_step as ts


class ScalarWriter:
    """JSONL scalar stream + optional tensorboardX passthrough."""

    def __init__(self, out_dir: str):
        Path(out_dir).mkdir(parents=True, exist_ok=True)
        self._f = open(osp.join(out_dir, "scalars.jsonl"), "a")
        try:
            from tensorboardX import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(out_dir)
        except Exception:
            self._tb = None

    def add_scalar(self, tag: str, value: float, step: int):
        self._f.write(json.dumps({"tag": tag, "value": float(value), "step": step}) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)


def _classification_stats(logits: np.ndarray, labels: np.ndarray, valid: np.ndarray):
    """Precision/recall/F1/TPR/TNR/balanced accuracy over valid rows
    (trainer.py:306-341, 353-489)."""
    # sigmoid(x) > 0.5 <=> x > 0: skips the exp (which overflow-warns on
    # large-magnitude negative logits)
    pred = (logits > 0.0) & valid
    gt = (labels > 0.5) & valid
    tp = float((pred & gt).sum())
    fp = float((pred & ~gt & valid).sum())
    fn = float((~pred & gt).sum())
    tn = float((~pred & ~gt & valid).sum())
    precision = tp / max(tp + fp, 1.0)
    recall = tp / max(tp + fn, 1.0)
    f1 = 2 * precision * recall / max(precision + recall, 1e-12)
    tpr = recall
    tnr = tn / max(tn + fp, 1.0)
    return dict(precision=precision, recall=recall, f1=f1, tpr=tpr, tnr=tnr,
                balanced_accuracy=(tpr + tnr) / 2)


class WeightedProcrustesTrainer:
    def __init__(self, config, data_loader, val_data_loader=None):
        self.config = config
        self.data_loader = data_loader
        self.val_data_loader = val_data_loader
        self.out_dir = config.out_dir
        self.writer = ScalarWriter(self.out_dir)
        self.log = logging.getLogger("trainer")

        # Models: frozen FCGF + trainable 6D inlier net (trainer.py:60-108).
        self.fcgf_spec = load_model(config.feat_model)
        self.fcgf_cfg = self.fcgf_spec.make_config(
            1, config.feat_model_n_out, bn_momentum=config.bn_momentum,
            conv1_kernel_size=config.feat_conv1_kernel_size,
            normalize_feature=config.normalize_feature, D=3)
        inlier_in = 6 if config.inlier_feature_type == "coords" else (
            2 * config.feat_model_n_out if config.inlier_feature_type == "feats" else 1)
        self.inlier_spec = load_model(config.inlier_model)
        self.inlier_cfg = self.inlier_spec.make_config(
            inlier_in, 1, bn_momentum=config.bn_momentum,
            conv1_kernel_size=config.inlier_conv1_kernel_size,
            normalize_feature=False, D=6)

        k0, k1 = jax.random.split(jax.random.PRNGKey(getattr(config, "seed", 0)))
        self.fcgf_params, self.fcgf_state = self.fcgf_spec.init(k0, self.fcgf_cfg)
        self.inlier_params, self.inlier_state = self.inlier_spec.init(k1, self.inlier_cfg)

        # Pretrained FCGF from --weights (trainer.py:69-90): frozen feature net.
        if getattr(config, "weights", None):
            state = ckpt_utils.load_torch_checkpoint(config.weights) \
                if str(config.weights).endswith((".pth", ".pt")) \
                else ckpt_utils.load_checkpoint(config.weights)
            if "fcgf_params" in state:
                self.fcgf_params = jax.tree.map(jnp.asarray, state["fcgf_params"])
                self.fcgf_state = jax.tree.map(jnp.asarray, state["fcgf_state"])
            elif state.get("state_dict") is not None:  # native schema
                self.fcgf_params = jax.tree.map(
                    jnp.asarray, state["state_dict"]["params"])
                self.fcgf_state = jax.tree.map(
                    jnp.asarray, state["state_dict"]["state"])

        # Epoch-level ExponentialLR (trainer.py:110; config exp_gamma). The
        # optimizer is built with UNIT learning rate; the actual per-epoch LR
        # is passed into the jitted step as a traced scalar every call, so the
        # decay applies without retracing (a Python closure would be baked in
        # as an epoch-0 constant at trace time).
        self.epoch_lr = lambda epoch: config.lr * (config.exp_gamma ** epoch)
        self._current_lr = config.lr
        self.optimizer = ts.make_optimizer(config.optimizer, 1.0, config)
        self.opt_state = self.optimizer.init(self.inlier_params)
        self.step_fn, self.loss_fn = ts.make_train_step(
            self.fcgf_spec, self.fcgf_cfg, self.inlier_spec, self.inlier_cfg,
            config, self.optimizer)
        # --num_devices > 1: data-parallel training over a 1-D 'data' mesh
        # (SURVEY.md 2.3). The pair batch shards over devices; params are
        # replicated and GSPMD inserts the gradient psum over ICI.
        n_dev = int(getattr(config, "num_devices", 1) or 1)
        self.mesh = None
        if n_dev > 1:
            from ..parallel import data_parallel as dp

            if config.batch_size % n_dev != 0:
                raise ValueError(
                    f"batch_size {config.batch_size} not divisible by "
                    f"num_devices {n_dev}")
            self.mesh = dp.make_mesh(n_dev)
            self._shard_batch = lambda b: dp.shard_batch(self.mesh, b)
            self._jit_step = dp.make_sharded_train_step(self.mesh, self.step_fn,
                                                        with_lr=True)
        else:
            self._shard_batch = lambda b: b
            self._jit_step = jax.jit(self.step_fn)
        # Jitted once here: building these wrappers inside _train_epoch /
        # _valid_epoch would hand jax.jit a FRESH Python callable each call,
        # missing the jit cache and recompiling every epoch and every
        # validation pass (minutes each on the tunneled TPU).
        self._grad_fn = jax.jit(jax.grad(self.loss_fn, has_aux=True))
        self._val_stats_fn = jax.jit(
            lambda p, s, fp, fs, b: self.loss_fn(p, s, fp, fs, b)[1][1])

        self.start_epoch = 0
        self.best_val = -1e8
        self.best_val_epoch = -1
        self.best_val_metric = config.best_val_metric
        self.curr_iter = 0

        Path(self.out_dir).mkdir(parents=True, exist_ok=True)
        with open(osp.join(self.out_dir, "config.json"), "w") as f:
            json.dump({k: v for k, v in vars(config).items()
                       if isinstance(v, (int, float, str, bool, type(None)))}, f, indent=2)

        if getattr(config, "resume", None):
            self._load_weights(config.resume)

    # ------------------------------------------------------------------
    def train(self):
        """Epoch loop with validation gating (trainer.py:120-155)."""
        if self.config.test_valid and self.val_data_loader is not None:
            val_dict = self._valid_epoch()
            for k, v in val_dict.items():
                self.writer.add_scalar(f"val/{k}", v, self.start_epoch)

        for epoch in range(self.start_epoch, self.config.max_epoch):
            self._current_lr = self.epoch_lr(epoch)
            self.log.info("epoch %d lr %.3e", epoch, self._current_lr)
            self._train_epoch(epoch)
            self._save_checkpoint(epoch)

            if self.val_data_loader is not None and \
                    (epoch + 1) % self.config.val_epoch_freq == 0:
                val_dict = self._valid_epoch()
                for k, v in val_dict.items():
                    self.writer.add_scalar(f"val/{k}", v, epoch)
                if self.best_val < val_dict[self.best_val_metric]:
                    self.best_val = val_dict[self.best_val_metric]
                    self.best_val_epoch = epoch
                    self._save_checkpoint(epoch, "best_val_checkpoint")

    # ------------------------------------------------------------------
    def _train_epoch(self, epoch: int):
        config = self.config
        iter_size = config.iter_size
        data_timer, step_timer = Timer(), Timer()
        loss_meter = AverageMeter()
        data_iter = iter(self.data_loader)
        num_iter = len(self.data_loader) // iter_size
        if config.num_train_iter > 0:
            num_iter = min(num_iter, config.num_train_iter)

        grad_fn = self._grad_fn
        for it in range(num_iter):
            if iter_size == 1:
                data_timer.tic()
                batch = self._shard_batch(next(data_iter)["pair_batch"])
                data_timer.toc()
                step_timer.tic()
                (self.inlier_params, self.inlier_state, self.opt_state,
                 stats) = self._jit_step(self.inlier_params, self.inlier_state,
                                         self.opt_state, self.fcgf_params,
                                         self.fcgf_state, batch,
                                         jnp.float32(self._current_lr))
                loss = float(stats["loss"])
                step_timer.toc()
            else:
                # gradient accumulation (trainer.py:198 iter_size loop)
                acc = None
                loss = 0.0
                for _ in range(iter_size):
                    data_timer.tic()
                    batch = next(data_iter)["pair_batch"]
                    data_timer.toc()
                    grads, (self.inlier_state, stats) = grad_fn(
                        self.inlier_params, self.inlier_state, self.fcgf_params,
                        self.fcgf_state, batch)
                    loss += float(stats["loss"]) / iter_size
                    grads = jax.tree.map(lambda g: g / iter_size, grads)
                    acc = grads if acc is None else jax.tree.map(jnp.add, acc, grads)
                finite = all(np.isfinite(np.asarray(g)).all()
                             for g in jax.tree.leaves(acc))
                if finite:
                    updates, self.opt_state = self.optimizer.update(
                        acc, self.opt_state, self.inlier_params)
                    lr = jnp.float32(self._current_lr)  # unit-LR optimizer
                    updates = jax.tree.map(lambda u: lr * u, updates)
                    self.inlier_params = optax.apply_updates(self.inlier_params, updates)
                else:
                    self.log.warning("NaN accumulated grads, skipping step")

            loss_meter.update(loss)
            self.curr_iter += 1
            if self.curr_iter % config.stat_freq == 0:
                labels = np.asarray(stats["labels"])
                valid = np.asarray(stats["valid"])
                cls = _classification_stats(np.asarray(stats["logits"]),
                                            labels, valid)
                # train-side hit ratio (reference trainer.py:395): the GT
                # positive rate of the predicted 1-NN correspondences — the
                # base rate the BCE fights when features are weak.
                cls["hit_ratio"] = float((labels * valid).sum()
                                         / max(valid.sum(), 1))
                self.writer.add_scalar("train/loss", loss_meter.avg, self.curr_iter)
                for k, v in cls.items():
                    self.writer.add_scalar(f"train/{k}", v, self.curr_iter)
                self.log.info(
                    "epoch %d iter %d loss %.4f data %.3fs step %.3fs f1 %.3f "
                    "hit %.3f", epoch, it, loss_meter.avg, data_timer.avg,
                    step_timer.avg, cls["f1"], cls["hit_ratio"])
                loss_meter.reset()

    # ------------------------------------------------------------------
    def _valid_epoch(self) -> Dict[str, float]:
        """Validation metrics (trainer.py:353-489): classification stats +
        registration RTE/RRE/success via the per-pair weighted Procrustes."""
        config = self.config
        loss_fn = self._val_stats_fn
        n_pairs = 0
        agg = {k: 0.0 for k in ["precision", "recall", "f1", "tpr", "tnr",
                                "balanced_accuracy", "hit_ratio"]}
        rtes, rres, succ = [], [], []
        it = iter(self.val_data_loader)
        num_iter = min(len(self.val_data_loader), config.val_max_iter)
        for _ in range(num_iter):
            batch = next(it)["pair_batch"]
            stats = loss_fn(self.inlier_params, self.inlier_state, self.fcgf_params,
                            self.fcgf_state, batch)
            cls = _classification_stats(np.asarray(stats["logits"]),
                                        np.asarray(stats["labels"]),
                                        np.asarray(stats["valid"]))
            # hit ratio == reference trainer.py:395 exactly:
            # is_correct.sum() / len(is_correct), where is_correct is the GT
            # label of every predicted 1-NN correspondence; our `valid` mask
            # only removes padding rows, which the reference's concatenated
            # (unpadded) batch doesn't have.
            labels, valid = np.asarray(stats["labels"]), np.asarray(stats["valid"])
            cls["hit_ratio"] = float((labels * valid).sum() / max(valid.sum(), 1))
            for k in agg:
                agg[k] += cls[k]
            R = np.asarray(stats["R"])
            t = np.asarray(stats["t"])
            T_gt = np.asarray(batch.T_gt)
            for i in range(R.shape[0]):
                rte = float(np.linalg.norm(t[i] - T_gt[i, :3, 3]))
                rre = float(np.rad2deg(metric_ops.rotation_error(
                    jnp.asarray(R[i]), jnp.asarray(T_gt[i, :3, :3]))))
                rtes.append(rte)
                rres.append(rre)
                succ.append(rte < config.success_rte_thresh and
                            rre < config.success_rre_thresh)
            n_pairs += 1
        out = {k: v / max(n_pairs, 1) for k, v in agg.items()}
        out.update(rte=float(np.mean(rtes)), rre=float(np.mean(rres)),
                   succ_rate=float(np.mean(succ)))
        self.log.info("validation: %s", {k: round(v, 4) for k, v in out.items()})
        return out

    # ------------------------------------------------------------------
    def _save_checkpoint(self, epoch: int, filename: str = "checkpoint"):
        """Reference checkpoint schema (trainer.py:527-549). Size knobs
        (--ckpt_dtype/--ckpt_compress/--ckpt_save_*) keep the dense-6D-kernel
        checkpoints < 500 MB by default (raw f32 + optimizer was ~1.9 GB)."""
        path = osp.join(self.out_dir, filename + ".pkl")
        cfg = self.config
        save_fcgf = bool(getattr(cfg, "ckpt_save_fcgf", True))
        save_opt = bool(getattr(cfg, "ckpt_save_optimizer", False))
        ckpt_utils.save_checkpoint(
            path, epoch=epoch,
            params=self.fcgf_params if save_fcgf else None,
            state=self.fcgf_state if save_fcgf else None,
            inlier_params=self.inlier_params, inlier_state=self.inlier_state,
            opt_state=self.opt_state if save_opt else None,
            config={k: v for k, v in vars(cfg).items()
                    if isinstance(v, (int, float, str, bool, type(None)))},
            best_val=self.best_val, best_val_epoch=self.best_val_epoch,
            best_val_metric=self.best_val_metric,
            dtype=str(getattr(cfg, "ckpt_dtype", "f32") or "f32"),
            compress=bool(getattr(cfg, "ckpt_compress", False)))
        self.log.info("saved checkpoint %s (epoch %d)", path, epoch)

    def _load_weights(self, resume_path: str):
        """Resume epoch/model/optimizer/best-val (trainer.py:491-525)."""
        state = ckpt_utils.load_checkpoint(resume_path)
        self.start_epoch = state["epoch"] + 1
        if state.get("state_dict") is not None:
            self.fcgf_params = jax.tree.map(jnp.asarray, state["state_dict"]["params"])
            self.fcgf_state = jax.tree.map(jnp.asarray, state["state_dict"]["state"])
        else:  # --ckpt_save_fcgf=false checkpoints: keep the FCGF already
            # loaded from --weights (the feature net is frozen during training)
            self.log.info("checkpoint has no FCGF tree; keeping current "
                          "feature-net weights")
        si = state["state_dict_inlier"]
        self.inlier_params = jax.tree.map(jnp.asarray, si["params"])
        self.inlier_state = jax.tree.map(jnp.asarray, si["state"])
        if state.get("optimizer") is not None:
            self.opt_state = jax.tree.map(
                lambda proto, saved: jnp.asarray(saved) if hasattr(proto, "shape") else saved,
                self.opt_state, state["optimizer"])
        self.best_val = state.get("best_val", -1e8)
        self.best_val_epoch = state.get("best_val_epoch", -1)
        self.log.info("resumed from %s at epoch %d", resume_path, self.start_epoch)
