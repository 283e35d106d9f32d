"""Optimizers and epoch-wise LR scheduling (optax).

Parity targets:
- ``utils/optimizers/optimizers.py`` — adam / adamw / sgd factories.
- ``utils/optimizers/schedulers.py`` — linear warmup for the first
  ``warmup_epochs`` epochs, then one of cosine_annealing / poly_lr /
  reducelronplateau, all stepped **per epoch** with the warmup→main handoff
  of ``select_scheduler``/``step_scheduler``.

TPU-native shape: the optimizer is built with
``optax.inject_hyperparams`` so the per-epoch learning rate is a plain
scalar hyper-parameter updated by the host-side :class:`EpochScheduler` —
no recompilation when the LR changes, and plateau scheduling (which depends
on a host-observed validation metric) stays out of the compiled step.
"""

from __future__ import annotations

import math
from typing import Optional

import optax


def build_optimizer(optimizer_type: str, optimizer_args: dict
                    ) -> optax.GradientTransformation:
    lr = float(optimizer_args["lr"])
    wd = optimizer_args.get("weight_decay")
    if optimizer_type == "adam":
        def make(learning_rate):
            tx = optax.adam(learning_rate)
            if wd:
                # torch Adam's weight_decay is L2-added-to-grad.
                tx = optax.chain(optax.add_decayed_weights(float(wd)), tx)
            return tx
        return optax.inject_hyperparams(
            lambda learning_rate: make(learning_rate))(learning_rate=lr)
    if optimizer_type == "adamw":
        # optax.flatten fuses the per-leaf update chain into one flat
        # buffer — ~300 param leaves otherwise cost ~5 ms/step of
        # per-buffer dispatch on TPU (see PERF_NOTES.md).
        return optax.inject_hyperparams(
            lambda learning_rate: optax.flatten(optax.adamw(
                learning_rate, weight_decay=float(wd))))(learning_rate=lr)
    if optimizer_type == "sgd":
        momentum = optimizer_args.get("momentum")
        def make_sgd(learning_rate):
            tx = optax.sgd(learning_rate, momentum=momentum)
            if wd:
                tx = optax.chain(optax.add_decayed_weights(float(wd)), tx)
            return tx
        return optax.inject_hyperparams(
            lambda learning_rate: make_sgd(learning_rate))(learning_rate=lr)
    raise ValueError("must be adam or adamw for now")


class EpochScheduler:
    """Epoch-indexed LR with warmup handoff and plateau support."""

    def __init__(self, config):
        self.base_lr = float(
            config["optimizer"]["optimizer_args"]["lr"])
        warm = config.get("warmup_scheduler", {})
        self.warmup_epochs = (int(warm.get("warmup_epochs", 0))
                              if warm.get("enabled", False) else 0)
        sched = config["train_scheduler"]
        self.scheduler_type = sched["scheduler_type"]
        self.args = sched.get("scheduler_args", {})
        self.epochs = int(config["epochs"])
        # reducelronplateau state
        self.mode = sched.get("mode", "max")
        self.patience = int(sched.get("patience", 10))
        self.factor = 0.1
        self.min_lr = float(self.args.get("min_lr", 0.0))
        self._plateau_scale = 1.0
        self._best: Optional[float] = None
        self._bad_epochs = 0

    def learning_rate(self, epoch: int) -> float:
        """LR in effect during ``epoch`` (0-indexed), reference stepping."""
        w = self.warmup_epochs
        if epoch < w:
            return self.base_lr * (epoch + 1) / w
        t = epoch - w
        if self.scheduler_type == "cosine_annealing":
            t_max = int(self.args["epochs"])
            eta_min = float(self.args["min_lr"])
            t = min(t, t_max)
            return eta_min + (self.base_lr - eta_min) * 0.5 * (
                1.0 + math.cos(math.pi * t / t_max))
        if self.scheduler_type == "poly_lr":
            total = self.epochs - w
            power = float(self.args["power"])
            frac = min(t, total) / total
            return self.base_lr * (1.0 - frac) ** power
        if self.scheduler_type == "reducelronplateau":
            return max(self.base_lr * self._plateau_scale, self.min_lr)
        raise NotImplementedError(
            "Specified Scheduler Is Not Implemented")

    def plateau_step(self, metric: float) -> None:
        """Update plateau state with a validation metric (mode-aware)."""
        if self.scheduler_type != "reducelronplateau":
            return
        better = (self._best is None
                  or (self.mode == "max" and metric > self._best)
                  or (self.mode == "min" and metric < self._best))
        if better:
            self._best = metric
            self._bad_epochs = 0
        else:
            self._bad_epochs += 1
            if self._bad_epochs > self.patience:
                self._plateau_scale *= self.factor
                self._bad_epochs = 0

    def state_dict(self) -> dict:
        return {"plateau_scale": self._plateau_scale, "best": self._best,
                "bad_epochs": self._bad_epochs}

    def load_state_dict(self, d: dict) -> None:
        self._plateau_scale = d.get("plateau_scale", 1.0)
        self._best = d.get("best")
        self._bad_epochs = d.get("bad_epochs", 0)


def build_lr_schedule(config) -> EpochScheduler:
    return EpochScheduler(config)
