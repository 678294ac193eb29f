"""Map/pose state pytrees and the mapping optimizer.

Reference optimizer (volsdf_train.py:150-174): one Adam(betas=(0.9, 0.99),
eps=1e-15) over six parameter groups with per-group learning rates:

  group            lr
  fine grid        base_lr * lr_factor_for_fine_grid    (20x)
  coarse grid      base_lr * lr_factor_for_coarse_grid  (20x)
  color grid       base_lr * lr_factor_for_color_grid   (5x)
  color MLP        base_lr
  density (beta)   learning_rate_beta (2e-3)
  coarse MLP       base_lr

Deliberately ABSENT from the optimizer (and therefore frozen):
  * the fine SDF MLP — its weights come from pretrain.pth
    (volsdf_train.py:140-147)
  * per-image embeddings of the rendering net (not in mlp_parameters()).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax


class OptimConfig(NamedTuple):
    learning_rate: float = 0.002
    learning_rate_beta: float = 2.0e-3
    lr_factor_for_fine_grid: float = 1.0
    lr_factor_for_coarse_grid: float = 1.0
    lr_factor_for_color_grid: float = 1.0


def param_labels(params: Dict[str, Any]) -> Dict[str, Any]:
    """Mirror pytree of group labels for optax.multi_transform."""

    def lab(sub, label):
        return jax.tree.map(lambda _: label, sub)

    labels: Dict[str, Any] = {
        "implicit": {
            "coarse": {
                "encoding": "coarse_grid",
                "lins": lab(params["implicit"]["coarse"]["lins"], "coarse_mlp"),
            },
            "fine": {
                "encoding": "fine_grid",
                "lins": lab(params["implicit"]["fine"]["lins"], "frozen"),
            },
        },
        "render": {},
    }
    for k, v in params["render"].items():
        if k == "encoding":
            labels["render"][k] = "color_grid"
        elif k == "lins":
            labels["render"][k] = lab(v, "color_mlp")
        elif k == "exp_lins":
            labels["render"][k] = lab(v, "color_mlp")
        else:  # per-image embeddings: frozen, as in the reference
            labels["render"][k] = lab(v, "frozen")
    if "density" in params:
        labels["density"] = lab(params["density"], "density")
    return labels


def make_optimizer(cfg: OptimConfig, params: Dict[str, Any]) -> optax.GradientTransformation:
    def adam(lr):
        return optax.adam(lr, b1=0.9, b2=0.99, eps=1e-15)

    transforms = {
        "fine_grid": adam(cfg.learning_rate * cfg.lr_factor_for_fine_grid),
        "coarse_grid": adam(cfg.learning_rate * cfg.lr_factor_for_coarse_grid),
        "color_grid": adam(cfg.learning_rate * cfg.lr_factor_for_color_grid),
        "color_mlp": adam(cfg.learning_rate),
        "coarse_mlp": adam(cfg.learning_rate),
        "density": adam(cfg.learning_rate_beta),
        "frozen": optax.set_to_zero(),
    }
    return optax.multi_transform(transforms, param_labels(params))


# ---------------------------------------------------------------------------
# Minimal hand-rolled Adam for camera tensors (torch defaults:
# betas=(0.9, 0.999), eps=1e-8, bias-corrected) — used inside lax.scan where
# the learning rate changes per step (tracking's StepLR(50, 0.95),
# volsdf_train.py:396-398).
# ---------------------------------------------------------------------------

class AdamState(NamedTuple):
    m: jnp.ndarray
    v: jnp.ndarray
    step: jnp.ndarray  # int32


def adam_init(x: jnp.ndarray) -> AdamState:
    return AdamState(jnp.zeros_like(x), jnp.zeros_like(x),
                     jnp.zeros((), jnp.int32))


def adam_update(state: AdamState, grad: jnp.ndarray, lr,
                b1: float = 0.9, b2: float = 0.999,
                eps: float = 1e-8):
    step = state.step + 1
    m = b1 * state.m + (1 - b1) * grad
    v = b2 * state.v + (1 - b2) * grad * grad
    mhat = m / (1 - b1 ** step.astype(jnp.float32))
    vhat = v / (1 - b2 ** step.astype(jnp.float32))
    update = -lr * mhat / (jnp.sqrt(vhat) + eps)
    return update, AdamState(m, v, step)


def fresh_adam_single_step(grad: jnp.ndarray, lr: float,
                           eps: float = 1e-8) -> jnp.ndarray:
    """The BA camera update of the reference: a fresh Adam is constructed
    every mapping iteration and stepped exactly once
    (volsdf_train.py:511-528, 575-578). Adam's first bias-corrected step is
    -lr * g / (|g| + eps)."""
    return -lr * grad / (jnp.abs(grad) + eps)
