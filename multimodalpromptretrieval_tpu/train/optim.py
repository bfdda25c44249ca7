"""Pure-JAX AdamW + host-side ReduceLROnPlateau.

The reference trains with ``torch.optim.AdamW(model.parameters(), lr=lr)``
and ``torch.optim.lr_scheduler.ReduceLROnPlateau(optimizer)`` — all defaults
(main.py:148-150). Torch defaults reproduced exactly:

  * AdamW: betas (0.9, 0.999), eps 1e-8, weight_decay 1e-2, bias-corrected
    moments, decoupled weight decay ``p -= lr * wd * p`` applied before the
    Adam step on the *current* params;
  * ReduceLROnPlateau: mode 'min', factor 0.1, patience 10, threshold 1e-4
    (relative), cooldown 0, min_lr 0.

The update is a single jitted pytree pass; a boolean ``trainable`` mask
pytree freezes sub-trees (the CLIP tower always; everything but the shared
embedding under ``freeze`` — models/mprgen.trainable_mask).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def adamw_init(params: Params, moments_dtype=None) -> Params:
    """Zero AdamW state. ``moments_dtype`` (e.g. ``jnp.bfloat16`` or the
    config string "bfloat16") stores mu/nu at reduced precision — the
    moment math still runs in fp32 inside :func:`adamw_update` (cast up,
    update, round-to-nearest back down), so this trades a small,
    measured trajectory drift for half the optimizer HBM footprint and
    traffic. Opt-in via the ``adamw_moments_dtype`` config key; the
    default (None) keeps torch-exact fp32 moments."""
    dt = jnp.dtype(moments_dtype) if moments_dtype is not None else None
    zeros = lambda p: jax.tree.map(  # noqa: E731
        lambda x: jnp.zeros_like(x, dtype=dt or x.dtype), p)
    return {"mu": zeros(params), "nu": zeros(params),
            "step": jnp.zeros((), jnp.int32)}


def adamw_update(
    params: Params, grads: Params, state: Params, lr,
    *, beta1: float = 0.9, beta2: float = 0.999, eps: float = 1e-8,
    weight_decay: float = 1e-2, trainable: Optional[Params] = None,
):
    """One AdamW step. ``lr`` may be a traced scalar (scheduler-controlled).

    Returns (new_params, new_state).
    """
    step = state["step"] + 1
    c1 = 1.0 - beta1 ** step.astype(jnp.float32)
    c2 = 1.0 - beta2 ** step.astype(jnp.float32)

    def leaf(p, g, m, v, t):
        if t is False:
            return p, m, v
        # reduced-precision moment storage (adamw_init moments_dtype):
        # the moment math always runs in fp32; stores round-to-nearest
        mdt = m.dtype
        mf = m.astype(jnp.float32) if mdt != jnp.float32 else m
        vf = v.astype(jnp.float32) if mdt != jnp.float32 else v
        g32 = g.astype(jnp.float32)
        mf = beta1 * mf + (1.0 - beta1) * g32
        vf = beta2 * vf + (1.0 - beta2) * jnp.square(g32)
        # torch AdamW: decoupled decay on current params, then Adam step
        p = p * (1.0 - lr * weight_decay)
        p = p - lr * (mf / c1) / (jnp.sqrt(vf / c2) + eps)
        return p, mf.astype(mdt), vf.astype(mdt)

    if trainable is None:
        trainable = jax.tree.map(lambda _: True, params)
    flat_p, treedef = jax.tree.flatten(params)
    flat_g = jax.tree.leaves(grads)
    flat_m = jax.tree.leaves(state["mu"])
    flat_v = jax.tree.leaves(state["nu"])
    flat_t = jax.tree.leaves(trainable)
    outs = [leaf(p, g, m, v, t)
            for p, g, m, v, t in zip(flat_p, flat_g, flat_m, flat_v, flat_t)]
    new_p = jax.tree.unflatten(treedef, [o[0] for o in outs])
    new_m = jax.tree.unflatten(treedef, [o[1] for o in outs])
    new_v = jax.tree.unflatten(treedef, [o[2] for o in outs])
    return new_p, {"mu": new_m, "nu": new_v, "step": step}


@dataclasses.dataclass
class ReduceLROnPlateau:
    """torch.optim.lr_scheduler.ReduceLROnPlateau with default args
    (mode='min', factor=0.1, patience=10, threshold=1e-4 rel, cooldown=0).

    Host-side: the returned lr feeds the jitted update as a scalar.
    """

    lr: float
    factor: float = 0.1
    patience: int = 10
    threshold: float = 1e-4
    min_lr: float = 0.0
    best: float = float("inf")
    num_bad_epochs: int = 0

    def step(self, metric: float) -> float:
        # torch 'rel' threshold_mode: better if metric < best * (1 - thr)
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.num_bad_epochs = 0
        return self.lr
