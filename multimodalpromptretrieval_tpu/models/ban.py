"""Bilinear Attention Network fusion (JAX port of the BAN variant's ops).

Re-implements network/connect.py (FCNet, BCNet — Boliu.Kelvin 2020, vendored
by the reference) and the BiAttention / BiResNet modules of
architectures/T5VisionModelPredictionHeadBAN.py with the same math:

  * every Linear is ``torch.nn.utils.weight_norm(..., dim=None)``:
    w = g · v / ||v||_F with a **scalar** g (ops/layers.weight_norm_kernel);
  * FCNet applies [dropout?, weight-normed linear, activation] per stage and
    — faithfully — an activation after the LAST layer too when act != '';
  * BCNet with glimpse g ≤ 32 uses the broadcast ``h_mat`` path
    (network/connect.py:86-92) and is itself weight-normed on h_mat;
  * BiAttention masks image rows whose features are all-zero and softmaxes
    over the flattened (v·q) grid per glimpse;
  * BiResNet runs glimpse sequential bilinear pools with FCNet residual
    question updates and sums over the sequence axis;
  * the reference hardcodes glimpse=10 regardless of config (quirk #9) —
    callers decide; nothing here reads the config.

Dropout is active only when an rng key is passed (training); eval is
deterministic, matching ``model.eval()`` in the reference driver.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from multimodalpromptretrieval_tpu.ops.layers import (
    dropout as _dropout,
    weight_norm_kernel,
)

Params = Dict[str, Any]


# -- FCNet ------------------------------------------------------------------


def init_fcnet(key, dims: Sequence[int]) -> List[Params]:
    layers = []
    ks = jax.random.split(key, len(dims) - 1)
    for i in range(len(dims) - 1):
        # torch Linear default init: U(-1/sqrt(in), 1/sqrt(in)); weight_norm
        # then re-parameterizes v=w, g=||w||_F at wrap time.
        bound = dims[i] ** -0.5
        v = jax.random.uniform(ks[i], (dims[i], dims[i + 1]),
                               minval=-bound, maxval=bound)
        g = jnp.sqrt(jnp.sum(jnp.square(v)))
        b = jax.random.uniform(jax.random.fold_in(ks[i], 1), (dims[i + 1],),
                               minval=-bound, maxval=bound)
        layers.append({"v": v, "g": g, "b": b})
    return layers


def fcnet_apply(layers: List[Params], x, *, act: str = "relu",
                dropout: float = 0.0, rng=None):
    for i, p in enumerate(layers):
        if dropout > 0.0 and rng is not None:
            rng, sub = jax.random.split(rng)
            x = _dropout(x, dropout, sub)
        w = weight_norm_kernel(p["v"], p["g"])
        x = jnp.dot(x, w) + p["b"]
        if act == "relu":
            x = jax.nn.relu(x)
    return x


# -- BCNet (glimpse h_mat path + forward_with_weights) ------------------------


def init_bcnet(key, v_dim: int, q_dim: int, h_dim: int,
               glimpse: Optional[int], k: int) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p: Params = {
        "v_net": init_fcnet(k1, [v_dim, h_dim * k]),
        "q_net": init_fcnet(k2, [q_dim, h_dim * k]),
    }
    if glimpse is not None:
        assert glimpse <= 32, "h_net path (glimpse > 32) is not used by BAN"
        hv = jax.random.normal(k3, (1, glimpse, 1, h_dim * k))
        p["h_mat"] = {"v": hv, "g": jnp.sqrt(jnp.sum(jnp.square(hv)))}
        p["h_bias"] = jax.random.normal(k4, (1, glimpse, 1, 1))
    return p


def bcnet_logits(p: Params, v, q, *, k: int, dropout=(0.2, 0.5), rng=None):
    """b x glimpse x v x q bilinear logits (network/connect.py:86-92)."""
    r1 = r2 = r3 = None
    if rng is not None:
        r1, r2, r3 = jax.random.split(rng, 3)
    v_ = fcnet_apply(p["v_net"], v, dropout=dropout[0], rng=r1)
    v_ = _dropout(v_, dropout[1], r3)[:, None]          # (b, 1, v, h·k)
    q_ = fcnet_apply(p["q_net"], q, dropout=dropout[0], rng=r2)  # (b, q, h·k)
    h_mat = weight_norm_kernel(p["h_mat"]["v"], p["h_mat"]["g"])
    h_ = v_ * h_mat                                     # (b, g, v, h·k)
    logits = jnp.einsum("bgvh,bqh->bgvq", h_, q_)
    return logits + p["h_bias"]


def bcnet_forward_with_weights(p: Params, v, q, w, *, k: int,
                               dropout: float = 0.2, rng=None):
    """v'ᵀ · w · q' with k-avg-pool sum-pooling (network/connect.py:95-105).

    v: (b, nv, v_dim), q: (b, nq, q_dim), w: (b, nv, nq) -> (b, h_dim).
    The v_net/q_net FCNets carry their own Dropout(0.2) (BCNet builds
    FCNet([...], dropout=dropout[0]) — network/connect.py:55-56), active
    in reference training mode; pass an rng to enable it here.
    """
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    v_ = fcnet_apply(p["v_net"], v, dropout=dropout, rng=r1)  # (b, nv, h·k)
    q_ = fcnet_apply(p["q_net"], q, dropout=dropout, rng=r2)  # (b, nq, h·k)
    # (b, d, 1, nv) @ (b, 1->d?, nv, nq): reference lifts w to (b,1,nv,nq) and
    # broadcasts over d: logits_d = vᵀ_d W q_d
    logits = jnp.einsum("bvd,bvq,bqd->bd", v_, w, q_)
    if k > 1:
        # AvgPool1d(k, stride k) * k == sum over each k-chunk
        b, d = logits.shape
        logits = logits.reshape(b, d // k, k).sum(-1)
    return logits


# -- BiAttention / BiResNet ----------------------------------------------------


def init_biattention(key, x_dim: int, y_dim: int, z_dim: int,
                     glimpse: int) -> Params:
    return {"logits": init_bcnet(key, x_dim, y_dim, z_dim, glimpse, k=3)}


def biattention_apply(p: Params, v, q, *, v_mask: bool = True,
                      q_valid=None, rng=None):
    """Returns (attention (b,g,nv,nq), raw logits).

    ``q_valid`` (b, nq) bool marks the question columns that exist under
    the reference's padding="longest" layout (BAN.py:122-124): the
    reference softmaxes over the flattened v·q grid INCLUDING every
    padded column up to the batch's longest row, so its attention mass
    depends on that width. A fixed bucket width adds columns the
    reference never sees; masking them to -inf makes the bucketed layout
    bit-equal to longest-padding (see ban_logits in models/mprgen.py)."""
    logits = bcnet_logits(p["logits"], v, q, k=3, rng=rng)
    if v_mask:
        mask = (jnp.sum(jnp.abs(v), axis=2) == 0)[:, None, :, None]
        logits = jnp.where(mask, -jnp.inf, logits)
    if q_valid is not None:
        logits = jnp.where(q_valid[:, None, None, :], logits, -jnp.inf)
    b, g, nv, nq = logits.shape
    att = jax.nn.softmax(logits.reshape(b, g, nv * nq), axis=2)
    return att.reshape(b, g, nv, nq), logits


def init_biresnet(key, v_dim: int, q_dim: int, glimpse: int) -> Params:
    ks = jax.random.split(key, 2 * glimpse)
    return {
        "b_net": [init_bcnet(ks[2 * i], v_dim, q_dim, q_dim, None, k=1)
                  for i in range(glimpse)],
        "q_prj": [init_fcnet(ks[2 * i + 1], [q_dim, q_dim])
                  for i in range(glimpse)],
    }


def biresnet_apply(p: Params, v_emb, q_emb, att, *, q_valid=None, rng=None):
    """Sequential glimpse fusion -> (b, q_dim). glimpse = len(p["b_net"]).

    ``q_valid`` (b, nq) bool: the reference's final ``q_emb.sum(1)``
    (BAN.py:75) runs over every longest-padding position; columns a
    fixed bucket width adds beyond that must not enter the sum (their
    attention is already zero via biattention_apply's q_valid mask, so
    b_emb needs no change — w is exactly 0 there)."""
    for g in range(len(p["b_net"])):
        sub_b = sub_q = None
        if rng is not None:
            rng, sub_b, sub_q = jax.random.split(rng, 3)
        b_emb = bcnet_forward_with_weights(
            p["b_net"][g], v_emb, q_emb, att[:, g], k=1, rng=sub_b)
        # q_prj: FCNet([q,q], act='', dropout=.2) — no activation
        upd = fcnet_apply(p["q_prj"][g], b_emb[:, None], act="",
                          dropout=0.2, rng=sub_q)
        q_emb = upd + q_emb
    if q_valid is not None:
        q_emb = jnp.where(q_valid[:, :, None], q_emb, 0.0)
    return q_emb.sum(axis=1)
