"""Bipartite matcher for DETR training — fully jittable.

The torch DETR matcher calls scipy ``linear_sum_assignment`` on host; under
jit/SPMD that would be a host callback every step. Instead this uses the
**auction algorithm** (Bertsekas 1988): unassigned targets bid for their
best query under an epsilon price war; for eps small the final assignment
is within T*eps of optimal. A Jacobi (all-bidders-per-sweep) formulation
compiles to pure XLA ops — no host round-trip, vmappable over the batch,
shardable over the data mesh axis.

Matching cost (DETR paper, arXiv:2005.12872 §3.1; reference analog is the
spec'd ViT/DETR detector, .kiro/specs design.md:235-268):
  C = w_class * (-p(class)) + w_bbox * L1(cxcywh) + w_giou * (-GIoU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from ..ops.boxes import cxcywh_to_xyxy, generalized_iou_xyxy

NEG_INF = -1e9


def auction_assignment(
    benefit: Array, num_iters: int = 200, eps: float = 1e-3
) -> Array:
    """Maximize total benefit assigning each row a distinct column.

    benefit: (T, Q) with T <= Q. Returns (T,) int32: column per row.
    Runs a fixed-trip-count loop (jit/SPMD friendly); rows left unassigned
    by the price war (only possible if num_iters is too small) are patched
    greedily at the end, so the result is always a valid matching.
    """
    T, Q = benefit.shape
    rows = jnp.arange(T)
    cols = jnp.arange(Q)

    def body(_, carry):
        price, owner, col_of = carry
        unassigned = col_of < 0  # (T,)
        value = benefit - price[None, :]  # (T, Q)
        best_col = jnp.argmax(value, axis=1)  # (T,)
        v1 = jnp.max(value, axis=1)
        v2 = jnp.max(value.at[rows, best_col].set(NEG_INF), axis=1)
        bid = v1 - v2 + eps  # (T,)

        # Per-column best bid among unassigned rows targeting it.
        contrib = jnp.where(
            unassigned[:, None] & (best_col[:, None] == cols[None, :]),
            bid[:, None],
            NEG_INF,
        )  # (T, Q)
        col_bid = jnp.max(contrib, axis=0)  # (Q,)
        col_winner = jnp.argmax(contrib, axis=0)  # (Q,)
        won = col_bid > NEG_INF / 2  # (Q,)

        # Evict previous owners of contested columns (T used as drop slot).
        evicted = jnp.where(won & (owner >= 0), owner, T)  # (Q,)
        col_of = col_of.at[evicted].set(-1, mode="drop")
        # Assign winners.
        winner_rows = jnp.where(won, col_winner, T)  # (Q,)
        col_of = col_of.at[winner_rows].set(cols, mode="drop")
        owner = jnp.where(won, col_winner, owner)
        price = jnp.where(won, price + col_bid, price)
        return price, owner, col_of

    price0 = jnp.zeros((Q,), benefit.dtype)
    owner0 = jnp.full((Q,), -1, jnp.int32)
    col0 = jnp.full((T,), -1, jnp.int32)
    _, _, col_of = jax.lax.fori_loop(0, num_iters, body, (price0, owner0, col0))

    # Greedy patch-up for any leftover unassigned rows.
    def fix(i, col_of):
        taken = jnp.zeros((Q,), bool).at[
            jnp.where(col_of >= 0, col_of, Q)
        ].set(True, mode="drop")
        free_value = jnp.where(taken, NEG_INF, benefit[i])
        return jax.lax.cond(
            col_of[i] < 0,
            lambda c: c.at[i].set(jnp.argmax(free_value).astype(jnp.int32)),
            lambda c: c,
            col_of,
        )

    return jax.lax.fori_loop(0, T, fix, col_of)


def matching_cost(
    logits: Array,
    pred_boxes: Array,
    tgt_labels: Array,
    tgt_boxes: Array,
    w_class: float = 1.0,
    w_bbox: float = 5.0,
    w_giou: float = 2.0,
    class_cost: str = "ce",
    focal_alpha: float = 0.25,
    focal_gamma: float = 2.0,
) -> Array:
    """(Q, C+1) logits, (Q, 4) cxcywh preds, (T,) labels, (T, 4) cxcywh GT
    -> (T, Q) cost."""
    if class_cost == "focal":
        # Deformable-DETR matcher cost (arXiv:2010.04159, reference code
        # HungarianMatcher): positive-minus-negative focal terms at the
        # target class, over per-class sigmoids of the REAL classes.
        prob = jax.nn.sigmoid(logits[..., :-1].astype(jnp.float32))  # (Q, C)
        neg = ((1.0 - focal_alpha) * prob ** focal_gamma
               * (-jnp.log1p(-jnp.clip(prob, None, 1.0 - 1e-8))))
        pos = (focal_alpha * (1.0 - prob) ** focal_gamma
               * (-jnp.log(jnp.clip(prob, 1e-8, None))))
        cost_class = (pos - neg)[:, tgt_labels].T  # (T, Q)
    else:
        prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)  # (Q, C+1)
        cost_class = -prob[:, tgt_labels].T  # (T, Q)
    cost_bbox = jnp.sum(
        jnp.abs(tgt_boxes[:, None, :] - pred_boxes[None, :, :]), axis=-1
    )  # (T, Q)
    giou = generalized_iou_xyxy(
        cxcywh_to_xyxy(tgt_boxes), cxcywh_to_xyxy(pred_boxes)
    )  # (T, Q)
    return w_class * cost_class + w_bbox * cost_bbox + w_giou * (-giou)


def hungarian_match(
    logits: Array,
    pred_boxes: Array,
    tgt_labels: Array,
    tgt_boxes: Array,
    tgt_valid: Array,
    num_iters: int = 200,
    class_cost: str = "ce",
    focal_alpha: float = 0.25,
    focal_gamma: float = 2.0,
) -> Array:
    """Per-sample matching. Padded target slots (tgt_valid False) get a flat
    zero cost row so they absorb leftover queries without influencing real
    matches. Returns (T,) int32 query index per target slot."""
    T, Q = tgt_labels.shape[0], logits.shape[0]
    if T > Q:
        # An assignment of T rows to Q distinct columns is infeasible for
        # T > Q: the auction's price war never terminates and the returned
        # matching is effectively random — which silently freezes training
        # (every round-5 DETR-small run: Q=25 vs the trainer's padded
        # max_targets=32; box losses pinned at init for hundreds of epochs).
        # Static shapes make this a trace-time error, not a device check.
        raise ValueError(
            f"hungarian_match needs padded target capacity T <= num_queries "
            f"(got T={T} > Q={Q}); clamp the target capacity (e.g. "
            f"train_detr --max-targets) to the model's query count"
        )
    cost = matching_cost(logits, pred_boxes, tgt_labels, tgt_boxes,
                         class_cost=class_cost, focal_alpha=focal_alpha,
                         focal_gamma=focal_gamma)
    cost = jnp.where(tgt_valid[:, None], cost, 0.0)
    return auction_assignment(-cost, num_iters=num_iters)


#: vmapped over the batch: (B,Q,C+1),(B,Q,4),(B,T),(B,T,4),(B,T) -> (B,T)
batch_hungarian_match = jax.vmap(
    hungarian_match, in_axes=(0, 0, 0, 0, 0, None, None, None, None)
)
