"""Fully-jitted multi-object tracker: one ``lax.scan`` over the frame axis.

SURVEY.md §7.4 hard part 3 calls out "sequential stateful tracking under
jit — ``lax.scan`` over frames with a masked LAP inside". The cascade
tracker (tracking/tracker.py) keeps the reference's exact 5-stage host
semantics (reference src/tracking/tracker.py:71-315) with jitted cost
kernels; THIS tracker is the TPU-native formulation: struct-of-arrays
track state with a fixed capacity + validity mask, Kalman
predict/update vmapped over slots, a fused IoU+appearance cost matrix,
and the jitted greedy LAP (ops/assignment.py::greedy_assignment_jit —
the reference's own fallback association, hungarian.py:64-93) — the
WHOLE dense-tracking sequence runs as a single device program with one
dispatch, instead of a host round trip per frame.

Association quality matches the cascade tracker on clean/noisy synthetic
sequences (tests/test_scan_tracker.py); the cascade remains the default
(``tracking.engine: cascade``) because its staged semantics are the
reference contract — select this one with ``tracking.engine: scan`` for
long dense sequences.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from ..ops.assignment import greedy_assignment_jit
from ..ops.boxes import center_xywh, iou_matrix_xywh
from ..ops.kalman import KFState, kf_init, kf_predict, kf_update

BIG = 1e9


class TrackState(NamedTuple):
    """SoA track slots (capacity T)."""

    kf_x: Array      # (T, 4) [px, py, vx, vy] — box centers
    kf_P: Array      # (T, 4, 4)
    bbox: Array      # (T, 4) last matched xywh
    feat: Array      # (T, Fd) EMA appearance feature (L2-normed)
    active: Array    # (T,) bool
    age: Array       # (T,) i32 frames since last match
    hits: Array      # (T,) i32
    ids: Array       # (T,) i32 assigned track ids (0 = unassigned slot)
    next_id: Array   # () i32


def init_state(capacity: int, feat_dim: int) -> TrackState:
    return TrackState(
        kf_x=jnp.zeros((capacity, 4), jnp.float32),
        kf_P=jnp.tile(jnp.eye(4, dtype=jnp.float32), (capacity, 1, 1)),
        bbox=jnp.zeros((capacity, 4), jnp.float32),
        feat=jnp.zeros((capacity, feat_dim), jnp.float32),
        active=jnp.zeros((capacity,), bool),
        age=jnp.zeros((capacity,), jnp.int32),
        hits=jnp.zeros((capacity,), jnp.int32),
        ids=jnp.zeros((capacity,), jnp.int32),
        next_id=jnp.int32(1),
    )


@partial(
    jax.jit,
    static_argnames=(
        "max_age", "min_hits", "appearance_weight", "motion_weight", "max_cost",
        "init_conf", "feature_alpha", "max_position_distance",
    ),
)
def scan_track(
    state: TrackState,
    boxes: Array,          # (F, D, 4) xywh
    conf: Array,           # (F, D)
    valid: Array,          # (F, D) bool
    feats: Array,          # (F, D, Fd) L2-normed (zeros when unused)
    dts: Array,            # (F,) seconds between frames
    *,
    max_age: int = 100,
    min_hits: int = 1,
    appearance_weight: float = 0.9,
    motion_weight: float = 0.1,
    max_cost: float = 0.7,
    init_conf: float = 0.3,
    feature_alpha: float = 0.9,
    max_position_distance: float = 10000.0,
) -> tuple[TrackState, Array]:
    """Track a whole sequence in one program. Returns (final state,
    ids (F, D) i32 with -1 for unmatched/invalid detections)."""
    T = state.active.shape[0]
    D = boxes.shape[1]

    def step(st: TrackState, inp):
        bx, cf, va, ft, dt = inp

        # 1. Kalman predict for every slot (inactive slots are junk but
        # masked out of the cost matrix).
        kf = jax.vmap(lambda x, P: kf_predict(KFState(x, P), dt))(
            st.kf_x, st.kf_P
        )
        pred_center = kf.x[:, :2]                       # (T, 2)
        pred_box = jnp.concatenate(
            [pred_center - st.bbox[:, 2:] / 2, st.bbox[:, 2:]], axis=1
        )

        # 2. Fused cost: appearance cosine distance + IoU distance on the
        # predicted box, gated by predicted-position distance
        # (reference tracker.py:258-315 weighting and gating). Feature use
        # is PER PAIR: only when both the track and the detection carry a
        # (nonzero) feature — a featureless detection among featured ones
        # falls back to motion-only matching instead of being priced out.
        iou_d = 1.0 - iou_matrix_xywh(pred_box, bx)     # (T, D)
        cos_d = 1.0 - st.feat @ ft.T                    # (T, D)
        det_has = jnp.any(ft != 0, axis=1)              # (D,)
        trk_has = jnp.any(st.feat != 0, axis=1)         # (T,)
        pair_feat = trk_has[:, None] & det_has[None, :]
        cost = jnp.where(
            pair_feat,
            appearance_weight * cos_d + motion_weight * iou_d,
            iou_d,
        )
        dist = jnp.linalg.norm(
            pred_center[:, None, :] - center_xywh(bx)[None, :, :], axis=-1
        )
        gate = (
            st.active[:, None]
            & va[None, :]
            & (dist <= max_position_distance)
            # With appearance features, identity can bridge non-overlapping
            # boxes (sparse 5-min sampling — the cascade's appearance-only
            # stage does the same, reference tracker.py:146-157); without
            # features, motion-only matching requires overlap.
            & (pair_feat | (iou_d < 1.0))
        )
        cost = jnp.where(gate, cost, BIG)

        # 3. Masked greedy LAP on device.
        row, col = greedy_assignment_jit(cost, max_cost=max_cost)
        matched_t = row >= 0                            # (T,)
        det_slot = col                                  # (D,) slot or -1

        # 4. Matched slots: KF update at the det center, EMA feature.
        det_idx = jnp.clip(row, 0, D - 1)
        z = center_xywh(bx)[det_idx]                        # (T, 2)
        upd = jax.vmap(lambda x, P, z_: kf_update(KFState(x, P), z_))(
            kf.x, kf.P, z
        )
        new_feat = feature_alpha * st.feat + (1 - feature_alpha) * ft[det_idx]
        new_feat = new_feat / jnp.maximum(
            jnp.linalg.norm(new_feat, axis=1, keepdims=True), 1e-12
        )
        m = matched_t[:, None]
        kf_x = jnp.where(m, upd.x, kf.x)
        kf_P = jnp.where(m[..., None], upd.P, kf.P)
        bbox = jnp.where(m, bx[det_idx], st.bbox)
        feat = jnp.where(m & det_has[det_idx][:, None], new_feat, st.feat)
        age = jnp.where(matched_t, 0, st.age + 1)
        hits = jnp.where(matched_t, st.hits + 1, st.hits)
        active = st.active & (age <= max_age)

        # 5. Initiate new tracks from unmatched confident detections:
        # fori_loop over the (fixed, small) detection axis, allocating the
        # first inactive slot each time.
        needs_init = va & (det_slot < 0) & (cf >= init_conf)

        def init_one(d, carry):
            kf_x, kf_P, bbox, feat, active, age, hits, ids, nid, det_slot = carry
            slot = jnp.argmin(active)                   # first inactive slot
            can = needs_init[d] & ~active[slot]
            st0 = kf_init(center_xywh(bx[d]))
            kf_x = jnp.where(can, kf_x.at[slot].set(st0.x), kf_x)
            kf_P = jnp.where(can, kf_P.at[slot].set(st0.P), kf_P)
            bbox = jnp.where(can, bbox.at[slot].set(bx[d]), bbox)
            feat = jnp.where(can, feat.at[slot].set(ft[d]), feat)
            active = jnp.where(can, active.at[slot].set(True), active)
            age = jnp.where(can, age.at[slot].set(0), age)
            hits = jnp.where(can, hits.at[slot].set(1), hits)
            ids = jnp.where(can, ids.at[slot].set(nid), ids)
            det_slot = jnp.where(can, det_slot.at[d].set(slot), det_slot)
            nid = jnp.where(can, nid + 1, nid)
            return kf_x, kf_P, bbox, feat, active, age, hits, ids, nid, det_slot

        (kf_x, kf_P, bbox, feat, active, age, hits, ids, next_id, det_slot) = (
            jax.lax.fori_loop(
                0, D, init_one,
                (kf_x, kf_P, bbox, feat, active, age, hits, st.ids,
                 st.next_id, det_slot),
            )
        )

        # min_hits confirmation (reference Tracker min_hits): a detection
        # only carries a public id once its track has enough hits.
        slot_c = jnp.clip(det_slot, 0, T - 1)
        confirmed = hits[slot_c] >= min_hits
        out_ids = jnp.where((det_slot >= 0) & confirmed, ids[slot_c], -1)
        new_state = TrackState(kf_x, kf_P, bbox, feat, active, age, hits,
                               ids, next_id)
        return new_state, out_ids

    return jax.lax.scan(step, state, (boxes, conf, valid, feats, dts))


def assign_track_ids(
    frame_results,
    capacity: int = 64,
    timestamps: bool = True,
    **tracker_kw,
) -> np.ndarray:
    """Host facade: pack a FrameResult list, run the scan, write
    ``det.track_id`` back in place. Returns the (F, D) id matrix."""
    F = len(frame_results)
    D = max((len(fr.detections) for fr in frame_results), default=1) or 1
    feat_dim = 0
    for fr in frame_results:
        for d in fr.detections:
            if d.feature is not None:
                feat_dim = len(d.feature)
                break
        if feat_dim:
            break
    Fd = feat_dim or 1

    boxes = np.zeros((F, D, 4), np.float32)
    conf = np.zeros((F, D), np.float32)
    valid = np.zeros((F, D), bool)
    feats = np.zeros((F, D, Fd), np.float32)
    dts = np.ones((F,), np.float32)
    prev_ts = None
    for f, fr in enumerate(frame_results):
        ts = fr.timestamp
        if isinstance(ts, str):  # dto contract allows ISO strings
            from datetime import datetime as _dt

            try:
                ts = _dt.fromisoformat(ts)
            except ValueError:
                ts = None
        if timestamps and ts is not None and prev_ts is not None:
            dts[f] = max((ts - prev_ts).total_seconds(), 1e-3)
        if timestamps:
            # Advance by the dt we actually charged when a frame has no
            # timestamp, so the next timestamped frame doesn't double-count
            # the same interval.
            from datetime import timedelta as _td

            if ts is not None:
                prev_ts = ts
            elif prev_ts is not None:
                prev_ts = prev_ts + _td(seconds=float(dts[f]))
        for d_i, det in enumerate(fr.detections[:D]):
            boxes[f, d_i] = det.bbox
            conf[f, d_i] = det.confidence
            valid[f, d_i] = True
            if feat_dim and det.feature is not None:
                feats[f, d_i] = det.feature

    state = init_state(capacity, Fd)
    _, ids = scan_track(
        state, jnp.asarray(boxes), jnp.asarray(conf), jnp.asarray(valid),
        jnp.asarray(feats), jnp.asarray(dts), **tracker_kw,
    )
    ids_np = np.asarray(ids)
    for f, fr in enumerate(frame_results):
        for d_i, det in enumerate(fr.detections[:D]):
            det.track_id = int(ids_np[f, d_i]) if ids_np[f, d_i] >= 0 else None
    return ids_np
