"""Vectorized point-in-polygon zone classification.

TPU-native replacement for the reference's per-point/per-zone Python ray-cast
loop (reference src/zone/zone_classifier.py:162-197): one broadcast ray-cast
over (points x zones x edges) padded arrays, fully jitted.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


@dataclass(frozen=True)
class PackedZones:
    """Zone polygons padded to a common vertex count for fixed shapes.

    vertices : (Z, V, 2) float32 — polygon vertices, padded by repeating the
               last real vertex (degenerate edges contribute no crossings).
    num_vertices : (Z,) int32 — real vertex counts.
    priorities : (Z,) int32 — lower value wins in priority mode.
    ids : tuple of zone id strings (host-side, not traced).
    """

    vertices: np.ndarray
    num_vertices: np.ndarray
    priorities: np.ndarray
    ids: tuple[str, ...]
    names: tuple[str, ...]

    @classmethod
    def from_config(cls, zones: list[dict]) -> "PackedZones":
        if not zones:
            return cls(
                vertices=np.zeros((0, 3, 2), np.float32),
                num_vertices=np.zeros((0,), np.int32),
                priorities=np.zeros((0,), np.int32),
                ids=(),
                names=(),
            )
        max_v = max(len(z["polygon"]) for z in zones)
        Z = len(zones)
        verts = np.zeros((Z, max_v, 2), np.float32)
        nv = np.zeros((Z,), np.int32)
        prio = np.zeros((Z,), np.int32)
        ids, names = [], []
        for i, z in enumerate(zones):
            poly = np.asarray(z["polygon"], np.float32)
            if poly.ndim != 2 or poly.shape[0] < 3 or poly.shape[1] != 2:
                raise ValueError(f"zone {z.get('id')}: polygon must be (>=3, 2)")
            verts[i, : len(poly)] = poly
            verts[i, len(poly) :] = poly[-1]  # pad with last vertex -> zero-length edges
            nv[i] = len(poly)
            prio[i] = int(z.get("priority", i + 1))
            ids.append(str(z.get("id", f"zone_{i}")))
            names.append(str(z.get("name", ids[-1])))
        return cls(verts, nv, prio, tuple(ids), tuple(names))


@jax.jit
def points_in_zones(points: Array, vertices: Array, num_vertices: Array) -> Array:
    """Ray-cast membership: points (N, 2), vertices (Z, V, 2) -> (N, Z) bool.

    Standard even-odd rule, identical semantics to the reference ray cast
    (zone_classifier.py:162-197): horizontal ray to +x, count edge crossings.
    Padded (zero-length) edges never cross.
    """
    N = points.shape[0]
    Z, V, _ = vertices.shape
    px = points[:, None, None, 0]  # (N, 1, 1)
    py = points[:, None, None, 1]

    v0 = vertices[None, :, :, :]  # (1, Z, V, 2)
    # Edge i connects vertex i to vertex (i+1) mod num_vertices; with the
    # repeated-last-vertex padding, wrapping via roll then masking edge
    # indices >= num_vertices-? is unnecessary: build v1 as the roll and fix
    # the wrap edge to connect last real vertex -> vertex 0.
    idx = jnp.arange(V)
    next_idx = jnp.where(idx[None, :] + 1 >= num_vertices[:, None], 0, idx[None, :] + 1)
    v1 = jnp.take_along_axis(vertices, next_idx[:, :, None].astype(jnp.int32), axis=1)[None]

    x0, y0 = v0[..., 0], v0[..., 1]
    x1, y1 = v1[..., 0], v1[..., 1]

    # Mask out padded edges (edge index >= real count contributes nothing
    # beyond the wrap edge; indices in [num_vertices, V) connect the repeated
    # last vertex to vertex 0 — all identical to the real wrap edge at index
    # num_vertices-1, so they must be masked to avoid double counting).
    edge_valid = (idx[None, :] < num_vertices[:, None])[None]  # (1, Z, V)

    cond = (y0 > py) != (y1 > py)
    denom = y1 - y0
    safe_denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    x_int = x0 + (py - y0) * (x1 - x0) / safe_denom
    crossing = cond & (px < x_int) & edge_valid
    crossings = jnp.sum(crossing, axis=-1)  # (N, Z)
    return (crossings % 2) == 1


@jax.jit
def classify_priority(membership: Array, priorities: Array) -> Array:
    """(N, Z) bool, (Z,) int32 -> (N,) int32 zone index or -1 (unclassified).

    Priority mode: the member zone with the smallest priority value wins
    (reference zone_classifier.py:136-146).
    """
    if membership.shape[-1] == 0:  # no zones configured
        return jnp.full(membership.shape[:-1], -1, jnp.int32)
    big = jnp.int32(2**30)
    eff = jnp.where(membership, priorities[None, :], big)
    best = jnp.argmin(eff, axis=-1)
    any_member = jnp.any(membership, axis=-1)
    return jnp.where(any_member, best, -1)


class ZoneClassifier:
    """Host-facing facade with the reference's API (classify / classify_batch).

    overlap_mode="all": a detection in k zones counts once in each
    (reference aggregator.py:64-70); "priority": single zone by priority.
    """

    def __init__(self, zones: list[dict], overlap_mode: str = "all"):
        self._validate(zones)
        self.packed = PackedZones.from_config(zones)
        self.overlap_mode = overlap_mode

    @staticmethod
    def _validate(zones: list[dict]) -> None:
        seen = set()
        for z in zones:
            zid = z.get("id")
            if zid is None:
                raise ValueError("zone missing id")
            if zid in seen:
                raise ValueError(f"duplicate zone id {zid}")
            seen.add(zid)
            if len(z.get("polygon", [])) < 3:
                raise ValueError(f"zone {zid}: polygon needs >= 3 vertices")

    @property
    def zone_ids(self) -> tuple[str, ...]:
        return self.packed.ids

    def membership(self, points: np.ndarray) -> np.ndarray:
        """(N, 2) -> (N, Z) bool membership matrix."""
        pts = jnp.asarray(np.atleast_2d(points), jnp.float32)
        if self.packed.vertices.shape[0] == 0:
            return np.zeros((pts.shape[0], 0), bool)
        out = points_in_zones(
            pts, jnp.asarray(self.packed.vertices), jnp.asarray(self.packed.num_vertices)
        )
        return np.asarray(out)

    def classify(self, point: tuple[float, float]) -> list[str]:
        m = self.membership(np.asarray([point], np.float32))[0]
        if self.overlap_mode == "all":
            return [self.packed.ids[z] for z in np.nonzero(m)[0]]
        idx = classify_priority(
            jnp.asarray(m[None]), jnp.asarray(self.packed.priorities)
        )[0]
        return [self.packed.ids[int(idx)]] if int(idx) >= 0 else []

    def classify_batch(self, points: np.ndarray) -> list[list[str]]:
        m = self.membership(points)
        if self.overlap_mode == "all":
            return [[self.packed.ids[z] for z in np.nonzero(row)[0]] for row in m]
        idxs = np.asarray(
            classify_priority(jnp.asarray(m), jnp.asarray(self.packed.priorities))
        )
        return [[self.packed.ids[int(i)]] if int(i) >= 0 else [] for i in idxs]

    def classify_with_unclassified(self, points: np.ndarray) -> list[list[str]]:
        """Like classify_batch but empty -> ["unclassified"] (reference :229-243)."""
        out = self.classify_batch(points)
        return [zs if zs else ["unclassified"] for zs in out]
