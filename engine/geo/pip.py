"""STR-tree over polygon bboxes + exact ray-casting point-in-polygon.

From-scratch replacements for shapely's ``STRtree`` / ``contains`` (not
installed in this sandbox; the north rule requires from-scratch anyway,
BASELINE.json:14). Reproduces the reference's "which admin area is this
object in?" assignment (SURVEY.md §2.4 J1) as a batch kernel:

- ``STRTree``: classic Sort-Tile-Recursive bulk load (Leutenegger et al.
  1997, public) stored as flat numpy arrays; ``query_points`` returns
  candidate (point, box) pairs via two vectorized containment masks
  (points x leaf-node bboxes, then points x member bboxes) — no Python
  per-point loop.
- ``points_in_polygon``: even-odd ray casting, vectorized over all
  edges of one ring at a time; boundary points are treated as inside
  (ties then broken deterministically downstream, SURVEY.md J1).
- ``PolygonSet``: the broadcastable polygon-side state for the PIP
  actor pool — flattened ring arrays + STR tree + optional holes.
"""

from __future__ import annotations

import numpy as np

LEAF_CAP = 16


class STRTree:
    """Single-level STR leaf grid over boxes — flat numpy layout.

    Boxes are sorted by x-center into vertical slices, each slice sorted
    by y-center, then packed into leaves of ``LEAF_CAP``. For batch
    point queries this one-level tree is optimal: candidate generation
    is two dense boolean matrix tests (points x n_leaves, then points x
    members-of-hit-leaves), both vectorized. n_leaves ~= n_boxes/16, so
    even 100k admin polygons give ~6k leaves — a (4096 x 6k) bool mask
    per batch, well within a worker's budget.
    """

    def __init__(self, boxes: np.ndarray):
        """boxes: (n, 4) float64 [minx, miny, maxx, maxy]."""
        boxes = np.asarray(boxes, dtype=np.float64)
        n = len(boxes)
        self.boxes = boxes
        n_leaves = max(1, int(np.ceil(n / LEAF_CAP)))
        n_slices = max(1, int(np.ceil(np.sqrt(n_leaves))))
        per_slice = int(np.ceil(n / n_slices))
        cx = (boxes[:, 0] + boxes[:, 2]) / 2
        cy = (boxes[:, 1] + boxes[:, 3]) / 2
        order_x = np.argsort(cx, kind="stable")
        order = np.empty(n, dtype=np.int64)
        for s in range(n_slices):
            sl = order_x[s * per_slice : (s + 1) * per_slice]
            order[s * per_slice : s * per_slice + len(sl)] = sl[
                np.argsort(cy[sl], kind="stable")
            ]
        self.order = order  # leaf-major permutation of box indices
        starts = np.arange(0, n, LEAF_CAP)
        self.leaf_start = starts
        self.leaf_end = np.minimum(starts + LEAF_CAP, n)
        lb = np.empty((len(starts), 4))
        for k, (a, b) in enumerate(zip(self.leaf_start, self.leaf_end)):
            m = boxes[order[a:b]]
            lb[k] = [m[:, 0].min(), m[:, 1].min(), m[:, 2].max(), m[:, 3].max()]
        self.leaf_boxes = lb

    def query_points(self, x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(point_idx, box_idx) pairs where point lies in box's bbox."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        lb = self.leaf_boxes
        hit = (
            (x[:, None] >= lb[None, :, 0])
            & (x[:, None] <= lb[None, :, 2])
            & (y[:, None] >= lb[None, :, 1])
            & (y[:, None] <= lb[None, :, 3])
        )
        p_idx, l_idx = np.nonzero(hit)
        if len(p_idx) == 0:
            return p_idx, l_idx
        # Expand leaf hits to member boxes (leaves are fixed-capacity).
        counts = self.leaf_end[l_idx] - self.leaf_start[l_idx]
        p_rep = np.repeat(p_idx, counts)
        member_pos = np.repeat(self.leaf_start[l_idx], counts) + (
            np.arange(counts.sum()) - np.repeat(np.cumsum(counts) - counts, counts)
        )
        b_idx = self.order[member_pos]
        bx = self.boxes[b_idx]
        keep = (
            (x[p_rep] >= bx[:, 0])
            & (x[p_rep] <= bx[:, 2])
            & (y[p_rep] >= bx[:, 1])
            & (y[p_rep] <= bx[:, 3])
        )
        return p_rep[keep], b_idx[keep]


def points_in_ring(
    px: np.ndarray, py: np.ndarray, ring_x: np.ndarray, ring_y: np.ndarray
) -> np.ndarray:
    """Even-odd ray cast of points against ONE ring; boundary counts as in.

    Vectorized (n_points x n_edges). For batch joins prefer
    ``PolygonSet.assign`` which only tests bbox-candidate pairs.
    """
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    x1 = np.asarray(ring_x, dtype=np.float64)[None, :]
    y1 = np.asarray(ring_y, dtype=np.float64)[None, :]
    x2 = np.roll(ring_x, -1)[None, :]
    y2 = np.roll(ring_y, -1)[None, :]
    # Edge crossing test for a ray going in +x direction.
    cond = (y1 > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        x_int = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
    crossings = (cond & (px < x_int)).sum(axis=1)
    inside = (crossings % 2).astype(bool)
    # Boundary: point on an edge segment -> inside (deterministic ties).
    dx, dy = x2 - x1, y2 - y1
    cross = (px - x1) * dy - (py - y1) * dx
    t = ((px - x1) * dx + (py - y1) * dy) / np.maximum(dx * dx + dy * dy, 1e-300)
    on_edge = ((np.abs(cross) < 1e-12) & (t >= 0.0) & (t <= 1.0)).any(axis=1)
    return inside | on_edge


class PolygonSet:
    """Immutable polygon-side state for the PIP join (broadcast once).

    Built on the driver from the ``polygons`` table (SURVEY.md §1.2) and
    shipped to every PIP actor via one ``ray.put``; actors rebuild
    nothing — all arrays arrive ready to use.
    """

    def __init__(
        self,
        admin_ids: np.ndarray,
        levels: np.ndarray,
        rings_x: list[np.ndarray],
        rings_y: list[np.ndarray],
        holes: list[list[tuple[np.ndarray, np.ndarray]]] | None = None,
    ):
        self.admin_ids = np.asarray(admin_ids)
        self.levels = np.asarray(levels, dtype=np.int32)
        # Flatten rings into one coordinate pool + offsets (cache friendly,
        # cheap to serialize through the object store).
        lens = np.array([len(r) for r in rings_x], dtype=np.int64)
        self.ring_off = np.concatenate([[0], np.cumsum(lens)])
        self.ring_x = (
            np.concatenate(rings_x) if len(rings_x) else np.empty(0, dtype=np.float64)
        ).astype(np.float64)
        self.ring_y = (
            np.concatenate(rings_y) if len(rings_y) else np.empty(0, dtype=np.float64)
        ).astype(np.float64)
        self.holes = holes or [[] for _ in rings_x]
        boxes = np.stack(
            [
                np.array([rx.min(), ry.min(), rx.max(), ry.max()])
                for rx, ry in zip(rings_x, rings_y)
            ]
        ) if len(rings_x) else np.empty((0, 4))
        self.boxes = boxes
        self.tree = STRTree(boxes)

    def __len__(self) -> int:
        return len(self.admin_ids)

    def ring(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        a, b = self.ring_off[i], self.ring_off[i + 1]
        return self.ring_x[a:b], self.ring_y[a:b]

    def contains_pairs(
        self, px: np.ndarray, py: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """All (point_idx, polygon_idx) containment pairs for a batch.

        bbox candidates from the STR tree, then exact ray-cast tests run
        per candidate polygon (vectorized over that polygon's candidate
        points and edges). Holes subtract membership.
        """
        p_idx, g_idx = self.tree.query_points(px, py)
        if len(p_idx) == 0:
            return p_idx, g_idx
        order = np.argsort(g_idx, kind="stable")
        p_s, g_s = p_idx[order], g_idx[order]
        keep = np.zeros(len(p_s), dtype=bool)
        bounds = np.concatenate(
            [[0], np.flatnonzero(np.diff(g_s)) + 1, [len(g_s)]]
        )
        for a, b in zip(bounds[:-1], bounds[1:]):
            gi = int(g_s[a])
            rx, ry = self.ring(gi)
            inside = points_in_ring(px[p_s[a:b]], py[p_s[a:b]], rx, ry)
            for hx, hy in self.holes[gi]:
                inside &= ~points_in_ring(px[p_s[a:b]], py[p_s[a:b]], hx, hy)
            keep[a:b] = inside
        return p_s[keep], g_s[keep]
