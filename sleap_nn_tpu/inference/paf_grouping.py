"""PAF line-integral scoring (device, XLA) + instance grouping (host).

Parity target: reference sleap_nn/inference/ops/paf.py:84-1456. TPU-first
redesign:

- Peaks are grouped into a **fixed-size per-node layout** ``(B, n_nodes,
  K, 2)`` with a validity mask — the static-shape recipe the reference's
  own ONNX export wrappers use (reference: export/wrappers/bottomup.py).
- Line-integral scoring evaluates ALL src x dst pairs per edge as one dense
  gather + dot-product ``(B, n_edges, K, K)`` under jit (replacing the
  reference's per-sample Python loop over ragged candidates,
  ops/paf.py:413-500).
- Hungarian matching (scipy) + greedy union into instances stay host-side,
  mirroring the reference's GPU->CPU boundary (streaming.py:43-147).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment


# ---------------------------------------------------------------------------
# Device side
# ---------------------------------------------------------------------------


def group_peaks_by_node(
    peaks: jnp.ndarray,
    peak_vals: jnp.ndarray,
    channel_inds: jnp.ndarray,
    valid: jnp.ndarray,
    n_nodes: int,
    k_per_node: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rearrange flat top-K peaks into per-node slots.

    Args:
        peaks: ``(B, K, 2)``; peak_vals ``(B, K)``; channel_inds ``(B, K)``
            int32 (-1 invalid); valid ``(B, K)`` bool.

    Returns:
        ``(grouped_peaks (B, N, k, 2), grouped_vals (B, N, k), mask (B, N, k))``
        — per node, peaks sorted by value descending (the top-K input order),
        NaN/0/False beyond each node's count.
    """
    b, k_in = peak_vals.shape
    node_ids = jnp.arange(n_nodes)[None, :, None]  # (1, N, 1)
    is_node = (channel_inds[:, None, :] == node_ids) & valid[:, None, :]  # (B, N, K)
    # Slot index of each peak within its node = cumulative count - 1.
    slot = jnp.cumsum(is_node, axis=-1) - 1  # (B, N, K)
    keep = is_node & (slot < k_per_node)

    grouped_peaks = jnp.full((b, n_nodes, k_per_node, 2), jnp.nan, dtype=peaks.dtype)
    grouped_vals = jnp.zeros((b, n_nodes, k_per_node), dtype=peak_vals.dtype)
    mask = jnp.zeros((b, n_nodes, k_per_node), dtype=bool)

    # Scatter each kept peak into its (node, slot); rejected peaks are routed
    # to an out-of-range slot which scatter-drop ignores.
    slot_target = jnp.where(keep, slot, k_per_node)  # k_per_node = dropped
    b_idx = jnp.broadcast_to(jnp.arange(b)[:, None, None], keep.shape)
    n_idx = jnp.broadcast_to(jnp.arange(n_nodes)[None, :, None], keep.shape)
    flat_peaks = jnp.broadcast_to(peaks[:, None, :, :], (b, n_nodes, k_in, 2))
    flat_vals = jnp.broadcast_to(peak_vals[:, None, :], (b, n_nodes, k_in))

    grouped_peaks = grouped_peaks.at[b_idx, n_idx, slot_target].set(flat_peaks, mode="drop")
    grouped_vals = grouped_vals.at[b_idx, n_idx, slot_target].set(flat_vals, mode="drop")
    mask = mask.at[b_idx, n_idx, slot_target].set(keep, mode="drop")
    return grouped_peaks, grouped_vals, mask


def score_paf_lines_dense(
    pafs: jnp.ndarray,
    grouped_peaks: jnp.ndarray,
    grouped_mask: jnp.ndarray,
    edge_inds: jnp.ndarray,
    n_line_points: int = 10,
    pafs_stride: int = 4,
    max_edge_length_ratio: float = 0.25,
    dist_penalty_weight: float = 1.0,
) -> jnp.ndarray:
    """Dense PAF line scores for every candidate pair of every edge.

    Args:
        pafs: ``(B, Hp, Wp, 2*n_edges)`` channel order [e0x, e0y, e1x, ...].
        grouped_peaks: ``(B, n_nodes, K, 2)`` image-scale (x, y).
        grouped_mask: ``(B, n_nodes, K)`` bool.
        edge_inds: ``(n_edges, 2)`` (src_node, dst_node).

    Returns:
        ``(B, n_edges, K, K)`` scores; ``-inf`` where either endpoint is
        invalid. Score = mean over line points of PAF·unit_displacement +
        distance penalty (reference: ops/paf.py:335-413).
    """
    b, hp, wp, _ = pafs.shape
    n_edges = edge_inds.shape[0]
    k = grouped_peaks.shape[2]
    max_edge_length = max_edge_length_ratio * max(hp, wp, 2 * n_edges) * pafs_stride

    src = grouped_peaks[:, edge_inds[:, 0]]  # (B, E, K, 2)
    dst = grouped_peaks[:, edge_inds[:, 1]]  # (B, E, K, 2)
    src_mask = grouped_mask[:, edge_inds[:, 0]]  # (B, E, K)
    dst_mask = grouped_mask[:, edge_inds[:, 1]]

    # Pair geometry: (B, E, K_src, K_dst, 2)
    disp = dst[:, :, None, :, :] - src[:, :, :, None, :]
    length = jnp.sqrt(jnp.sum(disp**2, axis=-1, keepdims=True))
    unit = disp / jnp.maximum(length, 1e-8)

    # Line points: (B, E, Ks, Kd, P, 2), nearest-neighbor subscripts at PAF res.
    t = jnp.linspace(0.0, 1.0, n_line_points)
    pts = src[:, :, :, None, None, :] + t[None, None, None, None, :, None] * disp[..., None, :]
    sub = jnp.round(pts / pafs_stride).astype(jnp.int32)
    xs = jnp.clip(sub[..., 0], 0, wp - 1)
    ys = jnp.clip(sub[..., 1], 0, hp - 1)

    from sleap_nn_tpu.ops.pallas_kernels import (
        paf_line_samples_pallas,
        use_pallas_paf,
    )

    if use_pallas_paf():
        # Pallas kernel target #2: MXU one-hot sampling with the edge's PAF
        # plane VMEM-resident (replaces the arbitrary-index gather below).
        on_tpu = jax.devices()[0].platform == "tpu"
        samples = paf_line_samples_pallas(
            pafs,
            xs.reshape(b, n_edges, -1),
            ys.reshape(b, n_edges, -1),
            interpret=not on_tpu,
        )  # (B, E, 2, Ks*Kd*P)
        paf_x = samples[:, :, 0].reshape(xs.shape)
        paf_y = samples[:, :, 1].reshape(xs.shape)
    else:
        # Gather PAF x/y channels per edge: channels 2e, 2e+1.
        e_idx = jnp.arange(n_edges)[None, :, None, None, None]
        b_idx = jnp.arange(b)[:, None, None, None, None]
        paf_x = pafs[b_idx, ys, xs, 2 * e_idx]
        paf_y = pafs[b_idx, ys, xs, 2 * e_idx + 1]

    dots = paf_x * unit[..., None, 0] + paf_y * unit[..., None, 1]  # (B,E,Ks,Kd,P)
    mean_scores = jnp.mean(dots, axis=-1)

    penalty = jnp.minimum(max_edge_length / jnp.maximum(length[..., 0], 1e-8) - 1, 0.0)
    scores = mean_scores + penalty * dist_penalty_weight

    pair_valid = src_mask[:, :, :, None] & dst_mask[:, :, None, :]
    # NaN peaks (even when masked True upstream) must not poison: also check finite.
    finite = jnp.isfinite(src[..., 0])[:, :, :, None] & jnp.isfinite(dst[..., 0])[:, :, None, :]
    return jnp.where(pair_valid & finite, scores, -jnp.inf)


# ---------------------------------------------------------------------------
# Host side
# ---------------------------------------------------------------------------


def toposort_edges(edge_inds: Sequence[Tuple[int, int]]) -> Tuple[int, ...]:
    """BFS order of edges from the topological root (reference: ops/paf.py:890)."""
    import networkx as nx

    dg = nx.DiGraph()
    dg.add_edges_from(edge_inds)
    try:
        root = next(nx.topological_sort(dg))
    except nx.NetworkXUnfeasible:
        return tuple(range(len(edge_inds)))
    order = list(nx.bfs_edges(dg, root))
    edge_list = [tuple(e) for e in edge_inds]
    out = [edge_list.index(e) for e in order if e in edge_list]
    for i in range(len(edge_list)):
        if i not in out:
            out.append(i)
    return tuple(out)


def match_candidates_dense(
    scores: np.ndarray, min_line_scores: float = 0.25
) -> List[Tuple[int, int, int, float]]:
    """Hungarian matching per edge on the dense score matrix of ONE sample.

    Args:
        scores: ``(n_edges, K, K)`` with -inf at invalid pairs.

    Returns:
        List of ``(edge_ind, src_slot, dst_slot, score)`` matches above
        ``min_line_scores``.
    """
    matches = []
    n_edges = scores.shape[0]
    for e in range(n_edges):
        s = scores[e]
        valid_src = np.where(np.isfinite(s).any(axis=1))[0]
        valid_dst = np.where(np.isfinite(s).any(axis=0))[0]
        if len(valid_src) == 0 or len(valid_dst) == 0:
            continue
        cost = -s[np.ix_(valid_src, valid_dst)]
        cost[~np.isfinite(cost)] = 1e9
        rows, cols = linear_sum_assignment(cost)
        for r, c in zip(rows, cols):
            score = float(-cost[r, c])
            if score <= -1e8:
                continue
            if score >= min_line_scores:
                matches.append((e, int(valid_src[r]), int(valid_dst[c]), score))
    return matches


def assign_connections_to_instances(
    connections: Dict[int, List[Tuple[int, int, float]]],
    edge_inds: Sequence[Tuple[int, int]],
    sorted_edge_inds: Sequence[int],
    min_instance_peaks=0,
    n_nodes: Optional[int] = None,
) -> Dict[Tuple[int, int], int]:
    """Greedy union of matched connections into instances.

    Keys are ``(node_ind, slot)`` peak IDs; values are instance ids.
    (reference: ops/paf.py:705-820, identical case analysis.)
    """
    assignments: Dict[Tuple[int, int], int] = {}
    for e in sorted_edge_inds:
        src_node, dst_node = edge_inds[e]
        for src_slot, dst_slot, _score in connections.get(e, []):
            src_id = (src_node, src_slot)
            dst_id = (dst_node, dst_slot)
            src_inst = assignments.get(src_id)
            dst_inst = assignments.get(dst_id)
            if src_inst is None and dst_inst is None:
                new_inst = max(assignments.values(), default=-1) + 1
                assignments[src_id] = new_inst
                assignments[dst_id] = new_inst
            elif src_inst is not None and dst_inst is None:
                assignments[dst_id] = src_inst
            elif src_inst is None and dst_inst is not None:
                assignments[src_id] = dst_inst
            else:
                assignments[dst_id] = src_inst
                src_nodes = {p[0] for p, i in assignments.items() if i == src_inst}
                dst_nodes = {p[0] for p, i in assignments.items() if i == dst_inst}
                if not src_nodes & dst_nodes:
                    for pid, inst in list(assignments.items()):
                        if inst == dst_inst:
                            assignments[pid] = src_inst

    if min_instance_peaks:
        if isinstance(min_instance_peaks, float):
            min_instance_peaks = int(min_instance_peaks * (n_nodes or 1))
        counts: Dict[int, int] = {}
        for inst in assignments.values():
            counts[inst] = counts.get(inst, 0) + 1
        assignments = {
            pid: inst for pid, inst in assignments.items() if counts[inst] >= min_instance_peaks
        }
    return assignments


def make_predicted_instances(
    grouped_peaks: np.ndarray,
    grouped_vals: np.ndarray,
    connections: Dict[int, List[Tuple[int, int, float]]],
    assignments: Dict[Tuple[int, int], int],
    edge_inds: Sequence[Tuple[int, int]],
    n_nodes: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Collect assigned peaks into instance arrays (reference: ops/paf.py:823)."""
    instance_ids = sorted(set(assignments.values()))
    id_map = {inst: i for i, inst in enumerate(instance_ids)}
    n_inst = len(instance_ids)

    pts = np.full((n_inst, n_nodes, 2), np.nan, dtype=np.float32)
    vals = np.full((n_inst, n_nodes), np.nan, dtype=np.float32)
    inst_scores = np.zeros((n_inst,), dtype=np.float32)

    for (node, slot), inst in assignments.items():
        i = id_map[inst]
        pts[i, node] = grouped_peaks[node, slot]
        vals[i, node] = grouped_vals[node, slot]

    for e, conns in connections.items():
        src_node, dst_node = edge_inds[e]
        for src_slot, dst_slot, score in conns:
            inst = assignments.get((src_node, src_slot))
            if inst is not None and inst == assignments.get((dst_node, dst_slot)):
                inst_scores[id_map[inst]] += score
    return pts, vals, inst_scores


@dataclasses.dataclass
class PAFScorer:
    """Facade bundling device scoring + host grouping (reference: ops/paf.py:1153)."""

    part_names: Sequence[str]
    edges: Sequence[Tuple[str, str]]
    pafs_stride: int = 4
    max_edge_length_ratio: float = 0.25
    dist_penalty_weight: float = 1.0
    n_points: int = 10
    min_instance_peaks: float = 0
    min_line_scores: float = 0.25
    k_per_node: int = 20

    def __post_init__(self):
        names = list(self.part_names)
        self.edge_inds = [(names.index(s), names.index(d)) for s, d in self.edges]
        self.n_nodes = len(names)
        self.n_edges = len(self.edge_inds)
        self.sorted_edge_inds = toposort_edges(self.edge_inds)

    @classmethod
    def from_config(cls, config, max_edge_length_ratio=0.25, dist_penalty_weight=1.0,
                    n_points=10, min_instance_peaks=0, min_line_scores=0.25, k_per_node=20):
        """Build from a PAF head config leaf (part_names inferred upstream)."""
        return cls(
            part_names=config["part_names"],
            edges=config["edges"],
            pafs_stride=config["output_stride"],
            max_edge_length_ratio=max_edge_length_ratio,
            dist_penalty_weight=dist_penalty_weight,
            n_points=n_points,
            min_instance_peaks=min_instance_peaks,
            min_line_scores=min_line_scores,
            k_per_node=k_per_node,
        )

    # -- device ---------------------------------------------------------------
    def score_on_device(self, pafs, peaks, peak_vals, channel_inds, valid):
        """Jittable: flat top-K peaks -> (grouped peaks/vals/mask, dense scores)."""
        grouped_peaks, grouped_vals, mask = group_peaks_by_node(
            peaks, peak_vals, channel_inds, valid, self.n_nodes, self.k_per_node
        )
        scores = score_paf_lines_dense(
            pafs,
            grouped_peaks,
            mask,
            jnp.asarray(self.edge_inds, dtype=jnp.int32),
            n_line_points=self.n_points,
            pafs_stride=self.pafs_stride,
            max_edge_length_ratio=self.max_edge_length_ratio,
            dist_penalty_weight=self.dist_penalty_weight,
        )
        return grouped_peaks, grouped_vals, mask, scores

    def _min_instance_peaks_int(self) -> int:
        # Same convention as assign_connections_to_instances (reference
        # ops/paf.py:705): a float is a FRACTION of the node count.
        mp = self.min_instance_peaks
        if isinstance(mp, float):
            return int(mp * self.n_nodes)
        return int(mp)

    # -- host -------------------------------------------------------------------
    def group_sample(self, grouped_peaks, grouped_vals, scores,
                     return_matches: bool = False):
        """Host: dense scores of one sample -> predicted instance arrays.

        Routed through the C++ grouping library (per-edge Hungarian + greedy
        union in one native call, sleap_nn_tpu/native/paf_group.cpp) when
        it is buildable; otherwise the scipy/numpy path below. Both produce
        the same instance partition (tests assert equality).

        With ``return_matches`` also returns the matched candidate edges as
        ``(edge, src_slot, dst_slot, line_score)`` tuples — the Hungarian
        result already computed internally, exposed so ``return_paf_graph``
        debug output never re-runs the matching.
        """
        from sleap_nn_tpu.native import paf_group_sample_native

        native = paf_group_sample_native(
            np.asarray(scores), self.edge_inds, self.sorted_edge_inds,
            self.n_nodes, self.min_line_scores, self._min_instance_peaks_int(),
        )
        if native is not None:
            assign, connections, n_inst = native
            assignments = {
                (int(nd), int(sl)): int(assign[nd, sl])
                for nd in range(self.n_nodes)
                for sl in range(assign.shape[1])
                if assign[nd, sl] >= 0
            }
            inst = make_predicted_instances(
                np.asarray(grouped_peaks),
                np.asarray(grouped_vals),
                connections,
                assignments,
                self.edge_inds,
                self.n_nodes,
            )
            if return_matches:
                matches = [(e, s, d, sc) for e, lst in connections.items()
                           for s, d, sc in lst]
                return inst + (matches,)
            return inst

        matches = match_candidates_dense(np.asarray(scores), self.min_line_scores)
        connections: Dict[int, List[Tuple[int, int, float]]] = {}
        for e, s, d, sc in matches:
            connections.setdefault(e, []).append((s, d, sc))
        assignments = assign_connections_to_instances(
            connections,
            self.edge_inds,
            self.sorted_edge_inds,
            min_instance_peaks=self.min_instance_peaks,
            n_nodes=self.n_nodes,
        )
        inst = make_predicted_instances(
            np.asarray(grouped_peaks),
            np.asarray(grouped_vals),
            connections,
            assignments,
            self.edge_inds,
            self.n_nodes,
        )
        if return_matches:
            return inst + (matches,)
        return inst

    def predict(self, pafs, peaks, peak_vals, channel_inds, valid):
        """Full pipeline for a batch: device scoring + per-sample host grouping."""
        grouped_peaks, grouped_vals, mask, scores = self.score_on_device(
            pafs, peaks, peak_vals, channel_inds, valid
        )
        gp, gv, sc = map(np.asarray, (grouped_peaks, grouped_vals, scores))
        return [self.group_sample(gp[i], gv[i], sc[i]) for i in range(gp.shape[0])]
