"""PAF grouping property tests: numpy oracle + synthetic-instance recovery.

Reference test strategy: sleap-nn exercises PAF scoring against hand-built
fields (tests/inference/test_paf_grouping.py); here we add (a) an exact
numpy oracle for the dense line-score kernel and (b) a fuzz over random
instance layouts asserting the full grouping pipeline reassembles them.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from sleap_nn_tpu.inference.paf_grouping import (
    PAFScorer,
    score_paf_lines_dense,
)


def numpy_score_oracle(pafs, peaks, mask, edge_inds, n_pts, stride,
                       max_edge_length_ratio, dist_penalty_weight):
    """Literal re-implementation of the dense line score in numpy."""
    b, hp, wp, _ = pafs.shape
    n_edges = len(edge_inds)
    k = peaks.shape[2]
    max_len = max_edge_length_ratio * max(hp, wp, 2 * n_edges) * stride
    out = np.full((b, n_edges, k, k), -np.inf)
    for bi in range(b):
        for e, (s_node, d_node) in enumerate(edge_inds):
            for i in range(k):
                for j in range(k):
                    if not (mask[bi, s_node, i] and mask[bi, d_node, j]):
                        continue
                    src = peaks[bi, s_node, i]
                    dst = peaks[bi, d_node, j]
                    if not (np.isfinite(src[0]) and np.isfinite(dst[0])):
                        continue
                    disp = dst - src
                    length = max(np.sqrt((disp**2).sum()), 1e-8)
                    unit = disp / length
                    dots = []
                    for t in np.linspace(0, 1, n_pts):
                        pt = src + t * disp
                        x = int(np.clip(np.round(pt[0] / stride), 0, wp - 1))
                        y = int(np.clip(np.round(pt[1] / stride), 0, hp - 1))
                        dots.append(
                            pafs[bi, y, x, 2 * e] * unit[0]
                            + pafs[bi, y, x, 2 * e + 1] * unit[1]
                        )
                    penalty = min(max_len / length - 1, 0.0)
                    out[bi, e, i, j] = np.mean(dots) + penalty * dist_penalty_weight
    return out


def test_dense_scores_match_numpy_oracle():
    rng = np.random.default_rng(0)
    b, hp, wp, n_edges, n_nodes, k = 2, 16, 16, 2, 3, 4
    stride = 4
    pafs = rng.normal(size=(b, hp, wp, 2 * n_edges)).astype(np.float32)
    peaks = rng.uniform(0, hp * stride, size=(b, n_nodes, k, 2)).astype(np.float32)
    mask = rng.uniform(size=(b, n_nodes, k)) > 0.3
    peaks[~mask] = np.nan
    edge_inds = [(0, 1), (1, 2)]

    got = np.asarray(
        score_paf_lines_dense(
            jnp.asarray(pafs), jnp.asarray(peaks), jnp.asarray(mask),
            jnp.asarray(edge_inds, dtype=jnp.int32),
            n_line_points=10, pafs_stride=stride,
        )
    )
    want = numpy_score_oracle(pafs, peaks, mask, edge_inds, 10, stride, 0.25, 1.0)
    finite = np.isfinite(want)
    assert np.array_equal(np.isfinite(got), finite)
    np.testing.assert_allclose(got[finite], want[finite], atol=1e-4)


def _paint_paf(pafs, e, src, dst, stride, width=2):
    """Paint a unit vector field along segment src->dst into edge e."""
    disp = dst - src
    length = np.sqrt((disp**2).sum())
    unit = disp / max(length, 1e-8)
    for t in np.linspace(0, 1, 40):
        pt = (src + t * disp) / stride
        x, y = int(round(pt[0])), int(round(pt[1]))
        for dy in range(-width, width + 1):
            for dx in range(-width, width + 1):
                yy, xx = y + dy, x + dx
                if 0 <= yy < pafs.shape[0] and 0 <= xx < pafs.shape[1]:
                    pafs[yy, xx, 2 * e] = unit[0]
                    pafs[yy, xx, 2 * e + 1] = unit[1]


@pytest.mark.parametrize("seed", range(5))
def test_grouping_recovers_synthetic_instances(seed):
    """Well-separated synthetic instances are reassembled exactly."""
    rng = np.random.default_rng(seed)
    stride = 4
    size = 256
    hp = wp = size // stride
    part_names = ["head", "thorax", "tail"]
    edges = [("head", "thorax"), ("thorax", "tail")]
    edge_inds = [(0, 1), (1, 2)]
    n_inst = int(rng.integers(1, 4))

    # Instances in separate horizontal bands, random layout within a band.
    gt = np.full((n_inst, 3, 2), np.nan, dtype=np.float32)
    band = size // n_inst
    for i in range(n_inst):
        base_y = i * band + band // 2
        x0 = rng.uniform(40, size - 90)
        gt[i, 0] = [x0, base_y + rng.uniform(-8, 8)]
        gt[i, 1] = [x0 + rng.uniform(25, 40), base_y + rng.uniform(-8, 8)]
        gt[i, 2] = [x0 + rng.uniform(50, 80), base_y + rng.uniform(-8, 8)]

    pafs = np.zeros((hp, wp, 4), dtype=np.float32)
    for i in range(n_inst):
        _paint_paf(pafs, 0, gt[i, 0], gt[i, 1], stride)
        _paint_paf(pafs, 1, gt[i, 1], gt[i, 2], stride)

    # Perfect flat peak arrays: one peak per (instance, node).
    k = n_inst * 3
    peaks = np.full((1, k, 2), np.nan, dtype=np.float32)
    vals = np.zeros((1, k), dtype=np.float32)
    chans = np.full((1, k), -1, dtype=np.int32)
    valid = np.zeros((1, k), dtype=bool)
    idx = 0
    for i in range(n_inst):
        for n in range(3):
            peaks[0, idx] = gt[i, n]
            vals[0, idx] = 1.0
            chans[0, idx] = n
            valid[0, idx] = True
            idx += 1

    scorer = PAFScorer(part_names=part_names, edges=edges, pafs_stride=stride,
                       min_line_scores=0.25)
    preds = scorer.predict(
        jnp.asarray(pafs[None]), jnp.asarray(peaks), jnp.asarray(vals),
        jnp.asarray(chans), jnp.asarray(valid),
    )[0]
    pred_pts = preds[0] if isinstance(preds, tuple) else preds["points"]
    pred_pts = np.asarray(pred_pts)
    assert pred_pts.shape[0] == n_inst, f"got {pred_pts.shape[0]} != {n_inst}"
    # Every GT instance matches one predicted instance node-for-node.
    for i in range(n_inst):
        dists = np.nanmax(
            np.abs(pred_pts - gt[i][None]), axis=(1, 2)
        )
        assert np.nanmin(dists) < 1.0