"""Segmentation instance-grouping edge matrix.

Parity target: reference tests/test_segmentation.py group_instances
scenarios (two blobs / no foreground / no centers) plus vote/gate edge
cases, against group_instances_from_offsets
(sleap_nn_tpu/inference/segmentation.py:46).
"""

from __future__ import annotations

import numpy as np
import pytest

from sleap_nn_tpu.inference.segmentation import group_instances_from_offsets


def _inputs(h=16, w=16, k=2, stride=1):
    fg = np.zeros((1, h, w, 1), np.float32)
    off = np.zeros((1, h, w, 2), np.float32)
    centers = np.full((1, k, 2), np.nan, np.float32)
    valid = np.zeros((1, k), bool)
    return fg, off, centers, valid


def test_two_blobs_two_instances():
    fg, off, centers, valid = _inputs()
    fg[0, 2:5, 2:5, 0] = 1.0
    fg[0, 10:13, 10:13, 0] = 1.0
    centers[0, 0] = (3.5, 3.5)
    centers[0, 1] = (11.5, 11.5)
    valid[0] = [True, True]
    inst = np.asarray(group_instances_from_offsets(
        fg, off, centers, valid, output_stride=1))
    assert inst.shape == (1, 2, 16, 16)
    assert inst[0, 0, 3, 3] and not inst[0, 0, 11, 11]
    assert inst[0, 1, 11, 11] and not inst[0, 1, 3, 3]
    assert inst[0, 0].sum() == 9 and inst[0, 1].sum() == 9


def test_no_foreground_all_empty():
    fg, off, centers, valid = _inputs()
    centers[0, 0] = (3.5, 3.5)
    valid[0, 0] = True
    inst = np.asarray(group_instances_from_offsets(
        fg, off, centers, valid, output_stride=1))
    assert inst.sum() == 0


def test_no_valid_centers_all_empty():
    fg, off, centers, valid = _inputs()
    fg[0, 2:5, 2:5, 0] = 1.0
    inst = np.asarray(group_instances_from_offsets(
        fg, off, centers, valid, output_stride=1))
    assert inst.sum() == 0


def test_pixels_beyond_max_center_dist_excluded():
    fg, off, centers, valid = _inputs()
    fg[0, 2, 2, 0] = 1.0       # near the center
    fg[0, 14, 14, 0] = 1.0     # far away
    centers[0, 0] = (2.5, 2.5)
    valid[0, 0] = True
    inst = np.asarray(group_instances_from_offsets(
        fg, off, centers, valid, output_stride=1, max_center_dist=5.0))
    assert inst[0, 0, 2, 2]
    assert not inst[0, 0, 14, 14]


def test_offset_votes_steer_assignment():
    fg, off, centers, valid = _inputs()
    fg[0, 8, 8, 0] = 1.0
    centers[0, 0] = (2.5, 8.5)   # geometrically closer in x
    centers[0, 1] = (14.5, 8.5)
    valid[0] = [True, True]
    # Vote pushes the pixel toward center 1 despite center 0 being nearer.
    off[0, 8, 8] = (6.0, 0.0)
    inst = np.asarray(group_instances_from_offsets(
        fg, off, centers, valid, output_stride=1))
    assert inst[0, 1, 8, 8]
    assert not inst[0, 0, 8, 8]


def test_fg_threshold_gates_soft_probabilities():
    fg, off, centers, valid = _inputs()
    fg[0, 3, 3, 0] = 0.4   # below default 0.5
    fg[0, 4, 4, 0] = 0.9
    centers[0, 0] = (3.5, 3.5)
    valid[0, 0] = True
    inst = np.asarray(group_instances_from_offsets(
        fg, off, centers, valid, output_stride=1))
    assert not inst[0, 0, 3, 3]
    assert inst[0, 0, 4, 4]


def test_output_stride_lifts_grid_to_pixel_coords():
    # Grid cell (y=3, x=3) at stride 4 sits at pixel (14, 14).
    fg, off, centers, valid = _inputs(h=8, w=8)
    fg[0, 3, 3, 0] = 1.0
    centers[0, 0] = (14.0, 14.0)
    valid[0, 0] = True
    inst = np.asarray(group_instances_from_offsets(
        fg, off, centers, valid, output_stride=4, max_center_dist=2.0))
    assert inst[0, 0, 3, 3]


def test_distance_gate_alpha_drops_distant_satellite():
    fg, off, centers, valid = _inputs()
    fg[0, 2:6, 2:6, 0] = 1.0   # compact 4x4 blob (area 16, r_eq ~2.26)
    fg[0, 2, 14, 0] = 1.0      # satellite 10+ px away, same nearest center
    centers[0, 0] = (3.5, 3.5)
    valid[0, 0] = True
    plain = np.asarray(group_instances_from_offsets(
        fg, off, centers, valid, output_stride=1, max_center_dist=64.0))
    gated = np.asarray(group_instances_from_offsets(
        fg, off, centers, valid, output_stride=1, max_center_dist=64.0,
        distance_gate_alpha=2.0))
    assert plain[0, 0, 2, 14]
    assert not gated[0, 0, 2, 14]
    assert gated[0, 0, 3, 3]


def test_ties_resolve_to_first_center_deterministically():
    fg, off, centers, valid = _inputs()
    fg[0, 8, 8, 0] = 1.0
    centers[0, 0] = (4.5, 8.5)
    centers[0, 1] = (12.5, 8.5)  # equidistant from (8.5, 8.5)
    valid[0] = [True, True]
    inst = np.asarray(group_instances_from_offsets(
        fg, off, centers, valid, output_stride=1))
    assert inst[0, 0, 8, 8] and not inst[0, 1, 8, 8]
