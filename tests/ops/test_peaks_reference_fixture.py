"""Peak finding replayed on the REFERENCE'S OWN fixture with its own
hardcoded expectations (reference tests/inference/test_peak_finding.py) —
exact-parity evidence on real confmaps, not synthetic blobs.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from sleap_nn_tpu.ops import find_global_peaks, find_local_peaks

CMS_PT = "/root/reference/tests/assets/inference/minimal_cms.pt"


@pytest.fixture(scope="module")
def cms():
    """(1, 80, 80, 13) channel-last from the reference's (13, 80, 80) .pt."""
    t = torch.load(CMS_PT, weights_only=False).numpy()
    return jnp.asarray(np.moveaxis(t, 0, -1)[None])


GT_ROUGH = np.array([
    [27.0, 23.0], [40.0, 40.0], [49.0, 55.0], [54.0, 63.0], [56.0, 60.0],
    [18.0, 32.0], [29.0, 12.0], [17.0, 44.0], [44.0, 20.0], [36.0, 70.0],
    [0.0, 0.0], [25.0, 30.0], [34.0, 24.0],
])
GT_VALS = np.array([
    0.9163541793823242, 0.9957404136657715, 0.929328203201294,
    0.9020472168922424, 0.8870090246200562, 0.8547359108924866,
    0.8420282602310181, 0.86271071434021, 0.863940954208374,
    0.8226016163825989, 1.0, 0.9693551063537598, 0.8798434734344482,
])
GT_REFINED = np.array([
    [27.2498, 22.8141], [39.9390, 40.0320], [48.7837, 54.8141],
    [53.8752, 63.3142], [56.1249, 60.3423], [18.2802, 31.6910],
    [29.0320, 12.4346], [17.2178, 43.6591], [44.3712, 19.8446],
    [35.6288, 69.7198], [0.3252, 0.3252], [24.8141, 30.0000],
    [34.0625, 23.6288],
])


def test_find_global_peaks_rough_reference_exact(cms):
    pts, vals = find_global_peaks(cms, threshold=0.2)
    np.testing.assert_array_equal(np.asarray(pts)[0], GT_ROUGH)
    np.testing.assert_allclose(np.asarray(vals)[0], GT_VALS, atol=1e-6)


def test_find_global_peaks_integral_reference_exact(cms):
    pts, vals = find_global_peaks(cms, threshold=0.2, refinement="integral")
    np.testing.assert_allclose(np.asarray(pts)[0], GT_REFINED, atol=1e-3)
    np.testing.assert_allclose(np.asarray(vals)[0], GT_VALS, atol=1e-3)


def test_find_local_peaks_reference_set(cms):
    """The local-peak SET matches the reference's 13 expected maxima
    (our contract is fixed-size top-K sorted by value; the reference's is
    scan-order ragged — compare as sets keyed by channel)."""
    pts, vals, ch, valid = find_local_peaks(cms, threshold=0.2, max_peaks=20)
    pts, vals, ch, valid = (np.asarray(a)[0] for a in (pts, vals, ch, valid))
    assert int(valid.sum()) == 13
    got = {int(c): (tuple(p), float(v))
           for p, v, c, ok in zip(pts, vals, ch, valid) if ok}
    ref_channels = [10, 6, 8, 0, 12, 11, 5, 1, 7, 2, 4, 3, 9]
    ref_points = [
        (0.0, 0.0), (29.0, 12.0), (44.0, 20.0), (27.0, 23.0), (34.0, 24.0),
        (25.0, 30.0), (18.0, 32.0), (40.0, 40.0), (17.0, 44.0), (49.0, 55.0),
        (56.0, 60.0), (54.0, 63.0), (36.0, 70.0),
    ]
    ref_vals = [
        1.0, 0.8420282602310181, 0.863940954208374, 0.9163541793823242,
        0.8798434734344482, 0.9693551063537598, 0.8547359108924866,
        0.9957404136657715, 0.86271071434021, 0.929328203201294,
        0.8870090246200562, 0.9020472168922424, 0.8226016163825989,
    ]
    for c, p, v in zip(ref_channels, ref_points, ref_vals):
        gp, gv = got[c]
        assert gp == pytest.approx(p, abs=1e-6), c
        assert gv == pytest.approx(v, abs=1e-6), c


def test_crop_bboxes_reference_fixture(cms):
    """Crops gathered at the reference's bbox fixture line up with the
    confmap values at those locations."""
    from sleap_nn_tpu.ops import crop_bboxes, make_centered_bboxes

    bboxes = torch.load(
        "/root/reference/tests/assets/inference/minimal_bboxes.pt",
        weights_only=False,
    ).numpy()  # (13, 4, 2) corner points, clockwise from top-left
    # Centers from corner mean; regenerate centered boxes at our contract.
    centers = bboxes.mean(axis=1)  # (13, 2) x, y
    crop = 5
    cms_chan = jnp.moveaxis(cms[0], -1, 0)[:, :, :, None]  # (13, 80, 80, 1)
    bb = make_centered_bboxes(jnp.asarray(centers), crop, crop)
    crops = crop_bboxes(cms_chan, bb, jnp.arange(13), crop, crop)
    crops = np.asarray(crops)[..., 0]
    assert crops.shape == (13, crop, crop)
    # The crop center equals the confmap value at the center pixel.
    ref = np.moveaxis(np.asarray(cms[0]), -1, 0)
    for k in range(13):
        cx, cy = (int(round(v)) for v in centers[k])
        if 0 <= cx < 80 and 0 <= cy < 80:
            assert crops[k, crop // 2, crop // 2] == pytest.approx(
                ref[k, cy, cx], abs=1e-6
            )
