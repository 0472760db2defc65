"""SLEAP Analysis HDF5 export tests (layout locked by reference compat tests)."""

import h5py
import numpy as np

from sleap_nn_tpu.io import LabeledFrame, Labels, PredictedInstance, Skeleton, Track
from sleap_nn_tpu.io.analysis import save_analysis_h5_files
from sleap_nn_tpu.inference.run import save_predictions


class FakeVideo:
    def __init__(self, n, name):
        self.shape = (n, 64, 64, 1)
        self.filename = name

    def __len__(self):
        return self.shape[0]

    def to_backend_json(self):
        return {"backend": {"filename": self.filename}}


def make_labels(with_track=True, n_frames=166):
    skel = Skeleton(nodes=["a", "b"], edges=[("a", "b")])
    video = FakeVideo(n_frames, "vid.mp4")
    track = Track(name="animal") if with_track else None
    inst = PredictedInstance.from_numpy(
        points=np.array([[1.0, 2.0], [3.0, 4.0]]), skeleton=skel,
        point_scores=np.array([0.9, 0.8]), score=0.7)
    inst.track = track
    lf = LabeledFrame(video=video, frame_idx=0, instances=[inst])
    tracks = [track] if with_track else []
    return Labels(labeled_frames=[lf], videos=[video], skeletons=[skel], tracks=tracks)


def test_analysis_h5_spans_full_video(tmp_path):
    labels = make_labels(with_track=True)
    out = tmp_path / "span.predictions.slp"
    written = save_analysis_h5_files(labels, out)
    assert len(written) == 1
    assert written[0].name == "span.analysis.h5"
    with h5py.File(written[0], "r") as f:
        # tracks: (n_tracks, n_nodes, 2, n_frames) — frame axis last, full span.
        assert f["tracks"].shape == (1, 2, 2, 166)
        occ = f["track_occupancy"][:]
        assert occ.shape == (166, 1)
        assert int(occ[0].sum()) == 1 and int(occ[1:].sum()) == 0
        t = f["tracks"][:]
        np.testing.assert_allclose(t[0, :, :, 0], [[1, 2], [3, 4]])
        assert np.isnan(t[0, :, :, 1]).all()
        np.testing.assert_allclose(f["point_scores"][0, :, 0], [0.9, 0.8])
        assert f["instance_scores"][0, 0] == 0.7
        assert [n.decode() for n in f["node_names"][:]] == ["a", "b"]
        assert [n.decode() for n in f["track_names"][:]] == ["animal"]
        assert f["edge_inds"][:].tolist() == [[0, 1]]
        assert f["video_path"][()].decode() == "vid.mp4"


def test_analysis_h5_untracked_rank_pseudotracks(tmp_path):
    labels = make_labels(with_track=False)
    written = save_analysis_h5_files(labels, tmp_path / "u.slp")
    with h5py.File(written[0], "r") as f:
        assert [n.decode() for n in f["track_names"][:]] == ["track_0"]
        assert f["tracks"].shape[0] == 1


def test_save_predictions_formats(tmp_path):
    import pytest

    labels = make_labels()
    out = tmp_path / "p.predictions.slp"
    h5s = save_predictions(labels, out, output_format=["slp", "analysis_h5"])
    assert out.exists() and len(h5s) == 1 and h5s[0].exists()
    # analysis_h5 only: no slp written.
    out2 = tmp_path / "q.predictions.slp"
    h5s2 = save_predictions(labels, out2, output_format="analysis_h5")
    assert not out2.exists() and len(h5s2) == 1
    with pytest.raises(ValueError, match="output_format"):
        save_predictions(labels, out, output_format="csv")


def test_suggestions_roundtrip(tmp_path):
    from sleap_nn_tpu.io import load_slp, save_slp
    from sleap_nn_tpu.io.model import SuggestionFrame

    labels = make_labels()
    labels.suggestions = [
        SuggestionFrame(video=labels.videos[0], frame_idx=5, group=0),
        SuggestionFrame(video=labels.videos[0], frame_idx=9, group=1),
    ]
    path = tmp_path / "sugg.slp"
    save_slp(str(path), labels)
    back = load_slp(str(path))
    assert [(s.frame_idx, s.group) for s in back.suggestions] == [(5, 0), (9, 1)]
    assert back.suggestions[0].video is back.videos[0]
