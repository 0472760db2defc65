"""Inference data providers: batched frames with background prefetch.

Parity target: reference sleap_nn/inference/providers.py:79-748
(``Batch``, ``VideoProvider``, ``LabelsProvider``). A decode thread keeps a
bounded queue of ready batches so host decode overlaps device compute.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional, Sequence

import numpy as np

from sleap_nn_tpu.io.model import Labels
from sleap_nn_tpu.io.video import Video


@dataclasses.dataclass
class Batch:
    """A stack of frames plus provenance indices."""

    frames: np.ndarray  # (B, H, W, C) uint8
    frame_inds: np.ndarray  # (B,)
    video_inds: np.ndarray  # (B,)
    valid: np.ndarray  # (B,) bool — False on padded rows
    gt_centroids: np.ndarray = None  # (B, K, 2) original coords, NaN pads
    gt_centroid_valid: np.ndarray = None  # (B, K) bool
    gt_centroid_vals: np.ndarray = None  # (B, K) source-instance scores (1.0 for user)

    def __len__(self):
        return len(self.frame_inds)


from sleap_nn_tpu.data.prefetch import PrefetchIterator as _PrefetchIterator  # noqa: E402


class VideoProvider:
    """Batched frames from a video file (reference: providers.py:133)."""

    def __init__(
        self,
        video,
        batch_size: int = 4,
        frames: Optional[Sequence[int]] = None,
        prefetch: int = 2,
        video_idx: int = 0,
        out_format: Optional[str] = None,
    ):
        if isinstance(video, (str,)):
            video = Video.from_filename(video)
        self.video = video
        self.batch_size = batch_size
        n = len(video)
        self.frames = list(frames) if frames is not None else list(range(n))
        self.prefetch = prefetch
        self.video_idx = video_idx
        # out_format='gray': decode straight to 1-channel (single conversion
        # pass in the codec thread) instead of decode->RGB copy->gray later.
        self.out_format = out_format

    def __len__(self):
        return (len(self.frames) + self.batch_size - 1) // self.batch_size

    @property
    def n_frames(self) -> int:
        return len(self.frames)

    def _gen(self) -> Iterator[Batch]:
        bs = self.batch_size
        for start in range(0, len(self.frames), bs):
            idxs = self.frames[start : start + bs]
            imgs = [self.video.get_frame(i, fmt=self.out_format) for i in idxs]
            valid = np.ones(bs, dtype=bool)
            if len(idxs) < bs:
                pad = bs - len(idxs)
                imgs = imgs + [imgs[-1]] * pad
                valid[len(idxs) :] = False
                idxs = idxs + [idxs[-1]] * pad
            yield Batch(
                frames=np.stack(imgs),
                frame_inds=np.asarray(idxs, dtype=np.int64),
                video_inds=np.full(bs, self.video_idx, dtype=np.int32),
                valid=valid,
            )

    def __iter__(self) -> Iterator[Batch]:
        return _PrefetchIterator(self._gen(), self.prefetch)


class LabelsProvider:
    """Batched frames from the labeled frames of a Labels file."""

    def __init__(self, labels: Labels, batch_size: int = 4, prefetch: int = 2,
                 user_frames_only: bool = False, with_centroids: bool = False,
                 max_instances: int = 20, anchor_ind=None):
        self.labels = labels
        self.batch_size = batch_size
        self.prefetch = prefetch
        self.with_centroids = with_centroids
        self.max_instances = max_instances
        self.anchor_ind = anchor_ind
        self.user_frames_only = user_frames_only
        lfs = labels.user_labeled_frames if user_frames_only else labels.labeled_frames
        self.lfs = lfs

    def _frame_centroids(self, lf):
        """GT centroids: anchor node if set/visible else NaN-mean of visible.

        Also reports per-slot confidences: a PredictedInstance's score when
        the centroids come from prior predictions, 1.0 for user instances,
        NaN for empty/padded slots (reference finding: GT-peaks inference
        carries centroid confidence as the instance score).
        """
        k = self.max_instances
        cents = np.full((k, 2), np.nan, np.float32)
        ok = np.zeros(k, bool)
        vals = np.full(k, np.nan, np.float32)
        # In user-frames-only (GT) mode, mixed frames expose only their USER
        # instances as ground truth — stale predictions on the same frame are
        # not GT (reference finding 43, tests/inference/test_issue_582.py:696).
        insts = lf.user_instances if self.user_frames_only else lf.instances
        for i, inst in enumerate(insts[:k]):
            pts = np.asarray(inst.numpy(), np.float64)
            c = None
            if self.anchor_ind is not None and 0 <= self.anchor_ind < len(pts):
                a = pts[self.anchor_ind]
                if np.isfinite(a).all():
                    c = a
            if c is None and np.isfinite(pts).any():
                c = np.nanmean(pts, axis=0)
            if c is not None and np.isfinite(c).all():
                cents[i] = c
                ok[i] = True
                score = getattr(inst, "score", None)
                vals[i] = float(score) if score is not None else 1.0
        return cents, ok, vals

    def __len__(self):
        return (len(self.lfs) + self.batch_size - 1) // self.batch_size

    @property
    def n_frames(self) -> int:
        return len(self.lfs)

    def _gen(self) -> Iterator[Batch]:
        bs = self.batch_size
        for start in range(0, len(self.lfs), bs):
            chunk = self.lfs[start : start + bs]
            imgs = [lf.image for lf in chunk]
            fidx = [lf.frame_idx for lf in chunk]
            vidx = [
                self.labels.videos.index(lf.video) if lf.video in self.labels.videos else 0
                for lf in chunk
            ]
            valid = np.ones(bs, dtype=bool)
            gt_c = gt_v = gt_s = None
            if self.with_centroids:
                triples = [self._frame_centroids(lf) for lf in chunk]
                gt_c = [t[0] for t in triples]
                gt_v = [t[1] for t in triples]
                gt_s = [t[2] for t in triples]
            if len(chunk) < bs:
                pad = bs - len(chunk)
                imgs += [imgs[-1]] * pad
                fidx += [fidx[-1]] * pad
                vidx += [vidx[-1]] * pad
                valid[len(chunk) :] = False
                if self.with_centroids:
                    empty = np.full_like(gt_c[-1], np.nan)
                    gt_c += [empty] * pad
                    gt_v += [np.zeros_like(gt_v[-1])] * pad
                    gt_s += [np.full_like(gt_s[-1], np.nan)] * pad
            yield Batch(
                frames=np.stack(imgs),
                frame_inds=np.asarray(fidx, dtype=np.int64),
                video_inds=np.asarray(vidx, dtype=np.int32),
                valid=valid,
                gt_centroids=np.stack(gt_c) if gt_c is not None else None,
                gt_centroid_valid=np.stack(gt_v) if gt_v is not None else None,
                gt_centroid_vals=np.stack(gt_s) if gt_s is not None else None,
            )

    def __iter__(self) -> Iterator[Batch]:
        return _PrefetchIterator(self._gen(), self.prefetch)
