"""Video reading backends.

Three backends mirror the capabilities the reference gets from sleap-io's
``Video`` class (media files via ffmpeg/opencv, ``.pkg.slp``-embedded encoded
frames, and image sequences):

- :class:`MediaVideoBackend` — any container OpenCV can demux (mp4/avi/...),
  with thread-local capture handles (cv2.VideoCapture is not thread safe;
  the reference keeps per-thread video copies for the same reason,
  reference: sleap_nn/data/custom_datasets.py:225).
- :class:`HDF5VideoBackend` — frames embedded in an ``.slp``/HDF5 dataset,
  either encoded (png/jpg bytes) or raw arrays.
- :class:`ImageVideoBackend` — a list of image files as frames.

All backends return frames as ``uint8 (H, W, C)`` numpy arrays (C in {1, 3}).
"""

from __future__ import annotations

import json
import threading
from pathlib import Path
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np


def _imdecode(buf: np.ndarray, grayscale: bool) -> np.ndarray:
    import cv2

    flag = cv2.IMREAD_GRAYSCALE if grayscale else cv2.IMREAD_COLOR
    img = cv2.imdecode(buf, flag)
    if img is None:
        raise ValueError("Failed to decode embedded frame.")
    if img.ndim == 2:
        img = img[..., None]
    elif img.shape[-1] == 3:
        img = img[..., ::-1]  # BGR -> RGB
    return np.ascontiguousarray(img)


class MediaVideoBackend:
    """OpenCV-based media file reader with thread-local handles."""

    def __init__(self, filename: str, grayscale: Optional[bool] = None):
        self.filename = str(filename)
        self.grayscale = grayscale
        self._local = threading.local()
        self._meta: Optional[Tuple[int, int, int]] = None  # (n_frames, h, w)

    def _cap(self):
        import cv2

        cap = getattr(self._local, "cap", None)
        if cap is None:
            cap = cv2.VideoCapture(self.filename)
            if not cap.isOpened():
                raise FileNotFoundError(f"Could not open video: {self.filename}")
            self._local.cap = cap
            self._local.pos = 0
        return cap

    @property
    def num_frames(self) -> int:
        self._ensure_meta()
        return self._meta[0]

    def _ensure_meta(self):
        if self._meta is None:
            import cv2

            cap = self._cap()
            n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
            h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
            w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
            self._meta = (n, h, w)
            if self.grayscale is None:
                # Probe the first frame to detect grayscale-as-rgb content.
                frame = self.get_frame(0)
                if frame.shape[-1] == 3:
                    self.grayscale = bool(
                        np.all(frame[..., 0] == frame[..., 1])
                        and np.all(frame[..., 1] == frame[..., 2])
                    )
                else:
                    self.grayscale = True

    @property
    def shape(self) -> Tuple[int, int, int, int]:
        self._ensure_meta()
        n, h, w = self._meta
        c = 1 if self.grayscale else 3
        return (n, h, w, c)

    def get_frame(self, idx: int, fmt: Optional[str] = None) -> np.ndarray:
        """Decode one frame; ``fmt='gray'`` converts BGR->gray in ONE pass.

        The direct-to-gray path skips the BGR->RGB contiguous copy and the
        consumer's second RGB->gray conversion — on a single-core host the
        per-frame data passes, not the codec, bound provider throughput
        (BGR2GRAY on BGR equals RGB2GRAY on RGB: same ITU-601 weights).
        """
        import cv2

        cap = self._cap()
        pos = getattr(self._local, "pos", None)
        if pos != idx:
            cap.set(cv2.CAP_PROP_POS_FRAMES, idx)
        ok, img = cap.read()
        if not ok:
            raise IndexError(f"Failed to read frame {idx} from {self.filename}")
        self._local.pos = idx + 1
        if fmt == "gray" or self.grayscale:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)[..., None]
        else:
            img = np.ascontiguousarray(img[..., ::-1])  # BGR -> RGB
        return img


class HDF5VideoBackend:
    """Frames embedded in an HDF5 file (the ``.pkg.slp`` convention).

    The dataset holds either raw arrays or encoded image bytes; an adjacent
    ``frame_numbers`` dataset maps source-video frame indices to rows.
    """

    def __init__(
        self,
        filename: str,
        dataset: str,
        input_format: str = "channels_last",
        keep_open: bool = True,
    ):
        self.filename = str(filename)
        self.dataset = dataset
        self.input_format = input_format
        self._local = threading.local()
        self._frame_map = None  # frame_idx -> row
        self._attrs = None

    def _file(self):
        import h5py

        f = getattr(self._local, "f", None)
        if f is None:
            f = h5py.File(self.filename, "r")
            self._local.f = f
        return f

    def _load_meta(self):
        if self._attrs is not None:
            return
        f = self._file()
        ds = f[self.dataset]
        self._attrs = dict(ds.attrs)
        grp = self.dataset.rsplit("/", 1)[0] if "/" in self.dataset else ""
        fn_path = f"{grp}/frame_numbers" if grp else "frame_numbers"
        if fn_path in f:
            nums = f[fn_path][:]
            self._frame_map = {int(n): i for i, n in enumerate(nums)}
        else:
            self._frame_map = {i: i for i in range(ds.shape[0])}

    @property
    def num_frames(self) -> int:
        self._load_meta()
        return len(self._frame_map)

    @property
    def frame_numbers(self) -> List[int]:
        self._load_meta()
        return sorted(self._frame_map)

    @property
    def shape(self) -> Tuple[int, int, int, int]:
        self._load_meta()
        a = self._attrs
        if {"height", "width", "channels"} <= set(a):
            return (self.num_frames, int(a["height"]), int(a["width"]), int(a["channels"]))
        img = self.get_frame(self.frame_numbers[0])
        return (self.num_frames,) + img.shape

    def get_frame(self, idx: int, fmt: Optional[str] = None) -> np.ndarray:
        self._load_meta()
        f = self._file()
        ds = f[self.dataset]
        row = self._frame_map.get(int(idx))
        if row is None:
            raise IndexError(f"Frame {idx} is not embedded in {self.filename}:{self.dataset}")
        data = ds[row]
        enc = self._attrs.get("format", "")
        if isinstance(enc, bytes):
            enc = enc.decode()
        if ds.dtype == object or enc in ("png", "jpg", "jpeg"):
            buf = np.frombuffer(np.asarray(data).tobytes(), dtype=np.uint8)
            gray = fmt == "gray" or int(self._attrs.get("channels", 3)) == 1
            return _imdecode(buf, gray)
        img = np.asarray(data)
        if self.input_format == "channels_first" and img.ndim == 3:
            img = np.moveaxis(img, 0, -1)
        if img.ndim == 2:
            img = img[..., None]
        if fmt == "gray" and img.shape[-1] == 3:
            import cv2

            img = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)[..., None]
        return img


class ImageVideoBackend:
    """A sequence of image files treated as video frames."""

    def __init__(self, filenames: Sequence[str], grayscale: Optional[bool] = None):
        self.filenames = [str(f) for f in filenames]
        self.grayscale = grayscale

    @property
    def num_frames(self) -> int:
        return len(self.filenames)

    @property
    def shape(self) -> Tuple[int, int, int, int]:
        img = self.get_frame(0)
        return (self.num_frames,) + img.shape

    def get_frame(self, idx: int, fmt: Optional[str] = None) -> np.ndarray:
        import cv2

        gray = fmt == "gray" or self.grayscale
        flag = cv2.IMREAD_GRAYSCALE if gray else cv2.IMREAD_COLOR
        img = cv2.imread(self.filenames[idx], flag)
        if img is None:
            raise FileNotFoundError(self.filenames[idx])
        if img.ndim == 2:
            img = img[..., None]
        else:
            img = np.ascontiguousarray(img[..., ::-1])
        return img


BackendType = Union[MediaVideoBackend, HDF5VideoBackend, ImageVideoBackend]

_MEDIA_EXTS = {".mp4", ".avi", ".mov", ".mkv", ".webm", ".mjpeg", ".mjpg"}
_IMAGE_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff"}


class Video:
    """A video source: a filename plus a lazily-opened backend.

    Indexing with an int returns a ``uint8 (H, W, C)`` frame; a list/array of
    ints returns a stacked ``(N, H, W, C)`` array.
    """

    def __init__(
        self,
        filename: Union[str, Sequence[str]],
        backend: Optional[BackendType] = None,
        backend_metadata: Optional[dict] = None,
        source_video: Optional["Video"] = None,
    ):
        self.filename = filename
        self.backend = backend
        self.backend_metadata = backend_metadata or {}
        self.source_video = source_video

    # -- construction ------------------------------------------------------
    @classmethod
    def from_filename(cls, filename: Union[str, Sequence[str]], **kwargs) -> "Video":
        v = cls(filename=filename, backend_metadata=kwargs)
        v.open()
        return v

    def open(self):
        if self.backend is not None:
            return self
        md = self.backend_metadata
        fn = self.filename
        if isinstance(fn, (list, tuple)):
            self.backend = ImageVideoBackend(fn, grayscale=md.get("grayscale"))
            return self
        ext = Path(str(fn)).suffix.lower()
        dataset = md.get("dataset")
        if dataset:
            self.backend = HDF5VideoBackend(
                fn, dataset, input_format=md.get("input_format", "channels_last")
            )
        elif ext in (".h5", ".hdf5", ".slp"):
            self.backend = HDF5VideoBackend(fn, md.get("dataset", "video"))
        elif ext in _IMAGE_EXTS:
            self.backend = ImageVideoBackend([str(fn)], grayscale=md.get("grayscale"))
        else:
            self.backend = MediaVideoBackend(str(fn), grayscale=md.get("grayscale"))
        return self

    # -- access ------------------------------------------------------------
    @property
    def is_open(self) -> bool:
        return self.backend is not None

    def exists(self) -> bool:
        fn = self.filename
        if isinstance(fn, (list, tuple)):
            return all(Path(f).exists() for f in fn)
        return Path(str(fn)).exists()

    @property
    def shape(self) -> Optional[Tuple[int, int, int, int]]:
        try:
            self.open()
            return self.backend.shape
        except Exception:
            return None

    def __len__(self) -> int:
        self.open()
        return self.backend.num_frames

    def __getitem__(self, idx):
        self.open()
        if isinstance(idx, (list, tuple, np.ndarray)):
            return np.stack([self.backend.get_frame(int(i)) for i in idx])
        return self.backend.get_frame(int(idx))

    def get_frame(self, idx: int, fmt: Optional[str] = None) -> np.ndarray:
        """Read one frame; ``fmt='gray'`` asks the backend for single-pass
        grayscale decode (identical ITU-601 result, fewer data copies)."""
        if fmt is None:
            return self[idx]
        self.open()
        try:
            return self.backend.get_frame(int(idx), fmt=fmt)
        except TypeError:
            # Foreign backend without fmt support: convert after decode.
            img = self.backend.get_frame(int(idx))
            if fmt == "gray" and img.shape[-1] == 3:
                import cv2

                img = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)[..., None]
            return img

    def __repr__(self) -> str:
        return f"Video(filename={self.filename!r}, shape={self.shape})"

    # -- serialization helpers ---------------------------------------------
    def to_backend_json(self) -> dict:
        """Produce the sleap-io-compatible ``videos_json`` backend dict."""
        b = self.backend
        if isinstance(b, HDF5VideoBackend):
            return {
                "backend": {
                    "filename": "." if self.backend_metadata.get("embedded") else str(self.filename),
                    "dataset": b.dataset,
                    "input_format": b.input_format,
                    "convert_range": False,
                }
            }
        if isinstance(b, ImageVideoBackend):
            return {"backend": {"filename": b.filenames, "grayscale": b.grayscale}}
        grayscale = getattr(b, "grayscale", None) if b is not None else None
        return {
            "backend": {
                "filename": str(self.filename),
                "grayscale": grayscale,
                "bgr": True,
                "dataset": "",
                "input_format": "",
            }
        }

    @classmethod
    def from_backend_json(cls, spec: dict, slp_path: Optional[str] = None) -> "Video":
        bk = dict(spec.get("backend", {}))
        fn = bk.get("filename", "")
        dataset = bk.get("dataset") or ""
        if dataset:
            # Embedded in the .slp container itself when filename is "."
            container = slp_path if fn in (".", "") else fn
            v = cls(
                filename=container,
                backend=HDF5VideoBackend(
                    container, dataset, input_format=bk.get("input_format", "channels_last")
                ),
                backend_metadata={"embedded": fn in (".", ""), "dataset": dataset},
            )
            src = spec.get("source_video")
            if src:
                v.source_video = cls(
                    filename=src.get("backend", {}).get("filename", ""),
                    backend_metadata=src.get("backend", {}),
                )
            return v
        if isinstance(fn, list):
            fn = [cls._resolve_media_path(f, slp_path) for f in fn]
            return cls(filename=fn, backend=ImageVideoBackend(fn, bk.get("grayscale")))
        fn = cls._resolve_media_path(fn, slp_path)
        v = cls(filename=fn, backend_metadata={"grayscale": bk.get("grayscale")})
        if v.exists():
            v.open()
        return v

    @staticmethod
    def _resolve_media_path(fn: str, slp_path: Optional[str]) -> str:
        """Recover a stale media path using the .slp file's own directory.

        Labels files routinely move between machines with their videos
        beside them while the stored path still points at the ORIGINAL
        layout (the reference's sleap-io resolves this the same way). Try,
        in order: the path as stored; the path joined to the slp dir; each
        suffix of the stored path under the slp dir (progressively dropping
        leading directories, basename last). Returns the stored path
        untouched when nothing matches — downstream errors then show what
        the file claimed.
        """
        import os

        if not fn or not slp_path or os.path.exists(fn):
            return fn
        base = Path(slp_path).parent
        parts = Path(fn).parts
        candidates = [base / fn]
        candidates += [base / Path(*parts[i:]) for i in range(1, len(parts))]
        for cand in candidates:
            if cand.exists():
                return str(cand)
        return fn
