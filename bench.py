"""Benchmark: inference throughput for all four model families + forward latency.

Reproduces the reference's headline benchmark setup
(reference: docs/guides/inference-performance.md:72-77 — the repo's fixture
checkpoints on the 320x560 ``small_robot.mp4``, 100 frames, streaming predict
including decode + preprocess + forward + postprocess). The models are the
reference's OWN ``best.ckpt`` fixtures, loaded through the torch-checkpoint
importer — so this times identical architectures to the A40 baseline rows:

    single_instance 228 fps | centroid 231 fps | topdown 95 fps | bottomup 137 fps

Also reports a compute-only number per family — device-resident input ->
jitted forward+postprocess latency (ms/batch, B=4) — to separate TPU compute
capability from the host->device tunnel bandwidth that bounds e2e here
(compare reference docs/guides/inference-performance.md:40-48 eager forward
ms/batch on A40: single 1.20, centroid 2.48, bottomup 3.59).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
The headline metric stays the topdown e2e row; per-family numbers live under
"extra".
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

N_FRAMES = int(os.environ.get("BENCH_FRAMES", 100))
BATCH_SIZE = int(os.environ.get("BENCH_BATCH", 32))
N_REPEATS = int(os.environ.get("BENCH_REPEATS", 3))
VIDEO = "/root/reference/tests/assets/datasets/small_robot.mp4"
CKPTS = Path("/root/reference/tests/assets/model_ckpts")

# (row name, model dirs, A40 e2e fps baseline, predictor kwargs)
ROWS = [
    (
        "single_instance",
        ["minimal_instance_single_instance"],
        228.0,
        {"peak_threshold": 0.3},
    ),
    (
        "centroid",
        ["minimal_instance_centroid"],
        231.0,
        {"peak_threshold": 0.2, "max_instances": 6},
    ),
    (
        "topdown",
        ["minimal_instance_centroid", "minimal_instance_centered_instance"],
        95.0,
        {"peak_threshold": 0.2, "max_instances": 6},
    ),
    (
        "bottomup",
        ["minimal_instance_bottomup"],
        137.0,
        {"peak_threshold": 0.2},
    ),
]

# Reference eager forward ms/batch at B=4 on A40 (same doc, :40-48). The
# topdown row has no published forward number (two models); compare the
# fused two-stage program against centroid+centered as a lower bound.
FWD_BASELINE_MS = {"single_instance": 1.20, "centroid": 2.48, "bottomup": 3.59}


def bench_e2e(predictor, frames):
    from sleap_nn_tpu.inference.providers import VideoProvider

    warm = VideoProvider(VIDEO, batch_size=BATCH_SIZE, frames=frames[: 2 * BATCH_SIZE])
    predictor.predict(None, make_labels=False, provider=warm)
    fps = 0.0
    for _ in range(N_REPEATS):
        provider = VideoProvider(VIDEO, batch_size=BATCH_SIZE, frames=frames)
        t0 = time.perf_counter()
        predictor.predict(None, make_labels=False, provider=provider)
        fps = max(fps, N_FRAMES / (time.perf_counter() - t0))
    return fps


def bench_forward(predictor, sample_batch):
    """Device-resident input -> layer device program latency (ms/batch, B=4)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    layer = predictor.layer
    fn = getattr(layer, "_full", None) or layer._fn
    x = jnp.asarray(sample_batch[:4])
    jax.block_until_ready(x)
    out = fn(x)  # compile
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    times = []
    for _ in range(max(N_REPEATS, 3)):
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x)
        jax.block_until_ready(jax.tree_util.tree_leaves(out))
        times.append((time.perf_counter() - t0) / iters)
    return float(np.min(times) * 1000.0)


def main():
    from sleap_nn_tpu.inference.predictor import Predictor
    from sleap_nn_tpu.io.video import Video

    frames = list(range(N_FRAMES))
    video = Video(VIDEO)
    sample = video[0][None]  # (1, H, W, 3)
    import numpy as np

    sample4 = np.repeat(sample, 4, axis=0)
    gray4 = (
        sample4[..., 0] * 0.2989 + sample4[..., 1] * 0.587 + sample4[..., 2] * 0.114
    ).astype(np.uint8)[..., None]

    extra = {}
    headline_fps, headline_vs = 0.0, 0.0
    for name, dirs, base_fps, kwargs in ROWS:
        predictor = Predictor.from_model_paths(
            [str(CKPTS / d) for d in dirs],
            batch_size=BATCH_SIZE,
            host_resize=True,  # downscale on host: tunnel payload is the binder
            **kwargs,
        )
        fps = bench_e2e(predictor, frames)
        # Feed the forward bench exactly what the device sees in predict():
        # host grayscale + host resize applied (the A40 forward table also
        # ran at preprocessed input sizes).
        layer_in = gray4 if predictor._host_grayscale else sample4
        if predictor._host_transform is not None:
            layer_in, _ = predictor._apply_host_resize(layer_in)
        fwd_ms = bench_forward(predictor, layer_in)
        row = {"e2e_fps": round(fps, 2), "e2e_vs_a40": round(fps / base_fps, 3),
               "forward_ms_b4": round(fwd_ms, 3)}
        if name in FWD_BASELINE_MS:
            row["forward_vs_a40_eager"] = round(FWD_BASELINE_MS[name] / fwd_ms, 3)
        extra[name] = row
        if name == "topdown":
            headline_fps, headline_vs = fps, fps / base_fps

    import jax

    device = jax.devices()[0].platform
    print(
        json.dumps(
            {
                "metric": f"topdown_inference_fps_{device}",
                "value": round(headline_fps, 2),
                "unit": (
                    f"frames/sec (320x560 small_robot, batch={BATCH_SIZE}, e2e "
                    f"incl. decode; best of {N_REPEATS}; reference fixture "
                    f"ckpts via torch importer)"
                ),
                "vs_baseline": round(headline_vs, 3),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
