"""Shipped sample-config set (``docs/sample_configs/*.yaml``).

Parity target: the reference ships 16 ready-to-edit sample configs in
``docs/sample_configs/`` (reference docs/configuration/samples.md). This
module generates this repo's own set from the `get_config` kwargs builders,
so every shipped sample is valid by construction (one backbone, one head
wrapper, trainable defaults) — plus one TPU-specific extra: the measured
``throughput`` preset (output_stride=4, crop 128; see
config_generator/recommender.py:recommend_throughput_preset).

Regenerate with ``python -m sleap_nn_tpu.config.sample_configs``; a drift
test pins the committed files to this builder
(tests/config/test_sample_configs.py).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

# name -> get_config kwargs. Names mirror the reference's set
# (reference docs/sample_configs/) so users migrating find the same files.
SAMPLES: Dict[str, dict] = {
    "config_single_instance_unet_medium_rf": dict(
        head_configs="single_instance", backbone="unet_medium_rf"),
    "config_single_instance_unet_large_rf": dict(
        head_configs="single_instance", backbone="unet_large_rf"),
    "config_centroid_unet": dict(
        head_configs="centroid", backbone="unet"),
    "config_centroid_unet_standalone": dict(
        # Standalone detector (no crop stage): tighter sigma for precise
        # localization, as the config generator recommends.
        head_configs={"centroid": {"confmaps": {"sigma": 2.5}}},
        backbone="unet"),
    "config_centroid_swint": dict(
        head_configs="centroid", backbone="swint_tiny"),
    "config_topdown_centered_instance_unet_medium_rf": dict(
        head_configs="centered_instance", backbone="unet_medium_rf",
        crop_size=160),
    "config_topdown_centered_instance_unet_large_rf": dict(
        head_configs="centered_instance", backbone="unet_large_rf",
        crop_size=160),
    "config_topdown_multi_class_centered_instance_unet": dict(
        head_configs="multi_class_topdown", backbone="unet", crop_size=160),
    "config_bottomup_unet_medium_rf": dict(
        head_configs="bottomup", backbone="unet_medium_rf"),
    "config_bottomup_unet_large_rf": dict(
        head_configs="bottomup", backbone="unet_large_rf"),
    "config_bottomup_convnext": dict(
        head_configs="bottomup", backbone="convnext_tiny"),
    "config_multi_class_bottomup_unet": dict(
        head_configs="multi_class_bottomup", backbone="unet"),
    "config_bottomup_segmentation_unet": dict(
        head_configs="bottomup_segmentation", backbone="unet"),
    "config_bottomup_segmentation_pretrained": dict(
        head_configs="bottomup_segmentation", backbone="pretrained"),
    "config_topdown_centered_instance_segmentation_unet": dict(
        head_configs="centered_instance_segmentation", backbone="unet",
        crop_size=160),
    "config_semantic_segmentation_unet": dict(
        head_configs="semantic_segmentation", backbone="unet"),
    # TPU extra: the measured fast-inference preset (>2,000 frames/s/chip
    # for the medium_rf topdown pair on a v5e; BENCH_DETAIL.json
    # production.unet_medium_rf_fast384).
    "config_topdown_centered_instance_unet_medium_rf_throughput": dict(
        head_configs="centered_instance", backbone="unet_medium_rf",
        output_stride=4, crop_size=128),
}

SAMPLE_DIR = Path(__file__).resolve().parents[2] / "docs" / "sample_configs"


def build_sample(name: str):
    """Build one named sample as a TrainingJobConfig."""
    from sleap_nn_tpu.config.get_config import get_config
    from sleap_nn_tpu.config.training_job_config import verify_training_cfg

    return verify_training_cfg(get_config(**SAMPLES[name]))


def sample_yaml(name: str) -> str:
    """The YAML text of one named sample."""
    from sleap_nn_tpu.config import to_yaml

    return to_yaml(build_sample(name))


def write_all(out_dir: Path = SAMPLE_DIR) -> Dict[str, Path]:
    """Write every sample YAML; returns name -> path."""
    out_dir.mkdir(parents=True, exist_ok=True)
    written = {}
    for name in SAMPLES:
        path = out_dir / f"{name}.yaml"
        path.write_text(sample_yaml(name))
        written[name] = path
    return written


if __name__ == "__main__":
    for name, path in write_all().items():
        print(f"Wrote {path}")
