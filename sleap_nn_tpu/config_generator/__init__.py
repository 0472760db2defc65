"""Auto-configuration: dataset analysis -> pipeline/model recommendations.

Parity target: reference sleap_nn/config_generator/ (analyzer.py:431,
recommender.py:89, memory.py:101, architecture_estimates.py:23,
generator.py). The interactive TUI (reference: config_generator/tui/,
10k LoC textual app) is intentionally not ported this round — the analysis,
recommendation, memory-model and generation logic it fronts is all here and
scriptable via :func:`generate_config`.
"""

from sleap_nn_tpu.config_generator.analyzer import DatasetStats, analyze_slp
from sleap_nn_tpu.config_generator.architecture_estimates import (
    compute_backbone_context_margin,
    compute_max_stride_for_animal_size,
    compute_receptive_field,
    compute_suggested_crop_size,
    compute_suggested_tile_overlap,
    compute_suggested_tile_size,
    estimate_unet_params,
    recommend_default_max_stride,
)
from sleap_nn_tpu.config_generator.memory import MemoryEstimate, estimate_memory
from sleap_nn_tpu.config_generator.recommender import (
    ConfigRecommendation,
    PipelineRecommendation,
    recommend_config,
    recommend_pipeline,
)
from sleap_nn_tpu.config_generator.generator import generate_config

__all__ = [
    "DatasetStats",
    "analyze_slp",
    "recommend_pipeline",
    "recommend_config",
    "PipelineRecommendation",
    "ConfigRecommendation",
    "MemoryEstimate",
    "estimate_memory",
    "compute_receptive_field",
    "compute_max_stride_for_animal_size",
    "recommend_default_max_stride",
    "estimate_unet_params",
    "compute_suggested_crop_size",
    "compute_suggested_tile_size",
    "compute_suggested_tile_overlap",
    "compute_backbone_context_margin",
    "generate_config",
]
