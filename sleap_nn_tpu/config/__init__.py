"""Config system: dataclass schemas matching the reference's YAML shape."""

from sleap_nn_tpu.config.base import (
    apply_overrides,
    from_dict,
    load_yaml,
    save_yaml,
    to_dict,
    to_yaml,
)
from sleap_nn_tpu.config.data_config import (
    AugmentationConfig,
    DataConfig,
    GeometricConfig,
    IntensityConfig,
    PreprocessingConfig,
    TilingConfig,
)
from sleap_nn_tpu.config.model_config import (
    BackboneConfig,
    BottomUpConfig,
    CenteredInstanceConfig,
    CentroidConfig,
    ConvNextConfig,
    HeadConfig,
    ModelConfig,
    PAFConfig,
    SingleInstanceConfig,
    SwinTConfig,
    UNetConfig,
)
from sleap_nn_tpu.config.trainer_config import (
    EarlyStoppingConfig,
    EvalConfig,
    LRSchedulerConfig,
    OptimizerConfig,
    TrainerConfig,
    ZMQConfig,
)
from sleap_nn_tpu.config.training_job_config import TrainingJobConfig, verify_training_cfg
from sleap_nn_tpu.config.utils import (
    get_backbone_config,
    get_backbone_type_from_cfg,
    get_head_config,
    get_model_type_from_cfg,
    resolve_model_dir,
)

__all__ = [
    "TrainingJobConfig",
    "DataConfig",
    "ModelConfig",
    "TrainerConfig",
    "verify_training_cfg",
    "get_model_type_from_cfg",
    "get_backbone_type_from_cfg",
    "get_backbone_config",
    "get_head_config",
    "resolve_model_dir",
    "apply_overrides",
    "from_dict",
    "to_dict",
    "to_yaml",
    "load_yaml",
    "save_yaml",
]
