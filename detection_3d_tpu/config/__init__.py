from detection_3d_tpu.config.defaults import (
    Config, Sparse3DConfig, RPNConfig, ROIConfig, SolverConfig, TestConfig,
    CapacityConfig, default_config,
)
from detection_3d_tpu.config.yaml_loader import load_yaml_config
