from rlvae_tpu.config.compose import Config, compose, expand_multirun, save_config
from rlvae_tpu.config.paths import (
    DECODER_PATH,
    ENCODER_PATH,
    METRIC_PATH,
    METRIC_T07_PATH,
    PROJECT_ROOT,
    TEST_DATA_PATH,
    TRAIN_DATA_PATH,
    validate_paths,
)
from rlvae_tpu.config.schema import assert_valid, validate_config

__all__ = [
    "Config",
    "compose",
    "expand_multirun",
    "save_config",
    "PROJECT_ROOT",
    "TRAIN_DATA_PATH",
    "TEST_DATA_PATH",
    "ENCODER_PATH",
    "DECODER_PATH",
    "METRIC_PATH",
    "METRIC_T07_PATH",
    "validate_paths",
    "validate_config",
    "assert_valid",
]
