from rlvae_tpu.config.compose import Config, compose, expand_multirun, save_config
from rlvae_tpu.config.paths import PROJECT_ROOT, validate_paths

__all__ = [
    "Config",
    "compose",
    "expand_multirun",
    "save_config",
    "PROJECT_ROOT",
    "validate_paths",
]
