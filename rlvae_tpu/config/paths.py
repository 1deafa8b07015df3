"""Canonical project paths and defaults.

Mirrors the reference's root ``config.py`` module (reference: config.py:9-69),
which centralizes dataset/pretrained-artifact paths and a ``validate_paths``
check.  Artifacts here are ``.npz`` (JAX-native) with tolerance for the
reference's ``.pt`` names via the converters in :mod:`rlvae_tpu.data.convert`.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

PROJECT_ROOT = Path(__file__).resolve().parents[2]

DATA_DIR = PROJECT_ROOT / "data"
RAW_DATA_DIR = DATA_DIR / "raw"
PROCESSED_DATA_DIR = DATA_DIR / "processed"
PRETRAINED_DIR = DATA_DIR / "pretrained"
OUTPUT_DIR = PROJECT_ROOT / "outputs"

TRAIN_DATA_PATH = PROCESSED_DATA_DIR / "Sprites_train_cyclic.npz"
TEST_DATA_PATH = PROCESSED_DATA_DIR / "Sprites_test_cyclic.npz"
ENCODER_PATH = PRETRAINED_DIR / "encoder.npz"
DECODER_PATH = PRETRAINED_DIR / "decoder.npz"
METRIC_PATH = PRETRAINED_DIR / "metric.npz"
METRIC_T07_PATH = PRETRAINED_DIR / "metric_T0.7_scaled.npz"

# Model / training defaults (reference: config.py MODEL_CONFIG/TRAINING_CONFIG).
MODEL_DEFAULTS = {
    "input_dim": (3, 64, 64),
    "latent_dim": 16,
    "n_flows": 8,
    "flow_hidden_size": 256,
    "flow_n_blocks": 2,
    "beta": 1.0,
}

TRAINING_DEFAULTS = {
    "batch_size": 8,
    "learning_rate": 1e-3,
    "n_epochs": 30,
    "seed": 42,
}


def validate_paths(require_pretrained: bool = False) -> Dict[str, bool]:
    """Report which canonical data artifacts exist.

    Unlike the reference (which raises on missing files), this returns a
    status dict so callers can fall back to synthetic data generation.
    """
    status = {
        "train_data": TRAIN_DATA_PATH.exists(),
        "test_data": TEST_DATA_PATH.exists(),
        "encoder": ENCODER_PATH.exists(),
        "decoder": DECODER_PATH.exists(),
        "metric": METRIC_PATH.exists(),
        "metric_T0.7": METRIC_T07_PATH.exists(),
    }
    if require_pretrained and not all(status.values()):
        missing = [k for k, v in status.items() if not v]
        raise FileNotFoundError(f"Missing required data artifacts: {missing}")
    return status
