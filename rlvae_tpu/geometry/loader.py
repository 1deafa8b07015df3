"""Pretrained-metric loading with the reference's key-alias tolerance.

Reimplements the MetricLoader surface (reference:
src/models/components/metric_loader.py:32-313): tolerant key mapping, shape /
NaN / PSD validation with a report dict, save, and old-format conversion.
Native format is ``.npz``; ``.pt`` files (the reference's artifacts) load
through torch when it is importable.
"""

from __future__ import annotations

import warnings
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

from rlvae_tpu.geometry.metric import CentroidMetric

# Alias tables (reference: metric_loader.py:85-189). `metric_temperature` /
# `metric_regularization` are additions: the reference's own
# metric_T0.7_scaled.pt uses them but its loader misses them and silently
# falls back to defaults unless overridden from config.
CENTROID_KEYS = ("centroids", "metric_centroids", "centers", "mu")
MATRIX_KEYS = ("M_matrices", "metric_vars", "M_tens")
DIAG_MATRIX_KEYS = ("M_i_flat",)
TEMPERATURE_KEYS = ("temperature", "metric_temperature", "temp", "T", "beta")
REGULARIZATION_KEYS = ("regularization", "metric_regularization", "reg", "lambda", "lbd")

DEFAULT_TEMPERATURE = 0.1
DEFAULT_REGULARIZATION = 0.01


def _to_numpy(value) -> np.ndarray:
    if hasattr(value, "detach"):  # torch tensor
        return value.detach().cpu().numpy()
    return np.asarray(value)


def read_raw(path: str | Path) -> Dict[str, Any]:
    """Read a metric artifact file (.npz native, .pt via torch) into a dict."""
    path = Path(path)
    if not path.exists():
        # tolerate the sibling extension (.pt config paths against .npz files)
        for alt in (path.with_suffix(".npz"), path.with_suffix(".pt")):
            if alt.exists():
                path = alt
                break
        else:
            raise FileNotFoundError(f"Metric file not found: {path}")
    if path.suffix == ".npz":
        with np.load(path, allow_pickle=True) as zf:
            return {k: zf[k] for k in zf.files}
    if path.suffix == ".pt":
        try:
            import torch
        except ImportError as e:
            raise RuntimeError(
                f"Loading {path} requires torch; convert it to .npz with "
                "rlvae_tpu.data.convert first"
            ) from e
        data = torch.load(path, map_location="cpu", weights_only=False)
        if not isinstance(data, dict):
            raise ValueError(f"Expected a dict in {path}, got {type(data)}")
        return data
    raise ValueError(f"Unsupported metric file format: {path.suffix}")


def extract_components(
    data: Dict[str, Any],
    temperature_override: Optional[float] = None,
    regularization_override: Optional[float] = None,
) -> Dict[str, Any]:
    """Extract (centroids, matrices, temperature, regularization) from a raw dict."""
    centroids = None
    for key in CENTROID_KEYS:
        if key in data:
            centroids = _to_numpy(data[key]).astype(np.float32)
            break
    if centroids is None:
        raise ValueError(f"No centroids found. Expected one of: {list(CENTROID_KEYS)}")
    n_centroids, latent_dim = centroids.shape

    matrices = None
    for key in MATRIX_KEYS:
        if key in data:
            matrices = _to_numpy(data[key]).astype(np.float32)
            break
    if matrices is None:
        for key in DIAG_MATRIX_KEYS:
            if key in data:
                flat = _to_numpy(data[key]).astype(np.float32)
                matrices = np.zeros((n_centroids, latent_dim, latent_dim), np.float32)
                idx = np.arange(latent_dim)
                matrices[:, idx, idx] = flat
                break
    if matrices is None:
        warnings.warn("No metric matrices found, using identity matrices")
        matrices = np.broadcast_to(
            np.eye(latent_dim, dtype=np.float32), (n_centroids, latent_dim, latent_dim)
        ).copy()
    if matrices.shape != (n_centroids, latent_dim, latent_dim):
        raise ValueError(
            f"Metric matrices shape {matrices.shape} != expected "
            f"{(n_centroids, latent_dim, latent_dim)}"
        )

    def scalar(keys, override, default, label):
        if override is not None:
            return float(override)
        for key in keys:
            if key in data:
                return float(_to_numpy(data[key]))
        warnings.warn(f"No {label} found, using default: {default}")
        return default

    temperature = scalar(TEMPERATURE_KEYS, temperature_override, DEFAULT_TEMPERATURE, "temperature")
    regularization = scalar(
        REGULARIZATION_KEYS, regularization_override, DEFAULT_REGULARIZATION, "regularization"
    )
    return {
        "centroids": centroids,
        "matrices": matrices,
        "temperature": temperature,
        "regularization": regularization,
    }


def validate_components(centroids: np.ndarray, matrices: np.ndarray) -> Dict[str, Any]:
    """Consistency / NaN / PSD validation report (reference: metric_loader.py:191-313)."""
    report: Dict[str, Any] = {
        "n_centroids": int(centroids.shape[0]),
        "latent_dim": int(centroids.shape[1]),
        "shapes_consistent": matrices.shape
        == (centroids.shape[0], centroids.shape[1], centroids.shape[1]),
        "centroids_finite": bool(np.isfinite(centroids).all()),
        "matrices_finite": bool(np.isfinite(matrices).all()),
    }
    if not report["shapes_consistent"]:
        raise ValueError(
            f"Inconsistent shapes: centroids {centroids.shape}, matrices {matrices.shape}"
        )
    if not (report["centroids_finite"] and report["matrices_finite"]):
        raise ValueError("Metric data contains NaN or inf values")

    eigvals = np.linalg.eigvalsh(matrices.astype(np.float64))
    min_eig = float(eigvals.min())
    report["min_eigenvalue"] = min_eig
    report["all_psd"] = bool(min_eig >= -1e-6)
    if not report["all_psd"]:
        warnings.warn(
            f"Some metric matrices are not positive semidefinite (min eigval {min_eig:.3e})"
        )
    report["valid"] = report["shapes_consistent"] and report["centroids_finite"] and report[
        "matrices_finite"
    ]
    return report


def load_metric(
    path: str | Path,
    temperature_override: Optional[float] = None,
    regularization_override: Optional[float] = None,
    validate: bool = True,
) -> CentroidMetric:
    """Load a :class:`CentroidMetric` from a .npz/.pt artifact."""
    raw = read_raw(path)
    comp = extract_components(raw, temperature_override, regularization_override)
    if validate:
        validate_components(comp["centroids"], comp["matrices"])
    return CentroidMetric.create(
        comp["centroids"], comp["matrices"], comp["temperature"], comp["regularization"]
    )


def validate_metric_file(path: str | Path) -> Dict[str, Any]:
    """Standalone validation report for a metric file."""
    raw = read_raw(path)
    comp = extract_components(raw)
    report = validate_components(comp["centroids"], comp["matrices"])
    report["temperature"] = comp["temperature"]
    report["regularization"] = comp["regularization"]
    return report


def save_metric(metric: CentroidMetric, path: str | Path) -> None:
    """Save in the canonical .npz format (canonical key names)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(
        path,
        centroids=np.asarray(metric.centroids),
        M_matrices=np.asarray(metric.matrices),
        temperature=np.float32(metric.temperature),
        regularization=np.float32(metric.regularization),
        latent_dim=np.int32(metric.latent_dim),
        n_centroids=np.int32(metric.n_centroids),
    )


def convert_metric_file(src: str | Path, dst: str | Path, **overrides) -> Dict[str, Any]:
    """Convert any supported metric artifact to canonical .npz; returns the report."""
    metric = load_metric(src, **overrides)
    save_metric(metric, dst)
    return validate_metric_file(dst)
