"""Missing-data mask generation for the longitudinal research models.

Reimplements the reference's mask utilities (reference:
src/lib/scripts/utils.py:10-48 ``make_batched_masks``,
src/lib/scripts/mask_creation_script.py:41-114): per-batch shared sequence
masks guaranteeing at least 2 observed frames per sequence, plus Bernoulli
pixel masks, saved as one .npz per (p_data, p_pixels) setting.

Host-side numpy (masks are data-prep artifacts, not jit-land values); the
research models consume them as [B, T] / [B, T, C, H, W] float arrays.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np


def make_batched_masks(
    data_shape: Sequence[int],
    prob_missing_data: float,
    batch_size: int,
    seed: int = 0,
) -> np.ndarray:
    """[N, T] sequence masks; every batch shares one mask pattern and every
    sequence keeps >= 2 observed frames (utils.py:10-48).

    The keep-probability is corrected for the 2 forced frames so the expected
    missing fraction matches ``prob_missing_data`` exactly:
    p = ((1 - p_miss) - 2/T) * T / (T - 2).
    """
    n, t = int(data_shape[0]), int(data_shape[1])
    if t <= 2:
        return np.ones((n, t), np.float32)
    rng = np.random.default_rng(seed)
    prob = np.clip(((1.0 - prob_missing_data) - 2.0 / t) * t / (t - 2.0), 0.0, 1.0)
    mask = np.ones((n, t), np.float32)
    n_batches = -(-n // batch_size)
    for i in range(n_batches):
        _mask = np.ones(t, np.float32)
        _mask[2:] = (rng.random(t - 2) < prob).astype(np.float32)
        _mask = _mask[rng.permutation(t)]  # shuffle which frames survive
        lo, hi = i * batch_size, min((i + 1) * batch_size, n)
        mask[lo:hi] = _mask[None, :]
    return mask


def make_pixel_masks(
    data_shape: Sequence[int],
    prob_missing_pixels: float,
    seed: int = 0,
) -> np.ndarray:
    """[N, T, C, H, W] iid Bernoulli pixel masks
    (mask_creation_script.py:84-100)."""
    rng = np.random.default_rng(seed)
    if prob_missing_pixels <= 0.0:
        return np.ones(tuple(data_shape), np.float32)
    return (rng.random(tuple(data_shape)) >= prob_missing_pixels).astype(np.float32)


def create_and_save_masks(
    out_dir: str | Path,
    train_shape: Sequence[int],
    eval_shape: Sequence[int],
    test_shape: Sequence[int],
    prob_missing_data: float = 0.0,
    prob_missing_pixels: float = 0.0,
    batch_size: int = 128,
    seed: int = 0,
) -> Path:
    """Generate + save the six masks the reference's mask script writes
    (mask_creation_script.py:84-114); returns the .npz path."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / (
        f"mask_miss_data_{prob_missing_data}_miss_pixels_{prob_missing_pixels}.npz"
    )
    np.savez_compressed(
        path,
        train_seq_mask=make_batched_masks(train_shape, prob_missing_data, batch_size, seed),
        eval_seq_mask=make_batched_masks(eval_shape, prob_missing_data, batch_size, seed + 1),
        test_seq_mask=make_batched_masks(test_shape, prob_missing_data, batch_size, seed + 2),
        train_pix_mask=make_pixel_masks(train_shape, prob_missing_pixels, seed + 3),
        eval_pix_mask=make_pixel_masks(eval_shape, prob_missing_pixels, seed + 4),
        test_pix_mask=make_pixel_masks(test_shape, prob_missing_pixels, seed + 5),
    )
    return path


def load_masks(path: str | Path) -> dict:
    with np.load(path) as zf:
        return {k: zf[k].astype(np.float32) for k in zf.files}
