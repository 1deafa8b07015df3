#!/usr/bin/env python
"""Extract cyclic subsequences from a raw Sprites-style dataset.

Equivalent of the reference's extraction pipeline (reference:
scripts/extract_cyclic_sequences.py:11-150): keep sequences whose first and
last frames coincide (MSE < threshold), normalize /255 when uint-ranged,
convert NHWC->NCHW, save the cyclic subset + metadata.

Usage:
    python scripts/extract_cyclic_sequences.py RAW.pt OUT.npz [--threshold 1e-4]
Accepts .pt (via torch) or .npz/.npy raw inputs.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def load_raw(path: Path) -> np.ndarray:
    if path.suffix in (".pt", ".pth"):
        import torch

        data = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(data, dict):
            # the real Sprites_train.pt wraps the tensor in {'data': ...}
            # (reference: scripts/extract_cyclic_sequences.py:35-39)
            data = data["data"] if "data" in data else next(iter(data.values()))
        return data.detach().cpu().numpy()
    if path.suffix == ".npz":
        with np.load(path) as zf:
            return np.asarray(zf[zf.files[0]])
    return np.load(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("raw", type=Path)
    ap.add_argument("out", type=Path)
    ap.add_argument("--threshold", type=float, default=1e-4)
    args = ap.parse_args()

    data = load_raw(args.raw).astype(np.float32)
    if data.max() > 1.5:  # uint8-ranged -> normalize
        data = data / 255.0
    if data.ndim != 5:
        raise SystemExit(f"Expected 5-D sequences, got {data.shape}")
    # NHWC -> NCHW when channels sit last
    if data.shape[-1] in (1, 3) and data.shape[2] not in (1, 3):
        data = data.transpose(0, 1, 4, 2, 3)

    mse = np.mean((data[:, 0] - data[:, -1]) ** 2, axis=(1, 2, 3))
    keep = mse < args.threshold
    cyclic = data[keep]
    print(f"kept {keep.sum()}/{len(data)} cyclic sequences (threshold {args.threshold})")

    args.out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(args.out, sequences=cyclic)
    meta = {
        "n_raw": int(len(data)),
        "n_cyclic": int(keep.sum()),
        "threshold": args.threshold,
        "mse_kept_max": float(mse[keep].max()) if keep.any() else None,
        "shape": list(cyclic.shape),
    }
    np.savez(args.out.with_name(args.out.stem + "_metadata.npz"), **{
        k: np.asarray(v) for k, v in meta.items() if v is not None
    })
    print(f"wrote {args.out} {cyclic.shape}")


if __name__ == "__main__":
    main()
