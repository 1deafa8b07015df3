#!/usr/bin/env python
"""Create an identity-matrices metric at T=0.7 from an existing metric's
centroids (reference: scripts/create_identity_metric_temp_0_7.py:6 — identity
M_k, centroids kept, temperature forced to 0.7)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from rlvae_tpu.geometry import load_metric, save_metric  # noqa: E402
from rlvae_tpu.geometry.metric import CentroidMetric  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src", type=Path, help="source metric (.npz/.pt)")
    ap.add_argument("out", type=Path)
    ap.add_argument("--temperature", type=float, default=0.7)
    ap.add_argument("--n-centroids", type=int, default=None,
                    help="subsample this many centroids (head)")
    args = ap.parse_args()

    src = load_metric(args.src)
    centroids = np.asarray(src.centroids)
    if args.n_centroids:
        centroids = centroids[: args.n_centroids]
    k, d = centroids.shape
    identity = np.broadcast_to(np.eye(d, dtype=np.float32), (k, d, d)).copy()
    metric = CentroidMetric.create(
        centroids, identity, temperature=args.temperature,
        regularization=float(src.regularization),
    )
    save_metric(metric, args.out)
    print(f"wrote {args.out}: {k} centroids, identity M, T={args.temperature}")


if __name__ == "__main__":
    main()
