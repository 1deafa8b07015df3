#!/usr/bin/env python
"""Export a trained run's inference programs as a StableHLO bundle.

    python scripts/export_model.py outputs/<run> --out exports/<run> \
        --ops reconstruct decode generate --buckets 1 8 64 --n-obs 8

The bundle (manifest.json + one .stablehlo program per op x batch bucket)
serves WITHOUT any model/framework code: ``rlvae_tpu.export.load_exported``
needs only jax, and plugs into the BatchingEngine via ``as_ops()``.  The
reference's deployment story is shipping the source tree + cloudpickled nets
(reference: app/backend/model_manager.py, base_model.py:174-213) — this is
the TPU-native replacement.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("run_dir", help="training run directory (with checkpoints/)")
    ap.add_argument("--out", required=True, help="output bundle directory")
    ap.add_argument("--slot", default="best", choices=["best", "last"])
    ap.add_argument("--ops", nargs="+",
                    default=["reconstruct", "encode", "decode", "generate"])
    ap.add_argument("--buckets", nargs="+", type=int, default=[1, 8, 64])
    ap.add_argument("--n-obs", type=int, default=8)
    ap.add_argument("--method", default="geodesic",
                    help="prior sampling method for the generate op")
    ap.add_argument("--platforms", nargs="*", default=None,
                    help="e.g. --platforms cpu tpu for a multi-platform bundle "
                         "(default: current backend)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend in this process")
    ap.add_argument("--quantize", default=None, choices=["int8"],
                    help="weight-only quantization of the Dense kernels "
                         "(~4x smaller weights.npz, dequantized in-program)")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from rlvae_tpu.export import export_model, load_exported
    from rlvae_tpu.inference import ModelManager

    mgr = ModelManager.from_run(args.run_dir, slot=args.slot)
    manifest = export_model(
        mgr, args.out, ops=tuple(args.ops), buckets=tuple(args.buckets),
        n_obs=args.n_obs, generate_method=args.method, platforms=args.platforms,
        quantize=args.quantize,
    )
    progs = sum(
        (Path(args.out) / spec["file"]).stat().st_size
        for entries in manifest["programs"].values()
        for spec in entries.values()
    )
    weights = (Path(args.out) / "weights.npz").stat().st_size
    print(f"[export] {len(manifest['programs'])} ops x {len(args.buckets)} buckets "
          f"-> {args.out} (programs {progs / 1e6:.1f} MB + weights "
          f"{weights / 1e6:.1f} MB, platforms={manifest['platforms']})")

    # smoke: reload and run the smallest bucket of each op
    import numpy as np

    loaded = load_exported(args.out)
    for op in loaded.ops:
        b = loaded.buckets(op)[0]
        spec = manifest["programs"][op][str(b)]
        x = np.zeros(spec["in_shape"], np.dtype(spec["in_dtype"]))
        y = loaded.run(op, x)
        print(f"[export] {op}: {spec['in_shape']} -> {list(y.shape)} OK")


if __name__ == "__main__":
    main()
