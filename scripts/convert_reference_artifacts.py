#!/usr/bin/env python
"""One-shot migration CLI: reference torch artifacts -> native .npz.

A user switching from the reference carries four kinds of .pt artifacts
(reference config.py:9-44: data/processed/*.pt sequences,
data/pretrained/{encoder,decoder,metric}*.pt).  Every entry path of this
framework already ingests .pt directly (RlVAE.load_pretrained_components,
geometry/loader.py alias tolerance), so conversion is OPTIONAL — this CLI
exists to produce torch-free artifacts once, after which torch is no
longer needed at runtime.

    python scripts/convert_reference_artifacts.py \
        --dataset data/processed/cyclic_sprites_train.pt \
        --encoder data/pretrained/encoder.pt \
        --decoder data/pretrained/decoder.pt \
        --metric data/pretrained/metric_T0.7_scaled.pt \
        --out-dir converted/

Each artifact is validated after conversion (shape echo for datasets,
round-trip load for components, PSD/NaN report for metrics) and the
summary is printed as JSON.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", type=Path, help=".pt [N,T,C,H,W] sequences")
    ap.add_argument("--encoder", type=Path, help="encoder .pt state dict")
    ap.add_argument("--decoder", type=Path, help="decoder .pt state dict")
    ap.add_argument("--metric", type=Path, help="metric .pt (any alias scheme)")
    ap.add_argument("--out-dir", type=Path, default=Path("converted"))
    args = ap.parse_args(argv)
    if not any((args.dataset, args.encoder, args.decoder, args.metric)):
        ap.error("nothing to convert: pass at least one of "
                 "--dataset/--encoder/--decoder/--metric")

    # conversion is pure host work — never claim the TPU (the axon grant
    # can stall minutes under contention; JAX_PLATFORMS env is ignored
    # here, only jax.config works — CLAUDE.md)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from rlvae_tpu.data import convert as cv

    out = args.out_dir
    out.mkdir(parents=True, exist_ok=True)
    report = {}

    if args.dataset:
        dst = out / (args.dataset.stem + ".npz")
        shape = cv.convert_dataset(args.dataset, dst)
        report["dataset"] = {"out": str(dst), "shape": list(shape)}

    for kind in ("encoder", "decoder"):
        src = getattr(args, kind)
        if src:
            dst = out / (src.stem + ".npz")
            cv.convert_component(src, dst, kind)
            params = cv.load_component_npz(dst)["params"]  # round-trip check
            n = sum(
                v.size
                for v in _leaves(params)
            )
            report[kind] = {"out": str(dst), "param_count": int(n)}

    if args.metric:
        from rlvae_tpu.geometry import load_metric, save_metric
        from rlvae_tpu.geometry.loader import validate_metric_file

        metric = load_metric(args.metric)  # alias-tolerant, validates
        dst = out / (args.metric.stem + ".npz")
        save_metric(metric, dst)
        report["metric"] = {
            "out": str(dst),
            "n_centroids": int(metric.n_centroids),
            "latent_dim": int(metric.latent_dim),
            "validation": validate_metric_file(dst),
        }

    print(json.dumps(report, indent=2, default=str))
    return 0


def _leaves(node):
    if isinstance(node, dict):
        for v in node.values():
            yield from _leaves(v)
    else:
        yield node


if __name__ == "__main__":
    sys.exit(main())
