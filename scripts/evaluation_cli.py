#!/usr/bin/env python
"""Model evaluation CLI: reconstruction, missing-data imputation, FID.

Reimplements the reference's evaluation + FID scripts (reference:
src/lib/scripts/evaluation.py, fid.py) over this framework's saved runs:
reload a trained RlVAE run (ModelManager.from_run), measure reconstruction
MSE / missing-data imputation on held-out sequences, generate samples, and
report a Fréchet distance in pixel and encoder feature spaces (Inception
weights are not downloadable here — see rlvae_tpu/utils/fid.py).

Example:
    python scripts/evaluation_cli.py --run_dir outputs/.../2026-.. \
        --n_test 64 --fid_samples 64 --prob_missing_data 0.25
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

import numpy as np  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--run_dir", required=True, help="a Trainer run directory")
    ap.add_argument("--slot", default="best", choices=["best", "last"])
    ap.add_argument("--data_path", default=None, help=".npz/.pt test sequences")
    ap.add_argument("--n_test", type=int, default=64)
    ap.add_argument("--n_obs", type=int, default=8)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--n_runs", type=int, default=3)
    ap.add_argument("--fid_samples", type=int, default=0,
                    help="generate this many samples and report FID (0 = skip)")
    ap.add_argument("--sample_method", default="geodesic")
    ap.add_argument("--prob_missing_data", type=float, default=0.0)
    ap.add_argument("--prob_missing_pixels", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    import jax

    from rlvae_tpu.data.masks import make_batched_masks, make_pixel_masks
    from rlvae_tpu.inference import ModelManager
    from rlvae_tpu.utils.evaluation import evaluate_missing, evaluate_reconstruction
    from rlvae_tpu.utils.fid import encoder_features, fid_score, pixel_features

    manager = ModelManager.from_run(args.run_dir, slot=args.slot)
    model, variables = manager.model, manager.variables

    if args.data_path:
        from rlvae_tpu.data.cyclic import _load_array

        data = _load_array(Path(args.data_path))[: args.n_test]
    else:
        from rlvae_tpu.data.synth import generate_cyclic_sequences

        c, h, w = model.input_dim
        data = generate_cyclic_sequences(
            args.n_test, n_obs=args.n_obs, image_size=(h, w), channels=c,
            seed=args.seed + 7,
        )

    result = {"run_dir": args.run_dir, "n_test": int(data.shape[0])}
    result.update(
        evaluate_reconstruction(
            model, variables, data, jax.random.PRNGKey(args.seed),
            batch_size=args.batch_size, n_runs=args.n_runs,
        )
    )

    if args.prob_missing_data > 0 or args.prob_missing_pixels > 0:
        seq_mask = make_batched_masks(
            data.shape, args.prob_missing_data, args.batch_size, args.seed
        )
        pix_mask = make_pixel_masks(data.shape, args.prob_missing_pixels, args.seed + 1)
        result.update(
            evaluate_missing(
                model, variables, data, seq_mask, pix_mask,
                jax.random.PRNGKey(args.seed + 2),
                batch_size=args.batch_size, n_runs=args.n_runs,
            )
        )

    if args.fid_samples > 0:
        gen = manager.sample_random(
            args.fid_samples, method=args.sample_method, seed=args.seed
        )
        real = np.asarray(data, np.float32)
        result["fid_pixel"] = fid_score(pixel_features(real), pixel_features(gen))
        enc = lambda x: manager.encode(x).embedding
        result["fid_encoder"] = fid_score(
            encoder_features(enc, real), encoder_features(enc, gen)
        )

    print(json.dumps({k: (round(v, 6) if isinstance(v, float) else v)
                      for k, v in result.items()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
