#!/usr/bin/env python
"""Research-model experiment CLI — the legacy pythae script surface.

Reimplements the reference's standalone research training scripts
(reference: src/lib/scripts/lvae_iaf.py:17-489, gpvae.py, evaluation.py,
mask_creation_script.py) as ONE argparse CLI over the TPU-native research
zoo (rlvae_tpu/models/research/): LVAE_IAF, VAMP, GP-VAE, RIEM, LLDM,
LVAE_GUGUS.

Same experimental surface: dataset choice (file-backed or synthetic cyclic),
prior/posterior switches, missing-data and missing-pixel masks
(make_batched_masks parity), KL warmup / linear beta scheduling, NLL + MSE
evaluation.  TPU-first mechanics: one jitted donated train step; masks
generated host-side per split and staged per batch.

Examples:
    python scripts/research_cli.py --model lvae_iaf --dataset synthetic \
        --num_epochs 2 --batch_size 8 --prob_missing_data 0.2
    python scripts/research_cli.py --model vamp --compute_nll 1
    python scripts/research_cli.py --make_masks --prob_missing_data 0.3
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

import numpy as np  # noqa: E402

MODELS = ("lvae_iaf", "vamp", "gpvae", "riem", "lldm", "gugus")
# reference dataset table (lvae_iaf.py:20-27 + mask_creation_script.py:41-80);
# raw artifacts are not redistributable -> file paths or synthetic fallback
DATASETS = ("synthetic", "sprites", "starmen", "colormnist", "rotated_mnist", "faces")
DATASET_DIMS = {
    "synthetic": (3, 32, 32),
    "sprites": (3, 64, 64),
    "starmen": (1, 64, 64),
    "colormnist": (3, 28, 28),
    "rotated_mnist": (1, 28, 28),
    "faces": (3, 64, 64),
}


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model", choices=MODELS, default="lvae_iaf")
    ap.add_argument("--dataset", choices=DATASETS, default="synthetic")
    ap.add_argument("--data_path", type=str, default=None,
                    help=".npz/.pt sequence file overriding the dataset table")
    ap.add_argument("--latent_dim", type=int, default=16)
    ap.add_argument("--n_obs", type=int, default=8)
    ap.add_argument("--prior", choices=["standard", "vamp"], default="standard")
    ap.add_argument("--posterior", choices=["gaussian", "iaf"], default="gaussian")
    ap.add_argument("--prob_missing_data", type=float, default=0.0)
    ap.add_argument("--prob_missing_pixels", type=float, default=0.0)
    ap.add_argument("--n_hidden_in_made", type=int, default=3)
    ap.add_argument("--n_made_blocks", type=int, default=2)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--vamp_number_components", type=int, default=50)
    ap.add_argument("--linear_scheduling_steps", type=int, default=0)
    ap.add_argument("--beta", type=float, default=1.0)
    ap.add_argument("--num_epochs", type=int, default=10)
    ap.add_argument("--learning_rate", type=float, default=1e-3)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--n_train", type=int, default=64)
    ap.add_argument("--n_eval", type=int, default=16)
    ap.add_argument("--compute_nll", type=int, default=0)
    ap.add_argument("--compute_mse", type=int, default=1)
    ap.add_argument("--nll_n_samples", type=int, default=50)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--output_dir", type=str, default="outputs/research")
    ap.add_argument("--make_masks", action="store_true",
                    help="only generate + save the mask .npz (mask_creation_script.py)")
    return ap


def load_data(args):
    if args.data_path:
        from rlvae_tpu.data.cyclic import _load_array

        data = _load_array(Path(args.data_path))
    else:
        from rlvae_tpu.data.synth import generate_cyclic_sequences

        c, h, w = DATASET_DIMS[args.dataset]
        data = generate_cyclic_sequences(
            args.n_train + args.n_eval, n_obs=args.n_obs,
            image_size=(h, w), channels=c, seed=args.seed,
        )
    train = data[: args.n_train]
    eval_ = data[args.n_train : args.n_train + args.n_eval]
    return np.asarray(train, np.float32), np.asarray(eval_, np.float32)


def build_model(args, input_dim):
    from rlvae_tpu.models.research import GPVAE, LLDM, LVAE_GUGUS, LVAE_IAF, RIEM, VAMP

    common = dict(input_dim=input_dim, latent_dim=args.latent_dim)
    if args.model == "lvae_iaf":
        return LVAE_IAF(
            n_obs=args.n_obs, warmup=args.warmup, beta=args.beta,
            linear_scheduling_steps=args.linear_scheduling_steps,
            n_made_blocks=args.n_made_blocks, n_hidden_in_made=args.n_hidden_in_made,
            prior=args.prior, posterior=args.posterior,
            vamp_number_components=args.vamp_number_components, **common,
        )
    if args.model == "vamp":
        return VAMP(
            number_components=args.vamp_number_components,
            linear_scheduling_steps=args.linear_scheduling_steps, **common,
        )
    if args.model == "gpvae":
        return GPVAE(time_length=args.n_obs, beta=args.beta, **common)
    if args.model == "riem":
        return RIEM(
            n_obs=args.n_obs, warmup=args.warmup, beta=args.beta,
            prior=args.prior, posterior=args.posterior, **common,
        )
    if args.model == "lldm":
        return LLDM(
            n_obs=args.n_obs, warmup=args.warmup, beta=args.beta,
            prior=args.prior, posterior=args.posterior, **common,
        )
    if args.model == "gugus":
        return LVAE_GUGUS(
            n_obs=args.n_obs, warmup=args.warmup, beta=args.beta,
            prior=args.prior, posterior=args.posterior, **common,
        )
    raise ValueError(args.model)


def main(argv=None):
    args = build_parser().parse_args(argv)
    out_dir = Path(args.output_dir) / f"{args.model}_{args.dataset}"
    out_dir.mkdir(parents=True, exist_ok=True)

    from rlvae_tpu.data.masks import create_and_save_masks, make_batched_masks, make_pixel_masks

    train, eval_ = load_data(args)
    if args.make_masks:
        path = create_and_save_masks(
            out_dir / "masks", train.shape, eval_.shape, eval_.shape,
            args.prob_missing_data, args.prob_missing_pixels,
            args.batch_size, args.seed,
        )
        print(json.dumps({"masks": str(path)}))
        return 0

    import jax
    import jax.numpy as jnp
    import optax

    model = build_model(args, tuple(train.shape[2:]))
    key = jax.random.PRNGKey(args.seed)
    key, k_init = jax.random.split(key)
    variables = model.init(k_init)
    optimizer = optax.adam(args.learning_rate)
    opt_state = optimizer.init(variables["params"])

    seq_mask = make_batched_masks(train.shape, args.prob_missing_data, args.batch_size, args.seed)
    pix_mask = make_pixel_masks(train.shape, args.prob_missing_pixels, args.seed + 1)

    import inspect

    # GP-VAE's forward has no epoch/warmup notion; the longitudinal models do
    fwd_params = inspect.signature(model.forward).parameters
    takes_epoch = "epoch" in fwd_params
    takes_vi = "vi_index" in fwd_params
    # epoch only matters through the warmup branch and the linear beta
    # schedule, both constant from max(warmup, linear_scheduling) on —
    # clamping the static arg there stops the one-retrace-per-epoch cost
    # once the schedule saturates
    saturate = max(
        int(getattr(model, "warmup", 0) or 0),
        int(getattr(model, "linear_scheduling", 0) or 0),
    )

    def loss_fn(params, batch, k, epoch, vi, sm, pm):
        kwargs = dict(train=True, seq_mask=sm, pix_mask=pm)
        if takes_epoch:
            kwargs["epoch"] = epoch
        if vi is not None:
            kwargs["vi_index"] = vi
        out = model.forward({**variables, "params": params}, batch, k, **kwargs)
        return out.loss, out

    import functools

    # epoch and vi_index are static: the research models branch on
    # epoch<warmup, bake the scheduled beta in as a constant, and unroll
    # the flow propagation around the (python-int) visit index
    @functools.partial(jax.jit, static_argnums=(4, 5), donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, k, epoch, vi, sm, pm):
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, k, epoch, vi, sm, pm
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = variables["params"]
    n_steps = train.shape[0] // args.batch_size
    n_obs = train.shape[1]
    vi_rng = np.random.default_rng(args.seed + 17)
    history = []
    t0 = time.time()
    for epoch in range(args.num_epochs):
        perm = np.random.default_rng(args.seed + epoch).permutation(train.shape[0])
        losses = []
        model_epoch = min(epoch, saturate)
        for s in range(n_steps):
            idx = perm[s * args.batch_size : (s + 1) * args.batch_size]
            key, k = jax.random.split(key)
            # per-STEP uniform visit draw, matching the reference's
            # per-batch vi_index (lvae_iaf_model.py:210) — left to the
            # model's in-forward default it would bake ONE host draw into
            # the epoch's trace (same visit for every step, zero KL signal
            # on ~ (n_obs-2)/n_obs of epochs); warmup forwards ignore it,
            # so pin 0 there to avoid retraces
            vi = (
                int(vi_rng.integers(0, n_obs))
                if takes_vi and epoch >= int(getattr(model, "warmup", 0) or 0)
                else (0 if takes_vi else None)
            )
            params, opt_state, loss = train_step(
                params, opt_state, jnp.asarray(train[idx]), k,
                model_epoch, vi, jnp.asarray(seq_mask[idx]), jnp.asarray(pix_mask[idx]),
            )
            losses.append(loss)  # device scalar; fetched once per epoch
        losses = [float(v) for v in jax.device_get(losses)]
        history.append({"epoch": epoch, "loss": float(np.mean(losses))})
        print(f"[{args.model}] epoch {epoch}: loss={np.mean(losses):.4f}", file=sys.stderr)

    variables = {**variables, "params": params}
    result = {
        "model": args.model,
        "dataset": args.dataset,
        "epochs": args.num_epochs,
        "final_loss": history[-1]["loss"] if history else None,
        "train_time_s": round(time.time() - t0, 2),
    }

    key, k_eval = jax.random.split(key)
    if args.compute_mse:
        out = model.forward(variables, jnp.asarray(eval_), k_eval)
        recon = np.asarray(out.recon_x if "recon_x" in out else out.get("reconstruction"))
        result["eval_mse"] = float(np.mean((recon - eval_) ** 2))
    if args.compute_nll and hasattr(model, "estimate_nll"):
        nll = model.estimate_nll(
            variables, jnp.asarray(eval_[: min(8, len(eval_))]), k_eval,
            n_samples=args.nll_n_samples,
        )
        result["eval_nll"] = float(np.mean(np.asarray(nll)))

    (out_dir / "results.json").write_text(json.dumps({"history": history, **result}, indent=2))
    flat = {
        jax.tree_util.keystr(path): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    np.savez_compressed(out_dir / "params.npz", **flat)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
