"""Microbenchmark: metric-path ops on the current jax default device.

Usage: python scripts/bench_metric_micro.py [B ...]
Compares the XLA paths (and later the Pallas kernel) for g_inv / chol / g /
logdet / grad at the reference's shapes (K=200, D=16), plus
jnp.linalg.cholesky vs the unrolled ops.linalg version.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from rlvae_tpu.geometry import (  # noqa: E402
    load_metric,
    g_inv,
    g,
    chol_g_inv,
    logdet_g_inv,
    grad_log_sqrt_det_g_inv,
)
from rlvae_tpu.ops import linalg  # noqa: E402


def timeit(fn, *args, n=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    batches = [int(b) for b in sys.argv[1:]] or [64, 256, 1024, 4096]
    metric = load_metric("data/pretrained/metric.npz")
    print(f"device: {jax.devices()[0]}, K={metric.n_centroids}, D={metric.latent_dim}")
    rng = np.random.default_rng(0)

    for b in batches:
        idx = rng.integers(0, metric.n_centroids, size=b)
        z = jnp.asarray(
            np.asarray(metric.centroids)[idx] + 0.1 * rng.normal(size=(b, 16)),
            jnp.float32,
        )
        fns = {
            "g_inv": jax.jit(lambda m, x: g_inv(m, x)),
            "chol_g_inv": jax.jit(lambda m, x: chol_g_inv(m, x)),
            "g": jax.jit(lambda m, x: g(m, x)),
            "logdet_g_inv": jax.jit(lambda m, x: logdet_g_inv(m, x)),
            "grad_logpi": jax.jit(lambda m, x: grad_log_sqrt_det_g_inv(m, x)),
        }
        row = {name: timeit(f, metric, z) for name, f in fns.items()}
        # unrolled vs lax cholesky on the same SPD batch
        gi = jax.jit(lambda m, x: g_inv(m, x))(metric, z)
        row["chol_unrolled"] = timeit(jax.jit(linalg.cholesky_small), gi)
        row["chol_lax"] = timeit(jax.jit(jnp.linalg.cholesky), gi)
        row["inv_unrolled"] = timeit(jax.jit(linalg.inv_psd_small), gi)
        row["inv_lax"] = timeit(jax.jit(jnp.linalg.inv), gi)
        msg = f"B={b:5d}  " + "  ".join(f"{k}={v*1e6:8.1f}us" for k, v in row.items())
        print(msg)
        print(f"         g evals/sec: {b/row['g']:.3e}  g_inv evals/sec: {b/row['g_inv']:.3e}")


if __name__ == "__main__":
    main()
