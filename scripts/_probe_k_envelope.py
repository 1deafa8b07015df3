"""One-off chip probe: where do the fused metric kernels break as K grows?

Exploration for outputs/k_scaling (VERDICT r4 item 3). Tries each fused
kernel (bundle / chol-only / hmc_terms) at a K grid and a TB sweep, catching
Mosaic/VMEM failures, and times the XLA fallback at the same shapes.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench(fn, *args, n=30, reps=3):
    import jax

    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / n)
    return float(np.median(times))


def main():
    import jax
    import jax.numpy as jnp

    from rlvae_tpu.geometry.metric import CentroidMetric, _chol_g_inv_xla
    from rlvae_tpu.ops.metric_kernels import (
        chol_bundle_pallas,
        fused_supported,
        hmc_terms_pallas,
        metric_bundle_pallas,
    )

    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    d = 16
    b = 8192

    for k in (200, 2000, 5000, 8000, 11000, 20000):
        c = rng.normal(size=(k, d)).astype(np.float32)
        m = np.eye(d, dtype=np.float32)[None].repeat(k, 0)
        m += 0.1 * rng.normal(size=(k, d, d)).astype(np.float32)
        m = np.einsum("kij,klj->kil", m, m)  # SPD
        metric = CentroidMetric.create(c, m, temperature=0.5, regularization=0.01)
        idx = rng.integers(0, k, size=b)
        z = jnp.asarray(c[idx] + 0.1 * rng.normal(size=(b, d)), jnp.float32)
        log(f"\n=== K={k} (fused_supported={fused_supported(metric)}) ===")

        for tb in (None, 128, 256, 512):
            for name, fn in (
                ("bundle", metric_bundle_pallas),
                ("chol", chol_bundle_pallas),
                ("hmc", hmc_terms_pallas),
            ):
                try:
                    t = bench(fn, metric, z, tb)
                    log(f"  {name:6s} tb={tb}: {t*1e6:9.1f} us -> {b/t:.3e} evals/s")
                except Exception as e:  # noqa: BLE001
                    msg = str(e).split("\n")[0][:140]
                    log(f"  {name:6s} tb={tb}: FAIL {type(e).__name__}: {msg}")
        try:
            t = bench(_chol_g_inv_xla, metric, z)
            log(f"  xla-chol     : {t*1e6:9.1f} us -> {b/t:.3e} evals/s")
        except Exception as e:  # noqa: BLE001
            log(f"  xla-chol     : FAIL {type(e).__name__}: {str(e)[:140]}")


if __name__ == "__main__":
    main()
