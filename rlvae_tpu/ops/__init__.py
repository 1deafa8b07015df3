from rlvae_tpu.ops.linalg import (
    cholesky_small,
    inv_psd_small,
    logdet_from_chol,
    solve_psd_small,
    tri_solve_lower,
)

__all__ = [
    "cholesky_small",
    "inv_psd_small",
    "logdet_from_chol",
    "solve_psd_small",
    "tri_solve_lower",
]
