"""Numerical sanitization — the debug-mode NaN/Inf guards.

The reference guards numerics with scattered isfinite checks and
exception-driven fallbacks (SURVEY.md §5: metric_loader PSD/NaN validation,
isfinite KL guard, log-var clamps, Cholesky->eigh try/excepts).  Under jit,
the structural guards are branchless (deterministic jitter, jnp.where
fallbacks); this module adds the *debug-mode* layer: checkify-instrumented
step functions that pinpoint the first NaN/Inf-producing operation, enabled
with ``training.debug_nan_checks: true``.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.experimental import checkify


def add_nan_checks(fn: Callable) -> Callable:
    """Wrap a jit-able function with float checks; raises on first NaN/Inf
    with the offending primitive's location."""
    checked = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapper(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def assert_finite_tree(tree, name: str = "tree") -> None:
    """Host-side finiteness assertion over a pytree (for tests/debug)."""
    import numpy as np

    leaves, _ = jax.tree_util.tree_flatten_with_path(tree)
    bad = [
        jax.tree_util.keystr(path)
        for path, leaf in leaves
        if not np.isfinite(np.asarray(leaf)).all()
    ]
    if bad:
        raise FloatingPointError(f"Non-finite values in {name}: {bad[:5]}")
