"""Model output container.

The reference framework threads a dict-like ``ModelOutput`` through every
forward pass (reference: src/lib/src/pythae/models/base/base_utils.py).  Here
it is a plain dict subclass registered as a JAX pytree so outputs can flow
through ``jit``/``grad``/``vmap`` unchanged.
"""

from __future__ import annotations

import jax


class ModelOutput(dict):
    """Dict with attribute access, usable as a JAX pytree.

    >>> out = ModelOutput(loss=1.0, z=z_seq)
    >>> out.loss
    1.0
    """

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value


def _flatten(out: ModelOutput):
    keys = tuple(sorted(out.keys()))
    return tuple(out[k] for k in keys), keys


def _unflatten(keys, children) -> ModelOutput:
    return ModelOutput(zip(keys, children))


jax.tree_util.register_pytree_node(ModelOutput, _flatten, _unflatten)
