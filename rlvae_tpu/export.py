"""Ahead-of-time program export — the deployment artifact story.

The reference has no deployment path at all: serving means unpickling the
torch model class and calling it from the Streamlit backend (reference:
app/backend/model_manager.py:28-381 loads ``model.pt`` + cloudpickled
custom nets, base_model.py:174-213).  That requires shipping the full model
source tree to every serving host.  The TPU-native equivalent is
``jax.export``: the jitted inference programs are lowered to StableHLO and
serialized to disk.  A serving host deserializes and calls them with ZERO
framework/model code — just jax — and the artifact is forward-compatible
across jax releases (StableHLO serialization guarantees) and can be lowered
for several platforms at once.

The trained weights are NOT baked into the programs as constants: every
program takes the flattened parameter leaves as leading arguments and the
leaves are stored once in ``weights.npz``.  Programs stay KB-sized instead
of duplicating the full parameter set per (op, bucket), and the weights can
be swapped (a newer checkpoint) without re-exporting.

One program is exported per (op, batch-bucket), mirroring the serving
engine's bucketed static shapes (rlvae_tpu/serving.py): the loaded bundle
plugs straight into :class:`~rlvae_tpu.serving.BatchingEngine` via
:meth:`ExportedModel.as_ops`.

Layout on disk::

    <out_dir>/manifest.json                 # ops, buckets, shapes, platforms
    <out_dir>/weights.npz                   # flattened variable leaves
    <out_dir>/<op>_b<bucket>.stablehlo      # one serialized program each
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import numpy as np

__all__ = ["export_model", "ExportedModel", "load_exported"]

_FORMAT_VERSION = 1


def _quant_plan(leaves, quantize: Optional[str]):
    """Indices of leaves to quantize.  ``int8`` targets the Dense kernels:
    2-D float leaves of at least 1024 elements (biases/scalars/buffers stay
    exact — they are tiny and numerically load-bearing)."""
    if quantize is None:
        return []
    if quantize != "int8":
        raise ValueError(f"unknown quantization mode {quantize!r}; use 'int8'")
    return [
        i
        for i, leaf in enumerate(leaves)
        if np.issubdtype(leaf.dtype, np.floating)
        and leaf.ndim == 2
        and leaf.size >= 1024
    ]


def _pack_leaves(leaves, plan):
    """Flattened weight list with quantized leaves replaced by
    ``(int8 q, f32 per-output-column scale)`` pairs — symmetric weight-only
    quantization, w ≈ q * scale[None, :]."""
    packed = []
    for i, leaf in enumerate(leaves):
        if i in plan:
            w = np.asarray(leaf, np.float32)
            scale = np.maximum(np.abs(w).max(axis=0), 1e-12) / 127.0
            q = np.clip(np.round(w / scale[None, :]), -127, 127).astype(np.int8)
            packed.append(q)
            packed.append(scale.astype(np.float32))
        else:
            packed.append(np.asarray(leaf))
    return packed


def _make_unpack(plan, orig_dtypes):
    """packed leaf list -> original leaf list (dequantizing in-program)."""
    plan = set(plan)

    def unpack(packed):
        import jax.numpy as jnp

        out, j = [], 0
        for i, dtype in enumerate(orig_dtypes):
            if i in plan:
                q, scale = packed[j], packed[j + 1]
                out.append((q.astype(jnp.float32) * scale[None, :]).astype(dtype))
                j += 2
            else:
                out.append(packed[j])
                j += 1
        return out

    return unpack


def _op_table(manager, n_obs: int, generate_method: str, treedef, unpack):
    """(input-spec, fn) per op.  Every fn takes ``(leaves, batch)`` — the
    flattened variable leaves come in as program ARGUMENTS (stored once in
    weights.npz), not baked constants, so programs stay small and weights
    are swappable without re-export."""
    import jax
    import jax.numpy as jnp

    c, h, w = manager.model.input_dim
    d = manager.model.latent_dim
    key = jax.random.PRNGKey(0)
    model = manager.model

    def unflatten(leaves):
        return jax.tree_util.tree_unflatten(treedef, unpack(leaves))

    from rlvae_tpu.inference import seeded_generate_fn

    _seeded_gen = seeded_generate_fn(model, n_obs, generate_method)

    return {
        "reconstruct": (
            ((n_obs, c, h, w), jnp.float32),
            lambda leaves, x: model.forward(unflatten(leaves), x, key).recon_x,
        ),
        "encode": (
            ((c, h, w), jnp.float32),
            lambda leaves, x: model.encode(unflatten(leaves), x)[0].embedding,
        ),
        "decode": (
            ((d,), jnp.float32),
            lambda leaves, z: model.decode(unflatten(leaves), z)[0].reconstruction,
        ),
        "generate": (
            ((), jnp.uint32),
            lambda leaves, seeds: _seeded_gen(unflatten(leaves), seeds),
        ),
    }


def export_model(
    manager,
    out_dir: str | Path,
    ops: Sequence[str] = ("reconstruct", "encode", "decode", "generate"),
    buckets: Sequence[int] = (1, 8, 64),
    n_obs: int = 8,
    generate_method: str = "geodesic",
    platforms: Optional[Sequence[str]] = None,
    quantize: Optional[str] = None,
) -> Dict[str, Any]:
    """Export a trained :class:`~rlvae_tpu.inference.ModelManager`'s inference
    programs to ``out_dir``.  Returns the manifest.

    ``platforms`` follows ``jax.export`` semantics: None exports for the
    current backend; pass e.g. ``("cpu", "tpu")`` for a multi-platform
    artifact (one program runs on either).

    ``quantize='int8'`` stores the Dense kernels as symmetric weight-only
    int8 with per-output-column scales (dequantized in-program): ~4x
    smaller ``weights.npz`` and weight HBM traffic, biases and buffers kept
    exact.  The quality cost is gated in tests/test_export.py.
    """
    import jax
    from jax import export as jexport

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(manager.variables)
    leaves = [np.asarray(leaf) for leaf in leaves]
    plan = _quant_plan(leaves, quantize)
    packed = _pack_leaves(leaves, plan)
    unpack = _make_unpack(plan, [l.dtype for l in leaves])
    np.savez(out / "weights.npz", **{str(i): leaf for i, leaf in enumerate(packed)})
    leaf_templates = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in packed]

    table = _op_table(
        manager, n_obs=n_obs, generate_method=generate_method, treedef=treedef,
        unpack=unpack,
    )
    unknown = set(ops) - set(table)
    if unknown:
        raise KeyError(f"unknown ops {sorted(unknown)}; have {sorted(table)}")

    manifest: Dict[str, Any] = {
        "format_version": _FORMAT_VERSION,
        "jax_version": jax.__version__,
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        "n_obs": int(n_obs),
        "generate_method": generate_method,
        "input_dim": [int(s) for s in manager.model.input_dim],
        "latent_dim": int(manager.model.latent_dim),
        "buckets": [int(b) for b in buckets],
        "n_weight_leaves": len(packed),
        "quantization": (
            {"mode": quantize, "leaf_indices": [int(i) for i in plan]}
            if quantize
            else None
        ),
        "programs": {},
    }
    for op in ops:
        (item_shape, dtype), fn = table[op]
        entries = {}
        for b in buckets:
            example = jax.ShapeDtypeStruct((int(b), *item_shape), dtype)
            exported = jexport.export(jax.jit(fn), platforms=platforms)(
                leaf_templates, example
            )
            fname = f"{op}_b{int(b)}.stablehlo"
            (out / fname).write_bytes(exported.serialize())
            entries[str(int(b))] = {
                "file": fname,
                "in_shape": [int(b), *map(int, item_shape)],
                "in_dtype": np.dtype(dtype).name,
                "out_shape": [int(s) for s in exported.out_avals[0].shape],
                "out_dtype": str(exported.out_avals[0].dtype),
            }
        manifest["programs"][op] = entries
    (out / "manifest.json").write_text(json.dumps(manifest, indent=2))
    return manifest


class ExportedModel:
    """A loaded export bundle: callable programs, no model code required.

    ``run(op, batch)`` dispatches to the smallest exported bucket that fits
    (padding by edge-replication, slicing the result back) — the same
    static-shape discipline the serving engine uses.
    """

    def __init__(
        self,
        manifest: Dict[str, Any],
        programs: Dict[str, Dict[int, Any]],
        weights: Sequence[Any],
    ):
        self.manifest = manifest
        self._programs = programs
        self._weights = list(weights)

    @property
    def ops(self) -> Tuple[str, ...]:
        return tuple(sorted(self._programs))

    def buckets(self, op: str) -> Tuple[int, ...]:
        return tuple(sorted(self._programs[op]))

    def run(self, op: str, batch: np.ndarray) -> np.ndarray:
        if op not in self._programs:
            raise KeyError(f"unknown op {op!r}; have {self.ops}")
        progs = self._programs[op]
        n = int(np.shape(batch)[0])
        if n == 0:
            raise ValueError(f"empty batch for {op!r}")
        fit = [b for b in progs if b >= n]
        if not fit:
            raise ValueError(
                f"batch {n} exceeds the largest exported bucket {max(progs)} for {op!r}"
            )
        b = min(fit)
        spec = self.manifest["programs"][op][str(b)]
        x = np.asarray(batch, dtype=np.dtype(spec["in_dtype"]))
        if b > n:
            pad = np.broadcast_to(x[-1:], (b - n, *x.shape[1:]))
            x = np.concatenate([x, pad])
        out = np.asarray(progs[b].call(self._weights, x))
        return out[:n]

    def set_weights(self, variables) -> None:
        """Swap in a newer checkpoint's variables (same architecture) without
        re-exporting any program — the weights are program arguments.  For a
        quantized bundle the new leaves are re-quantized under the exported
        plan before staging."""
        import jax

        leaves = [np.asarray(l) for l in jax.tree_util.tree_leaves(variables)]
        qinfo = self.manifest.get("quantization") or {}
        packed = _pack_leaves(leaves, set(qinfo.get("leaf_indices", [])))
        if len(packed) != len(self._weights):
            raise ValueError(
                f"expected {len(self._weights)} packed weight leaves, "
                f"got {len(packed)}"
            )
        for new, old in zip(packed, self._weights):
            if np.shape(new) != np.shape(old):
                raise ValueError(
                    f"weight leaf shape {np.shape(new)} != exported {np.shape(old)}"
                )
            if np.asarray(new).dtype != np.asarray(old).dtype:
                # catch at swap time: the exported program's input signature
                # is dtype-exact, so a mismatch would otherwise surface as an
                # opaque aval error at the first run() after the swap
                raise ValueError(
                    f"weight leaf dtype {np.asarray(new).dtype} != exported "
                    f"{np.asarray(old).dtype}"
                )
        self._weights = [jax.device_put(l) for l in packed]

    def as_ops(self, ops: Optional[Sequence[str]] = None) -> Dict[str, Callable]:
        """Op table for :class:`~rlvae_tpu.serving.BatchingEngine`: serve an
        exported artifact with dynamic batching, no model code."""
        names = list(ops) if ops is not None else list(self.ops)
        return {op: (lambda batch, _op=op: self.run(_op, batch)) for op in names}


def load_exported(out_dir: str | Path) -> ExportedModel:
    """Deserialize an export bundle written by :func:`export_model`."""
    from jax import export as jexport

    out = Path(out_dir)
    manifest = json.loads((out / "manifest.json").read_text())
    if manifest.get("format_version") != _FORMAT_VERSION:
        raise ValueError(
            f"unsupported export format {manifest.get('format_version')!r}"
        )
    with np.load(out / "weights.npz") as z:
        weights = [z[str(i)] for i in range(manifest["n_weight_leaves"])]
    # stage the weights on the device once; every call reuses them
    import jax

    weights = [jax.device_put(w) for w in weights]
    programs: Dict[str, Dict[int, Any]] = {}
    for op, entries in manifest["programs"].items():
        programs[op] = {
            int(b): jexport.deserialize((out / spec["file"]).read_bytes())
            for b, spec in entries.items()
        }
    return ExportedModel(manifest, programs, weights)
