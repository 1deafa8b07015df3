"""HLO communication-plan invariants for the sharded training paths.

A sharding regression typically stays numerically correct while silently
multiplying ICI traffic (e.g. GSPMD all-gathering the replicated params
every step, or an epoch scan whose collectives scale with the step count).
These tests compile the real train/epoch functions under their production
shardings on the faked 8-device mesh and pin the collective structure.

The reference has no distributed communication to compare against
(SURVEY.md §2c); the invariants here pin OUR design contract:
parallel/sharding.py's layouts must keep per-step traffic at ~1x param
bytes (DP) and below it (DP x TP, sharded grads).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from rlvae_tpu.models import RlVAE
from rlvae_tpu.parallel import (
    batch_sharding,
    create_mesh,
    replicate,
    shard_params,
)
from rlvae_tpu.parallel.comm_audit import audit, param_bytes
from rlvae_tpu.train import (
    make_epoch_fn_sharded,
    make_optimizer,
    make_train_step,
)


def _build():
    model = RlVAE(
        input_dim=(3, 8, 8), latent_dim=16, n_flows=2, flow_hidden_size=32,
        posterior_type="gaussian", use_riemannian=False,
    )
    variables = model.init(jax.random.PRNGKey(0), n_obs=4)
    optimizer = make_optimizer(1e-3, 0.0)
    return model, variables, optimizer


def test_dp_step_collective_plan():
    """DP: one step reduces grads+metrics (~1x param bytes) and must never
    gather params or batch (0 all-gather/all-to-all bytes)."""
    model, variables, optimizer = _build()
    pbytes = param_bytes(variables["params"])
    mesh = create_mesh()
    v = replicate(mesh, variables)
    o = replicate(mesh, optimizer.init(variables["params"]))
    batch = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0).uniform(size=(16, 4, 3, 8, 8)), jnp.float32
        ),
        batch_sharding(mesh),
    )
    rep = audit(make_train_step(model, optimizer), (v, o, batch, jax.random.PRNGKey(1)))
    c = rep["collectives"]
    assert c["all-gather"]["bytes"] == 0, c
    assert c["all-to-all"]["bytes"] == 0, c
    # grad reduction + metric scalars: within [1.0, 1.25]x param bytes
    assert pbytes <= c["all-reduce"]["bytes"] <= 1.25 * pbytes, (
        c["all-reduce"], pbytes,
    )
    assert rep["total_count"] <= 16, rep


def test_dp_tp_step_reduces_less_than_dp():
    """DP x TP: model-sharded kernels shrink the gradient reduction — total
    reduced bytes must stay BELOW the replicated-DP volume."""
    model, variables, optimizer = _build()
    pbytes = param_bytes(variables["params"])
    mesh = create_mesh(n_devices=8, model_parallel=2)
    v = shard_params(mesh, variables)
    o = shard_params(mesh, optimizer.init(variables["params"]))
    batch = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0).uniform(size=(16, 4, 3, 8, 8)), jnp.float32
        ),
        batch_sharding(mesh),
    )
    rep = audit(make_train_step(model, optimizer), (v, o, batch, jax.random.PRNGKey(1)))
    c = rep["collectives"]
    assert 0 < rep["total_bytes"] < pbytes, (rep["total_bytes"], pbytes)
    # whatever mix of all-reduce/reduce-scatter GSPMD picks, nothing may
    # gather the full parameter set per step
    assert c["all-gather"]["bytes"] < pbytes / 2, c


def test_epoch_scan_collectives_are_static():
    """The whole-epoch shard_map scan must carry its collectives in the loop
    BODY: the static instruction count may not grow with the step count."""

    def compile_summary(steps):
        model, variables, optimizer = _build()
        mesh = create_mesh()
        epoch_fn = make_epoch_fn_sharded(model, optimizer, mesh)
        rng = np.random.default_rng(0)
        data = jax.device_put(
            jnp.asarray(rng.uniform(size=(32, 4, 3, 8, 8)), jnp.float32),
            NamedSharding(mesh, P("data")),
        )
        perm = np.tile(
            np.arange(2, dtype=np.int32)[None, None, :], (steps, 8, 1)
        )
        perm = jax.device_put(
            jnp.asarray(perm), NamedSharding(mesh, P(None, "data", None))
        )
        v = replicate(mesh, variables)
        o = replicate(mesh, optimizer.init(variables["params"]))
        rep = audit(epoch_fn, (v, o, data, perm, jax.random.PRNGKey(2)))
        return rep, param_bytes(variables["params"])

    rep2, pbytes = compile_summary(2)
    rep4, _ = compile_summary(4)
    assert rep2["collectives"] == rep4["collectives"], (rep2, rep4)
    # per-step traffic: grads + metrics pmean, ~1x param bytes, no gathers
    assert rep2["collectives"]["all-gather"]["bytes"] == 0, rep2
    assert pbytes <= rep2["total_bytes"] <= 1.25 * pbytes, (rep2, pbytes)
    assert rep2["total_count"] <= 6, rep2


def test_ep_metric_terms_one_psum_payload_independent_of_k():
    """The centroid-sharded (EP) metric path must compile to exactly ONE
    fused all-reduce whose payload is the [B/dp, D, D] + [B/dp, D] partials —
    independent of the bank size K.  A regression that psums per-centroid (or
    gathers the bank) would scale traffic with K and defeat the sharding."""
    from rlvae_tpu.geometry import metric as gm
    from rlvae_tpu.parallel import metric_parallel as mp

    rng = np.random.default_rng(0)
    mesh = create_mesh(n_devices=8, model_parallel=2)  # dp=4, ep=2
    d, b = 8, 32
    plans = {}
    for k in (64, 256):
        a = rng.normal(size=(k, d, d)).astype(np.float32) * 0.2
        bank = gm.CentroidMetric.create(
            rng.normal(size=(k, d)).astype(np.float32),
            a @ a.transpose(0, 2, 1) + 0.5 * np.eye(d, dtype=np.float32),
            temperature=0.8,
        )
        bank_sh = mp.shard_metric(mesh, bank)
        z = jax.device_put(
            jnp.asarray(rng.normal(size=(b, d)), jnp.float32),
            batch_sharding(mesh),
        )
        fn = jax.jit(lambda m, zz: mp.hmc_terms_sharded(mesh, m, zz))
        plans[k] = audit(fn, (bank_sh, z))

    for k, rep in plans.items():
        c = rep["collectives"]
        assert c["all-reduce"]["count"] == 1, (k, c)
        assert rep["total_count"] == 1, (k, rep)
        # local partial payload: (B/dp) * (D*D + D) * 4 bytes
        expected = (b // 4) * (d * d + d) * 4
        assert c["all-reduce"]["bytes"] == expected, (k, c, expected)
    assert plans[64]["collectives"] == plans[256]["collectives"], plans


def test_chunked_sharded_epoch_plan_matches_resident():
    """The chunked sharded epoch (larger-than-mesh-HBM path) must carry the
    SAME per-step collective plan as the resident epoch — collectives scale
    with steps-per-chunk only, never with the chunk count, and the pre-
    gathered batches must never be re-gathered."""
    from rlvae_tpu.train.trainer import init_epoch_keys, make_epoch_fn_sharded_chunked

    def compile_summary(steps):
        model, variables, optimizer = _build()
        mesh = create_mesh()
        chunk_fn = make_epoch_fn_sharded_chunked(model, optimizer, mesh)
        rng = np.random.default_rng(0)
        batches = jax.device_put(
            jnp.asarray(rng.uniform(size=(steps, 8, 2, 4, 3, 8, 8)), jnp.float32),
            NamedSharding(mesh, P(None, "data", None)),
        )
        keys = init_epoch_keys(mesh, jax.random.PRNGKey(2))
        v = replicate(mesh, variables)
        o = replicate(mesh, optimizer.init(variables["params"]))
        rep = audit(chunk_fn, (v, o, batches, keys))
        return rep, param_bytes(variables["params"])

    rep2, pbytes = compile_summary(2)
    rep4, _ = compile_summary(4)
    assert rep2["collectives"] == rep4["collectives"], (rep2, rep4)
    assert rep2["collectives"]["all-gather"]["bytes"] == 0, rep2
    assert pbytes <= rep2["total_bytes"] <= 1.25 * pbytes, (rep2, pbytes)
    assert rep2["total_count"] <= 6, rep2
