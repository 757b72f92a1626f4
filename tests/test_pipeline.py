"""Pipeline parallelism (parallel/pipeline.py): GPipe schedule correctness.

Reference has no pipeline engine (DDP only, SURVEY.md §2.9); the oracle
is therefore the sequential layer-by-layer apply of the SAME stacked
params — forward AND gradients must match across the shard_map'd
microbatch schedule.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from vlm_compression_tpu.parallel.pipeline import (
    make_pipeline_fn,
    pipeline_apply,
    shard_stages,
    split_stages,
    stack_layer_params,
)


def _mlp_block(p, x):
    h = jnp.tanh(x @ p["w1"] + p["b1"])
    return x + h @ p["w2"]


def _make_layers(rng, n_layers, d, h):
    keys = jax.random.split(rng, n_layers * 3).reshape(n_layers, 3, 2)
    out = []
    for i in range(n_layers):
        k1, k2, _ = keys[i]
        out.append({
            "w1": jax.random.normal(k1, (d, h), jnp.float32) * 0.3,
            "b1": jnp.zeros((h,), jnp.float32),
            "w2": jax.random.normal(k2, (h, d), jnp.float32) * 0.3,
        })
    return out


def _sequential(layers, x):
    for p in layers:
        x = _mlp_block(p, x)
    return x


@pytest.fixture(scope="module")
def mesh(devices8):
    return Mesh(np.asarray(devices8).reshape(4, 2), ("pipe", "data"))


def test_pipeline_forward_matches_sequential(mesh):
    rng = jax.random.PRNGKey(0)
    layers = _make_layers(rng, n_layers=8, d=16, h=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (12, 16))

    staged = split_stages(stack_layer_params(layers), n_stages=4)
    staged = shard_stages(staged, mesh)
    y = pipeline_apply(_mlp_block, staged, x, mesh=mesh, n_microbatches=3)
    ref = _sequential(layers, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_with_data_axis(mesh):
    """Batch sharded over the data axis composes with the pipe axis."""
    rng = jax.random.PRNGKey(2)
    layers = _make_layers(rng, n_layers=4, d=8, h=16)
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 8))

    staged = split_stages(stack_layer_params(layers), n_stages=4)
    staged = shard_stages(staged, mesh)
    y = pipeline_apply(_mlp_block, staged, x, mesh=mesh,
                       n_microbatches=2, batch_axis="data")
    ref = _sequential(layers, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow  # forward parity + data-axis tests stay fast
def test_pipeline_gradients_match_sequential(mesh):
    """jax.grad through the GPipe schedule == grad of the sequential net
    (ppermute/scan transposes implement the pipeline backward)."""
    rng = jax.random.PRNGKey(4)
    layers = _make_layers(rng, n_layers=8, d=8, h=16)
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 8))
    tgt = jax.random.normal(jax.random.PRNGKey(6), (4, 8))

    stacked = stack_layer_params(layers)

    def loss_seq(st, xb):
        def body(c, lp):
            return _mlp_block(lp, c), None
        y, _ = jax.lax.scan(body, xb, st)
        return jnp.mean((y - tgt) ** 2)

    pipe_fn = make_pipeline_fn(_mlp_block, mesh=mesh, n_microbatches=2)

    def loss_pipe(staged, xb):
        y = pipe_fn(staged, xb)
        return jnp.mean((y - tgt) ** 2)

    staged = split_stages(stacked, n_stages=4)
    staged = shard_stages(staged, mesh)

    l_ref, g_ref = jax.value_and_grad(loss_seq)(stacked, x)
    l_p, g_p = jax.value_and_grad(loss_pipe)(staged, x)

    np.testing.assert_allclose(float(l_p), float(l_ref), rtol=1e-5)
    g_p_flat = jax.tree_util.tree_map(
        lambda a: np.asarray(a).reshape((-1,) + a.shape[2:]), g_p)
    g_ref_flat = jax.tree_util.tree_map(np.asarray, g_ref)
    for a, b in zip(jax.tree_util.tree_leaves(g_p_flat),
                    jax.tree_util.tree_leaves(g_ref_flat)):
        np.testing.assert_allclose(a, b, rtol=3e-5, atol=3e-5)


def test_make_mesh_pipe_axis(devices8):
    from vlm_compression_tpu.parallel.mesh import MeshConfig, make_mesh

    m = make_mesh(MeshConfig(pipe=4, model=2, data=1), devices=devices8)
    assert m.axis_names == ("pipe", "data", "model")
    assert m.shape["pipe"] == 4 and m.shape["model"] == 2
    m2 = make_mesh(MeshConfig(pipe=2), devices=devices8)  # data inferred
    assert m2.shape["data"] == 4


def test_pipeline_rejects_indivisible(mesh):
    layers = _make_layers(jax.random.PRNGKey(7), n_layers=6, d=4, h=8)
    with pytest.raises(ValueError):
        split_stages(stack_layer_params(layers), n_stages=4)
