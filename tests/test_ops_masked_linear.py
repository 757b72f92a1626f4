"""Masked matmul forwards/backwards vs dense references."""

import jax
import jax.numpy as jnp
import numpy as np

from vlm_compression_tpu.ops.masked_linear import (
    lora_matmul_ref,
    masked_matmul,
    masked_matmul_ref,
    merge_sparse_lora,
    sparse_lora_matmul,
)


def _data(seed=0, m=4, k=16, n=8, r=2):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((m, k)).astype(np.float32)
    w = rng.standard_normal((k, n)).astype(np.float32)
    mask = rng.random((k, n)) > 0.5
    a = rng.standard_normal((k, r)).astype(np.float32)
    b = rng.standard_normal((r, n)).astype(np.float32)
    return (jnp.asarray(x), jnp.asarray(w), jnp.asarray(mask),
            jnp.asarray(a), jnp.asarray(b))


def test_masked_matmul_matches_dense():
    x, w, mask, _, _ = _data()
    got = masked_matmul(x, w, mask)
    want = x @ jnp.where(mask, w, 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_masked_matmul_grads():
    x, w, mask, _, _ = _data()

    def loss(x, w):
        return jnp.sum(masked_matmul(x, w, mask) ** 2)

    def loss_ref(x, w):
        return jnp.sum((x @ jnp.where(mask, w, 0.0)) ** 2)

    gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), rtol=1e-4)
    # gradient never leaks into pruned entries
    assert np.all(np.asarray(gw)[~np.asarray(mask)] == 0)


def test_sparse_lora_matmul_semantics():
    x, w, mask, a, b = _data()
    scale = 2.0
    got = sparse_lora_matmul(x, w, mask, a, b, scale)
    eff = jnp.where(mask, w + scale * (a @ b), 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x @ eff), rtol=1e-5)


def test_lora_matmul_mask_on_base_only():
    x, w, mask, a, b = _data()
    scale = 0.5
    got = lora_matmul_ref(x, w, mask, a, b, scale)
    want = x @ jnp.where(mask, w, 0.0) + scale * (x @ a @ b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_merge_sparse_keeps_sparsity():
    _, w, mask, a, b = _data()
    merged = merge_sparse_lora(w, mask, a, b, scale=1.5, sparse=True)
    assert np.all(np.asarray(merged)[~np.asarray(mask)] == np.asarray(w)[~np.asarray(mask)])
    # merged forward == sparse_lora forward
    x = jnp.ones((3, w.shape[0]), jnp.float32)
    y_merged = x @ jnp.where(mask, merged, 0.0)
    y_sparse = sparse_lora_matmul(x, w, mask, a, b, 1.5)
    np.testing.assert_allclose(np.asarray(y_merged), np.asarray(y_sparse), rtol=1e-5)


def test_merge_dense_densifies():
    _, w, mask, a, b = _data()
    merged = merge_sparse_lora(w, mask, a, b, scale=1.0, sparse=False)
    # pruned entries now carry the (dense) adapter delta — the ablation mode
    delta = np.asarray(a) @ np.asarray(b)
    got_pruned = np.asarray(merged)[~np.asarray(mask)]
    np.testing.assert_allclose(got_pruned, delta[~np.asarray(mask)], rtol=1e-5)


def test_3d_batch_shapes():
    x, w, mask, _, _ = _data()
    x3 = jnp.stack([x, x + 1.0])
    got = masked_matmul(x3, w, mask)
    want = masked_matmul_ref(x3, w, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)
    assert got.shape == (2, 4, 8)
