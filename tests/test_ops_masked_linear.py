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


def test_sparse_lora_grads_match_ref_autodiff():
    """custom_vjp backward == jax.grad through the XLA reference."""
    from vlm_compression_tpu.ops.masked_linear import sparse_lora_matmul_ref

    x, w, mask, a, b = _data(seed=3)
    scale = 1.25

    def loss(x, w, a, b):
        return jnp.sum(sparse_lora_matmul(x, w, mask, a, b, scale) ** 2)

    def loss_ref(x, w, a, b):
        return jnp.sum(sparse_lora_matmul_ref(x, w, mask, a, b, scale) ** 2)

    got = jax.grad(loss, argnums=(0, 1, 2, 3))(x, w, a, b)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, a, b)
    for g, r in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)
    # base-weight gradient never leaks into pruned entries
    assert np.all(np.asarray(got[1])[~np.asarray(mask)] == 0)


def test_sparse_lora_pallas_kernel_interpret():
    """The fused (W + s·A·B)⊙M kernel, interpreter mode on CPU."""
    from jax.experimental.pallas import tpu as pltpu

    from vlm_compression_tpu.ops.masked_linear import (
        _sparse_lora_pallas,
        sparse_lora_matmul_ref,
    )

    rng = np.random.default_rng(7)
    m, k, n, r = 8, 128, 128, 4
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
    mask = jnp.asarray(rng.random((k, n)) > 0.4)
    a = jnp.asarray(rng.standard_normal((k, r)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((r, n)), jnp.float32)
    scale = 0.5
    with pltpu.force_tpu_interpret_mode():
        got = _sparse_lora_pallas(x, w, mask, a, b, scale)
    assert got is not None
    want = sparse_lora_matmul_ref(x, w, mask, a, b, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
