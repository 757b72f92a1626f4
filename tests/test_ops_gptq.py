"""GPTQ op: grid reconstruction, RTN dominance, act_order, joint
sparse+quant, batched variant, and a NumPy full-sweep oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from vlm_compression_tpu.ops.gptq import (
    gptq_dequantize,
    gptq_quantize,
    gptq_quantize_batched,
    rtn_quantize,
)


def _calib(units=16, cols=32, n=256, seed=0):
    rng = np.random.RandomState(seed)
    # correlated inputs: GPTQ's error feedback only matters off-diagonal
    base = rng.standard_normal((n, cols // 2))
    X = np.concatenate([base, 0.7 * base + 0.3 * rng.standard_normal(
        (n, cols // 2))], axis=1) * (1 + 2 * rng.rand(cols))
    H = (2.0 / n) * X.T @ X
    W = rng.standard_normal((units, cols)) * (0.5 + rng.rand(units, 1))
    return (jnp.asarray(W, jnp.float32), jnp.asarray(H, jnp.float32),
            X.astype(np.float32))


def _obs_loss(W, Wq, H):
    D = np.asarray(W, np.float64) - np.asarray(Wq, np.float64)
    return float(np.einsum("ui,ij,uj->", D, np.asarray(H, np.float64), D))


@pytest.mark.parametrize("sym", [True, False])
def test_reconstruction_and_rtn_dominance(sym):
    W, H, _X = _calib()
    res = gptq_quantize(W, H, bits=4, groupsize=8, sym=sym, blocksize=16)
    # codes reconstruct the fake-quant weights exactly
    rec = gptq_dequantize(res.codes, res.scale, res.zero, res.perm)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(res.weight),
                               atol=1e-6)
    assert res.scale.shape == (16, 4)
    assert int(res.codes.max()) <= 15
    # error feedback beats round-to-nearest on the OBS objective
    rtn = rtn_quantize(W, bits=4, groupsize=8, sym=sym)
    l_gptq = _obs_loss(W, res.weight, H)
    l_rtn = _obs_loss(W, rtn, H)
    assert l_gptq < l_rtn, (l_gptq, l_rtn)


def test_group_spanning_blocks():
    """G > B fallback (odd shapes): one grid over all columns."""
    W, H, _X = _calib(units=8, cols=24)
    res = gptq_quantize(W, H, bits=4, groupsize=0, blocksize=8)
    assert res.scale.shape == (8, 1)
    rec = gptq_dequantize(res.codes, res.scale, res.zero, res.perm)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(res.weight),
                               atol=1e-6)


def test_act_order():
    W, H, _X = _calib(seed=3)
    res = gptq_quantize(W, H, bits=4, groupsize=8, blocksize=16,
                        act_order=True)
    perm = np.asarray(res.perm)
    assert sorted(perm.tolist()) == list(range(32))
    d = np.diagonal(np.asarray(H))
    assert (np.diff(d[perm]) <= 1e-6).all()  # decreasing Hessian diag
    rec = gptq_dequantize(res.codes, res.scale, res.zero, res.perm)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(res.weight),
                               atol=1e-6)
    l_act = _obs_loss(W, res.weight, H)
    l_rtn = _obs_loss(W, rtn_quantize(W, bits=4, groupsize=8), H)
    assert l_act < l_rtn


def test_joint_sparse_quant_unstructured():
    W, H, _X = _calib(seed=5)
    res = gptq_quantize(W, H, bits=4, groupsize=8, blocksize=16,
                        sparsity=0.5)
    keep = np.asarray(res.keep_mask)
    Wq = np.asarray(res.weight)
    assert abs(keep.mean() - 0.5) < 0.05
    assert (Wq[~keep] == 0).all()
    rec = gptq_dequantize(res.codes, res.scale, res.zero, res.perm,
                          keep_mask=res.keep_mask)
    np.testing.assert_allclose(np.asarray(rec), Wq, atol=1e-6)


def test_joint_sparse_quant_nm():
    W, H, _X = _calib(seed=7)
    res = gptq_quantize(W, H, bits=4, groupsize=8, blocksize=16,
                        prune_n=2, prune_m=4)
    keep = np.asarray(res.keep_mask).reshape(16, -1, 4)
    assert (keep.sum(-1) == 2).all()
    assert (np.asarray(res.weight)[~np.asarray(res.keep_mask)] == 0).all()


def test_act_order_rejects_nm():
    W, H, _X = _calib()
    with pytest.raises(ValueError):
        gptq_quantize(W, H, act_order=True, prune_n=2, prune_m=4)


def test_batched_matches_single():
    W0, H0, _ = _calib(seed=11)
    W1, H1, _ = _calib(seed=13)
    bat = gptq_quantize_batched(jnp.stack([W0, W1]), jnp.stack([H0, H1]),
                                bits=4, groupsize=8, blocksize=16)
    for i, (W, H) in enumerate([(W0, H0), (W1, H1)]):
        one = gptq_quantize(W, H, bits=4, groupsize=8, blocksize=16)
        np.testing.assert_allclose(np.asarray(bat.weight[i]),
                                   np.asarray(one.weight), atol=1e-5)
        assert (np.asarray(bat.codes[i]) == np.asarray(one.codes)).all()


def test_numpy_full_sweep_oracle():
    """Blocked sweep == unblocked full sweep (same Hinv factor):
    transcribed GPTQ semantics, no blocking, plain NumPy."""
    from vlm_compression_tpu.ops.sparsegpt import (
        _cholesky_inverse,
        damped_cholesky,
    )

    W, H, _X = _calib(units=8, cols=16, seed=17)
    G, maxq = 8, 15

    Hj = jnp.asarray(H)
    damp = 0.01 * jnp.mean(jnp.diagonal(Hj))
    L = damped_cholesky(Hj, damp)
    Hinv_full = _cholesky_inverse(L)
    damp2 = 0.01 * jnp.mean(jnp.abs(jnp.diagonal(Hinv_full)))
    Hinv = np.asarray(damped_cholesky(Hinv_full, damp2).T, np.float64)

    Wn = np.asarray(W, np.float64).copy()
    codes = np.zeros_like(Wn)
    scale = np.zeros((8, 2))
    zero = np.zeros((8, 2))
    for j in range(16):
        if j % G == 0:
            slab = Wn[:, j: j + G]
            xmin = np.minimum(slab.min(1), 0)
            xmax = np.maximum(slab.max(1), 0)
            xmax = np.maximum(np.abs(xmin), xmax)
            xmax = np.where((xmin == 0) & (xmax == 0), 1.0, xmax)
            scale[:, j // G] = 2 * xmax / maxq
            zero[:, j // G] = (maxq + 1) // 2
        sc, zc = scale[:, j // G], zero[:, j // G]
        w = Wn[:, j]
        q = np.clip(np.round(w / sc) + zc, 0, maxq)
        deq = sc * (q - zc)
        codes[:, j] = q
        err = (w - deq) / Hinv[j, j]
        Wn[:, j:] -= err[:, None] * Hinv[j, j:][None, :]
        Wn[:, j] = deq

    res = gptq_quantize(W, H, bits=4, groupsize=8, sym=True, blocksize=8)
    match = (np.asarray(res.codes) == codes).mean()
    assert match > 0.97, match
    np.testing.assert_allclose(np.asarray(res.weight), Wn, atol=5e-3)


def test_gptq_int4_storage_bridge():
    """Sym 4-bit GPTQ codes flow bit-exactly through the existing int4
    at-rest storage + matmul (ops.quant.kernel_q4 path)."""
    import jax

    from vlm_compression_tpu.ops.gptq import gptq_to_int4_params
    from vlm_compression_tpu.ops.quant import (
        dequantize_weight_int4,
        int4_matmul,
    )

    W, H, _X = _calib(units=16, cols=32, seed=21)
    res = gptq_quantize(W, H, bits=4, groupsize=8, sym=True, blocksize=16,
                        sparsity=0.5)
    packed, scale = gptq_to_int4_params(res)
    assert packed.shape == (16, 16) and scale.shape == (4, 16)
    deq = dequantize_weight_int4(packed, scale)        # (in, out)
    np.testing.assert_allclose(np.asarray(deq), np.asarray(res.weight).T,
                               atol=1e-6)
    # pruned entries stayed exactly zero through the packed round-trip
    keep = np.asarray(res.keep_mask).T
    assert (np.asarray(deq)[~keep] == 0).all()
    x = jnp.asarray(np.random.RandomState(0).standard_normal((4, 32)),
                    jnp.float32)
    y = int4_matmul(x, packed, scale)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(x @ res.weight.T),
                               rtol=1e-4, atol=1e-4)

    with pytest.raises(ValueError):
        gptq_to_int4_params(gptq_quantize(W, H, bits=4, groupsize=8,
                                          sym=False, blocksize=16))
    with pytest.raises(ValueError):
        gptq_to_int4_params(gptq_quantize(W, H, bits=4, groupsize=8,
                                          act_order=True, blocksize=16))
