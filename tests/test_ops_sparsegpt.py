"""SparseGPT OBS solver vs a torch oracle of the reference algorithm
(sparsegpt_pruner.py:81-215)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vlm_compression_tpu.ops.sparsegpt import sparsegpt_prune


def torch_fasterprune(W_np, H_np, sparsity, prune_n=0, prune_m=0,
                      blocksize=16, percdamp=0.01):
    """Oracle transcription of the reference OBS sweep (fp64 for stability)."""
    W = torch.from_numpy(W_np).double()
    H = torch.from_numpy(H_np).double()
    rows, cols = W.shape

    dead = torch.diag(H) == 0
    H[dead, dead] = 1
    W[:, dead] = 0

    damp = percdamp * torch.mean(torch.diag(H))
    eye = torch.eye(cols, dtype=torch.float64)
    while True:
        try:
            L = torch.linalg.cholesky(H)
            if not torch.isnan(L).any():
                break
        except Exception:
            pass
        H = H + damp * eye
    Hinv_full = torch.cholesky_inverse(L)
    damp2 = percdamp * torch.mean(torch.diag(Hinv_full).abs())
    while True:
        try:
            U = torch.linalg.cholesky(Hinv_full, upper=True)
            if not torch.isnan(U).any():
                break
        except Exception:
            pass
        Hinv_full = Hinv_full + damp2 * eye
    Hinv = U

    prune_mask = torch.zeros_like(W, dtype=torch.bool)
    for i1 in range(0, cols, blocksize):
        i2 = min(i1 + blocksize, cols)
        count = i2 - i1
        W1 = W[:, i1:i2].clone()
        Q1 = torch.zeros_like(W1)
        Err1 = torch.zeros_like(W1)
        Hinv1 = Hinv[i1:i2, i1:i2]

        if prune_n == 0:
            tmp = W1 ** 2 / (torch.diag(Hinv1).reshape(1, -1)) ** 2
            thresh = torch.sort(tmp.flatten())[0][int(tmp.numel() * sparsity)]
            mask1 = tmp <= thresh
        else:
            mask1 = torch.zeros_like(W1, dtype=torch.bool)

        for i in range(count):
            w = W1[:, i]
            d = Hinv1[i, i]
            if prune_n != 0 and i % prune_m == 0:
                tmp = W1[:, i:i + prune_m] ** 2 / (
                    torch.diag(Hinv1)[i:i + prune_m].reshape(1, -1)) ** 2
                mask1.scatter_(
                    1, i + torch.topk(tmp, prune_n, dim=1, largest=False)[1], True)
            q = w.clone()
            q[mask1[:, i]] = 0
            Q1[:, i] = q
            err1 = (w - q) / d
            W1[:, i:] -= err1.unsqueeze(1).matmul(Hinv1[i, i:].unsqueeze(0))
            Err1[:, i] = err1

        W[:, i1:i2] = Q1
        prune_mask[:, i1:i2] = mask1
        W[:, i2:] -= Err1.matmul(Hinv[i1:i2, i2:])

    return W.numpy(), (~prune_mask).numpy()


def _make_problem(rows, cols, seed):
    rng = np.random.default_rng(seed)
    W = rng.standard_normal((rows, cols)).astype(np.float32)
    X = rng.standard_normal((cols * 4, cols)).astype(np.float32)
    H = (2.0 / 8) * (X.T @ X)  # PSD full-rank Hessian
    return W, H.astype(np.float32)


@pytest.mark.parametrize("sparsity", [0.25, 0.5])
def test_unstructured_matches_oracle(sparsity):
    W, H = _make_problem(8, 32, 0)
    want_w, want_mask = torch_fasterprune(W, H, sparsity, blocksize=16)
    got = sparsegpt_prune(jnp.asarray(W), jnp.asarray(H), sparsity, blocksize=16)
    np.testing.assert_array_equal(np.asarray(got.keep_mask), want_mask)
    np.testing.assert_allclose(np.asarray(got.weight), want_w, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("n,m", [(2, 4), (4, 8)])
def test_nm_matches_oracle(n, m):
    W, H = _make_problem(8, 32, 1)
    want_w, want_mask = torch_fasterprune(W, H, 0.0, prune_n=n, prune_m=m, blocksize=16)
    got = sparsegpt_prune(jnp.asarray(W), jnp.asarray(H), 0.0,
                          prune_n=n, prune_m=m, blocksize=16)
    np.testing.assert_array_equal(np.asarray(got.keep_mask), want_mask)
    np.testing.assert_allclose(np.asarray(got.weight), want_w, rtol=2e-3, atol=2e-4)
    # structure audit: exactly n pruned per group of m
    km = np.asarray(got.keep_mask).reshape(8, -1, m)
    assert (km.sum(-1) == m - n).all()


def test_dead_columns_zeroed():
    W, H = _make_problem(4, 16, 2)
    H[:, 3] = 0.0
    H[3, :] = 0.0
    got = sparsegpt_prune(jnp.asarray(W), jnp.asarray(H), 0.5, blocksize=16)
    assert np.asarray(got.weight)[:, 3].sum() == 0.0


def test_pruned_weights_are_zero():
    W, H = _make_problem(8, 32, 3)
    got = sparsegpt_prune(jnp.asarray(W), jnp.asarray(H), 0.5, blocksize=16)
    w = np.asarray(got.weight)
    mask = np.asarray(got.keep_mask)
    assert np.all(w[~mask] == 0.0)


def test_singular_hessian_recovers_via_damping():
    # rank-deficient H: the damped-Cholesky retry loop must engage
    rng = np.random.default_rng(4)
    W = rng.standard_normal((4, 16)).astype(np.float32)
    X = rng.standard_normal((3, 16)).astype(np.float32)  # rank 3 < 16
    H = (X.T @ X).astype(np.float32)
    got = sparsegpt_prune(jnp.asarray(W), jnp.asarray(H), 0.5, blocksize=16)
    assert np.isfinite(np.asarray(got.weight)).all()
    assert np.isfinite(np.asarray(got.losses)).all()


def test_batched_matches_single():
    from vlm_compression_tpu.ops.sparsegpt import (
        sparsegpt_prune,
        sparsegpt_prune_batched,
    )

    rng = np.random.default_rng(7)
    ws = jnp.asarray(rng.standard_normal((3, 16, 32)), jnp.float32)
    hs = []
    for i in range(3):
        x = rng.standard_normal((64, 32)).astype(np.float32)
        hs.append(2.0 / 64 * x.T @ x)
    hs = jnp.asarray(np.stack(hs))
    batched = sparsegpt_prune_batched(ws, hs, 0.5, blocksize=8)
    for i in range(3):
        single = sparsegpt_prune(ws[i], hs[i], 0.5, blocksize=8)
        np.testing.assert_allclose(np.asarray(batched.weight[i]),
                                   np.asarray(single.weight),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(batched.keep_mask[i]),
                                      np.asarray(single.keep_mask))


@pytest.mark.slow
def test_dc_factorization_paths():
    """d&c Cholesky / triangular inverse / TRSM match one-shot lowerings at
    a size that actually recurses (n > _DC_BASE, n % 128 == 0)."""
    from vlm_compression_tpu.ops.sparsegpt import (
        _cholesky_dc,
        _tri_inverse_lower_dc,
        _trsm_right_lower_t,
    )

    n = 1024
    rng = np.random.default_rng(7)
    X = rng.standard_normal((2 * n, n)).astype(np.float64)
    H = (X.T @ X / n + np.eye(n)).astype(np.float32)

    L = np.asarray(_cholesky_dc(jnp.asarray(H)))
    want_L = np.linalg.cholesky(H.astype(np.float64))
    np.testing.assert_allclose(L, want_L, rtol=2e-3, atol=2e-4)

    Li = np.asarray(_tri_inverse_lower_dc(jnp.asarray(L)))
    np.testing.assert_allclose(Li @ L, np.eye(n), atol=5e-3)

    A = rng.standard_normal((64, n)).astype(np.float32)
    Xs = np.asarray(_trsm_right_lower_t(jnp.asarray(A), jnp.asarray(L)))
    np.testing.assert_allclose(Xs @ L.T, A, rtol=2e-3, atol=2e-3)
