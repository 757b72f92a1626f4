"""DSnoT refinement vs torch oracles of the reference branches."""

import jax.numpy as jnp
import numpy as np
import torch

from vlm_compression_tpu.ops.dsnot import (
    dsnot_refine_mask,
    return_reorder_indice,
)
from vlm_compression_tpu.ops.masks import unstructured_mask


def torch_return_reorder_indice(x_np):
    """Oracle (dsnot_pruner.py:1881-1924)."""
    t = torch.from_numpy(x_np)
    pos_idx = torch.arange(0, t.shape[1]).double().repeat(t.shape[0], 1)
    neg_idx = pos_idx.clone()
    pos_idx[~(t > 0)] = float("inf")
    neg_idx[~(t < 0)] = float("inf")
    pos_v, _ = torch.sort(pos_idx, dim=1)
    neg_v, _ = torch.sort(neg_idx, dim=1)
    pos_v = torch.flip(pos_v, dims=[1])
    neg_v[neg_v == float("inf")] = 0
    pos_v[pos_v == float("inf")] = 0
    return (pos_v + neg_v).long().numpy()


def test_return_reorder_indice_matches():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((6, 11)).astype(np.float32)
    got = np.asarray(return_reorder_indice(jnp.asarray(x)))
    want = torch_return_reorder_indice(x)
    np.testing.assert_array_equal(got, want)


def test_reorder_docstring_example():
    x = np.array([[1., -2., 3.], [-2, 2., -4], [5., 6., -7], [-6, -7, -4]],
                 np.float32)
    got = np.asarray(return_reorder_indice(jnp.asarray(x)))
    gathered = np.take_along_axis(x, got, axis=1)
    want = np.array([[-2., 3., 1.], [-2., -4., 2.], [-7., 6., 5.],
                     [-6., -7., -4.]], np.float32)
    np.testing.assert_array_equal(gathered, want)


def torch_dsnot_unstructured(W_np, scaler_np, summ_np, var_np, ratio,
                             max_cycle_time, update_threshold, pow_var=1.0,
                             without_same_sign=True):
    """Verbatim oracle for the unstructured branch (dsnot_pruner.py:553-751),
    including the scatter quartet — which nets to an unconditional
    prune-candidate-kept / regrow-candidate-pruned update each cycle."""
    W = torch.from_numpy(W_np)
    initial_metric = (torch.abs(W)
                      * torch.sqrt(torch.from_numpy(scaler_np)).reshape(1, -1))
    DSnoT_metric = W * torch.from_numpy(summ_np).reshape(1, -1)
    var = torch.from_numpy(var_np)
    rows, cols = W.shape
    weight_mask = torch.zeros_like(initial_metric) == 1
    _, sorted_idx = torch.sort(initial_metric, dim=-1, stable=True)
    sparsity_num = round(cols * ratio)
    res_num = cols - sparsity_num
    initial_prune_indices, initial_res_indices = torch.split(
        sorted_idx, [sparsity_num, res_num], dim=1)
    weight_mask.scatter_(1, initial_prune_indices, True)

    wanda_metric = initial_metric.clone()  # initial_method == "wanda"
    wanda_metric.scatter_(1, initial_prune_indices, float("inf"))
    wanda_res_indices, _ = torch.split(
        torch.sort(wanda_metric, dim=1, stable=True)[1],
        [res_num, sparsity_num], dim=1)
    reorder = torch_return_reorder_indice(
        torch.gather(DSnoT_metric, 1, wanda_res_indices).numpy())
    pruning_block = torch.gather(wanda_res_indices, 1, torch.from_numpy(reorder))

    metric_for_regrowing = DSnoT_metric.clone()
    metric_for_regrowing.scatter_(1, initial_res_indices, 0)
    recon = torch.sum(metric_for_regrowing, dim=1, keepdim=True)
    init_sign = torch.sign(recon)
    if pow_var:
        metric_for_regrowing /= torch.pow(var.reshape(1, -1), pow_var)
    _, regrow_block = torch.sort(metric_for_regrowing, dim=1, stable=True)

    gptr = torch.zeros((rows, 2), dtype=torch.long)
    gptr[:, 1] = cols - 1
    pptr = torch.zeros((rows, 2), dtype=torch.long)
    pptr[:, 1] = res_num - 1
    step = torch.ones((rows, 2), dtype=torch.long)
    step[:, 1] = -1

    update_mask = torch.ones_like(recon, dtype=torch.bool)
    cycle = 0
    while not (torch.all(update_mask == False) or cycle >= max_cycle_time):  # noqa: E712
        cycle += 1
        g_side = (recon > 0).long()
        gi = torch.gather(gptr, 1, g_side)
        regrow_idx = torch.gather(regrow_block, 1, gi)
        regrow_metric = DSnoT_metric.gather(1, regrow_idx)
        gptr.scatter_(1, g_side, gi + step.gather(1, g_side))

        p_side = (recon < 0).long()
        pi = torch.gather(pptr, 1, p_side)
        prune_idx = torch.gather(pruning_block, 1, pi)
        prune_metric = DSnoT_metric.gather(1, prune_idx)
        pptr.scatter_(1, p_side, pi + step.gather(1, p_side))

        after = recon + prune_metric - regrow_metric
        if without_same_sign:
            update_mask = update_mask & (abs(recon) > update_threshold)
        else:
            update_mask = (update_mask & (abs(recon) > update_threshold)
                           & (init_sign == torch.sign(after)))

        weight_mask.scatter_(1, prune_idx, update_mask)
        weight_mask.scatter_(1, regrow_idx, ~update_mask)
        sub_p = torch.gather(weight_mask, 1, prune_idx)
        sub_g = torch.gather(weight_mask, 1, regrow_idx)
        prune_values = False * update_mask + sub_p * ~update_mask
        regrow_values = True * update_mask + sub_g * ~update_mask
        weight_mask.scatter_(1, prune_idx, prune_values)
        weight_mask.scatter_(1, regrow_idx, regrow_values)

        recon += torch.where(update_mask, prune_metric,
                             torch.zeros_like(prune_metric))
        recon -= torch.where(update_mask, regrow_metric,
                             torch.zeros_like(regrow_metric))
    return (~weight_mask).numpy()


def test_unstructured_matches_oracle():
    """The unstructured loop DOES change the mask (the regrow pointer can
    walk into the zero-metric kept region); bit-equality vs the verbatim
    torch oracle across sign regimes and the without_same_sign branch."""
    for seed, wss in ((1, True), (6, True), (7, False)):
        rng = np.random.default_rng(seed)
        W = rng.standard_normal((8, 24)).astype(np.float32)
        scaler = np.abs(rng.standard_normal(24)).astype(np.float32)
        summ = rng.standard_normal(24).astype(np.float32)
        var = np.abs(rng.standard_normal(24)).astype(np.float32) + 0.1

        want = torch_dsnot_unstructured(
            W, scaler, summ, var, 0.5, max_cycle_time=8,
            update_threshold=0.01, without_same_sign=wss)
        got = dsnot_refine_mask(
            jnp.asarray(W), jnp.asarray(scaler), jnp.asarray(summ),
            jnp.asarray(var), sparsity=0.5, max_cycle_time=8,
            update_threshold=0.01, without_same_sign=wss)
        np.testing.assert_array_equal(np.asarray(got.keep_mask), want,
                                      err_msg=f"seed={seed} wss={wss}")


def test_unstructured_without_dsnot_is_initial_mask():
    """`without_DSnoT` skips refinement: the output is the initial
    wanda-metric mask with round() counting (dsnot_pruner.py:577-578)."""
    rng = np.random.default_rng(1)
    W = rng.standard_normal((8, 24)).astype(np.float32)
    scaler = np.abs(rng.standard_normal(24)).astype(np.float32)
    summ = rng.standard_normal(24).astype(np.float32)
    var = np.abs(rng.standard_normal(24)).astype(np.float32) + 0.1

    got = dsnot_refine_mask(
        jnp.asarray(W), jnp.asarray(scaler), jnp.asarray(summ), jnp.asarray(var),
        sparsity=0.5, without_dsnot=True)
    metric = np.abs(W) * np.sqrt(scaler)[None, :]
    want = np.asarray(unstructured_mask(jnp.asarray(metric), 0.5, rounding="round"))
    np.testing.assert_array_equal(np.asarray(got.keep_mask), want)


def torch_dsnot_nm(W_np, scaler_np, summ_np, var_np, n, m,
                   max_cycle_time=50, update_threshold=0.1, pow_var=1.0):
    """Oracle for the n:m branch (dsnot_pruner.py:407-552)."""
    W = torch.from_numpy(W_np)
    initial_metric = torch.abs(W) * torch.sqrt(torch.from_numpy(scaler_np)).reshape(1, -1)
    DSnoT_metric = W * torch.from_numpy(summ_np).reshape(1, -1)
    var = torch.from_numpy(var_np)

    rows, cols = W.shape
    weight_mask = torch.zeros_like(initial_metric) == 1
    ipi = torch.zeros((rows, 0), dtype=torch.int64)
    iri = torch.zeros((rows, 0), dtype=torch.int64)
    for ii in range(cols):
        if ii % m == 0:
            tmp = initial_metric[:, ii:ii + m].float()
            # stable sort: lowest-index-wins tie policy (see masks test)
            _, all_idx = torch.sort(tmp, dim=1, stable=True)
            all_idx += ii
            t_idx, t_res = torch.split(all_idx, [n, m - n], dim=1)
            ipi = torch.cat((ipi, t_idx), dim=1)
            iri = torch.cat((iri, t_res), dim=1)
            weight_mask.scatter_(1, t_idx, True)

    metric_for_regrowing = DSnoT_metric.clone()
    metric_for_regrowing.scatter_(1, iri, 0)
    recon = torch.sum(metric_for_regrowing, dim=1, keepdim=True)
    init_sign = torch.sign(recon)
    if pow_var:
        metric_for_regrowing /= torch.pow(var.reshape(1, -1), pow_var)
    _, regrow_block = torch.sort(metric_for_regrowing, dim=1, stable=True)

    ptr = torch.zeros((rows, 2), dtype=torch.long)
    ptr[:, 1] = regrow_block.shape[-1] - 1
    upd_num = torch.ones((rows, 2), dtype=torch.long)
    upd_num[:, 1] = -1

    initial_metric.scatter_(1, ipi, float("inf"))
    max_val = torch.max(initial_metric, dim=1, keepdim=True)[0] + 1

    cycle = 1
    update_mask = torch.ones_like(recon, dtype=torch.bool)
    while not (torch.all(update_mask == False) or cycle > max_cycle_time):  # noqa: E712
        cycle += 1
        side = (recon > 0).int().to(torch.int64)
        # clamp, matching the implementation's defined OOB semantics
        ii = torch.gather(ptr, 1, side).clamp(0, cols - 1)
        regrow_idx = torch.gather(regrow_block, 1, ii)
        regrow_metric = DSnoT_metric.gather(1, regrow_idx)
        blk_start = regrow_idx - regrow_idx % m
        blk_idx = torch.arange(0, m).repeat(blk_start.shape[1], 1) + blk_start
        blk = torch.gather(initial_metric, 1, blk_idx)
        # verbatim reference call — its tie index on a fully-consumed
        # (all-inf) block is a torch-CPU quickselect artifact our kernel
        # reproduces via _TORCH_TOPK_TIE_IDX
        _, p_idx = torch.topk(blk, 1, dim=1, largest=False)
        p_idx += blk_start
        p_metric = DSnoT_metric.gather(1, p_idx)
        after = recon + p_metric - regrow_metric
        update_mask = (update_mask
                       & (init_sign == torch.sign(after))
                       & (abs(recon) > update_threshold))
        initial_metric.scatter_(1, p_idx, max_val)
        weight_mask.scatter_(1, p_idx, update_mask)
        weight_mask.scatter_(1, regrow_idx, ~update_mask)
        recon += torch.where(update_mask, p_metric, torch.zeros_like(p_metric))
        recon -= torch.where(update_mask, regrow_metric, torch.zeros_like(regrow_metric))
        ptr.scatter_(1, side, ii + upd_num.gather(1, side))

    return (~weight_mask).numpy()


def test_nm_matches_oracle():
    rng = np.random.default_rng(2)
    rows, cols = 6, 16
    W = rng.standard_normal((rows, cols)).astype(np.float32)
    scaler = np.abs(rng.standard_normal(cols)).astype(np.float32) + 0.1
    summ = rng.standard_normal(cols).astype(np.float32)
    var = np.abs(rng.standard_normal(cols)).astype(np.float32) + 0.5

    want = torch_dsnot_nm(W, scaler, summ, var, 2, 4)
    got = dsnot_refine_mask(
        jnp.asarray(W), jnp.asarray(scaler), jnp.asarray(summ), jnp.asarray(var),
        sparsity=0.5, prune_n=2, prune_m=4)
    np.testing.assert_array_equal(np.asarray(got.keep_mask), want)


def test_nm_matches_oracle_more_seeds():
    """Broader sweep incl. pointer-crossing regimes (small update_threshold).

    Note: the reference semantics do NOT strictly guarantee n:m structure
    once a row exhausts same-sign regrow candidates (the head pointer walks
    into kept columns) — so the invariant we test is oracle equality, not
    per-group counts.
    """
    for seed in (3, 4, 5):
        rng = np.random.default_rng(seed)
        rows, cols = 8, 32
        W = rng.standard_normal((rows, cols)).astype(np.float32)
        scaler = np.abs(rng.standard_normal(cols)).astype(np.float32) + 0.1
        summ = rng.standard_normal(cols).astype(np.float32)
        var = np.abs(rng.standard_normal(cols)).astype(np.float32) + 0.5
        want = torch_dsnot_nm(W, scaler, summ, var, 2, 4, update_threshold=0.01)
        got = dsnot_refine_mask(
            jnp.asarray(W), jnp.asarray(scaler), jnp.asarray(summ),
            jnp.asarray(var), sparsity=0.5, prune_n=2, prune_m=4,
            update_threshold=0.01)
        np.testing.assert_array_equal(np.asarray(got.keep_mask), want)
