"""Mask kernels vs torch oracles implementing the reference math."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vlm_compression_tpu.ops import masks as M


def torch_wanda_unstructured(metric_np, sparsity):
    """Oracle: stable ascending sort per row, prune first int(cols*s) indices
    (wanda_pruner.py:330-337)."""
    t = torch.from_numpy(metric_np)
    mask_pruned = torch.zeros_like(t, dtype=torch.bool)
    idx = torch.sort(t, dim=-1, stable=True)[1][:, : int(t.shape[1] * sparsity)]
    mask_pruned.scatter_(1, idx, True)
    return (~mask_pruned).numpy()


def torch_nm(metric_np, n, m):
    t = torch.from_numpy(metric_np)
    mask_pruned = torch.zeros_like(t, dtype=torch.bool)
    for ii in range(t.shape[1]):
        if ii % m == 0:
            tmp = t[:, ii:ii + m].float()
            mask_pruned.scatter_(1, ii + torch.topk(tmp, n, dim=1, largest=False)[1], True)
    return (~mask_pruned).numpy()


@pytest.mark.parametrize("sparsity", [0.0, 0.25, 0.5, 0.77])
def test_unstructured_matches_torch(sparsity):
    rng = np.random.default_rng(0)
    metric = rng.standard_normal((16, 64)).astype(np.float32)
    got = np.asarray(M.unstructured_mask(jnp.asarray(metric), sparsity))
    want = torch_wanda_unstructured(metric, sparsity)
    np.testing.assert_array_equal(got, want)


def test_unstructured_ties_match_torch():
    # heavy ties: quantized metric exercises the stable-sort tie-breaking
    rng = np.random.default_rng(1)
    metric = (rng.integers(0, 4, (8, 32))).astype(np.float32)
    got = np.asarray(M.unstructured_mask(jnp.asarray(metric), 0.5))
    want = torch_wanda_unstructured(metric, 0.5)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n,m", [(2, 4), (4, 8), (1, 4)])
def test_nm_matches_torch(n, m):
    rng = np.random.default_rng(2)
    metric = rng.standard_normal((12, 64)).astype(np.float32)
    got = np.asarray(M.nm_structured_mask(jnp.asarray(metric), n, m))
    want = torch_nm(metric, n, m)
    np.testing.assert_array_equal(got, want)
    # density is exactly 1 - n/m
    assert abs(float(M.mask_density(jnp.asarray(got))) - (1 - n / m)) < 1e-6


def test_nm_ties_deterministic_lowest_index():
    """Tie-breaking policy: stable, lowest index pruned first.

    (torch's topk tie order is implementation-defined and differs between
    CPU/CUDA, so we pin our own deterministic semantics; ties only matter at
    exact float equality of importance scores.)
    """
    metric = np.array([[1.0, 1.0, 1.0, 1.0, 0.0, 2.0, 0.0, 2.0]], np.float32)
    got = np.asarray(M.nm_structured_mask(jnp.asarray(metric), 2, 4))
    want = np.array([[False, False, True, True, False, True, False, True]])
    np.testing.assert_array_equal(got, want)


def test_wanda_metric():
    rng = np.random.default_rng(4)
    w = rng.standard_normal((8, 16)).astype(np.float32)
    s = np.abs(rng.standard_normal(16)).astype(np.float32)
    got = np.asarray(M.wanda_metric(jnp.asarray(w), jnp.asarray(s)))
    want = np.abs(w) * np.sqrt(s)[None, :]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_global_threshold_mask_density():
    rng = np.random.default_rng(5)
    metric = rng.standard_normal((32, 32)).astype(np.float32)
    mask = np.asarray(M.global_threshold_mask(jnp.asarray(metric), 0.5))
    assert mask.sum() == 32 * 32 - int(32 * 32 * 0.5)


def test_apply_mask_dtype():
    w = jnp.ones((4, 4), jnp.bfloat16)
    mask = jnp.asarray(np.eye(4, dtype=bool))
    out = M.apply_mask(w, mask)
    assert out.dtype == jnp.bfloat16
    assert float(out.sum()) == 4.0


def test_ria_metric_oracle():
    """RIA = |W|/rowsum + |W|/colsum, scaled by (sqrt scaler)^alpha."""
    import numpy as np

    from vlm_compression_tpu.ops.masks import ria_metric

    rng = np.random.default_rng(0)
    W = rng.standard_normal((6, 8)).astype(np.float32)
    s = rng.random(8).astype(np.float32) + 0.1
    got = np.asarray(ria_metric(jnp.asarray(W), jnp.asarray(s), alpha=0.5))
    aw = np.abs(W)
    ri = aw / aw.sum(1, keepdims=True) + aw / aw.sum(0, keepdims=True)
    want = ri * (np.sqrt(s)[None, :] ** 0.5)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_ria_pruner_end_to_end():
    """blipt5_ria_pruner runs the full sweep and hits target density."""
    import jax
    import numpy as np

    from vlm_compression_tpu.compression import load_pruner
    from vlm_compression_tpu.compression.pruners.base import FlaxModel
    from vlm_compression_tpu.models.blip2_t5_instruct import (
        Blip2T5Instruct,
        Blip2T5InstructConfig,
    )

    cfg = Blip2T5InstructConfig.tiny()
    model = Blip2T5Instruct(cfg)
    img = cfg.vit.img_size
    batch = dict(
        image=jax.random.normal(jax.random.key(0), (4, img, img, 3)),
        input_ids=jnp.ones((4, 6), jnp.int32),
        attention_mask=jnp.ones((4, 6), jnp.int32),
        labels=jnp.ones((4, 4), jnp.int32),
    )
    variables = model.init(jax.random.key(1), **batch)
    pruner = load_pruner("blipt5_ria_pruner", FlaxModel(model, dict(variables)),
                         [batch], vit_prune_spec="2-0.5-1.0-1.0",
                         t5_prune_spec="2-0.5-1.0-1.0", num_samples=4)
    fm, _ = pruner.prune(lora_model=True)
    dens = []

    def walk(node, path=()):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, path + (k,))
            elif k == "mask" and any(p.startswith("blocks_") for p in path):
                dens.append(float(np.mean(v)))

    walk(fm.variables["masks"])
    assert dens and abs(np.mean(dens) - 0.5) < 0.05


def test_transposable_nm_mask():
    """Both orientations satisfy n:m; greedy prefers large magnitudes."""
    import numpy as np

    from vlm_compression_tpu.ops.masks import transposable_nm_mask

    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.standard_normal((8, 12)).astype(np.float32))
    keep = np.asarray(transposable_nm_mask(jnp.abs(W), 2, 4))
    # row constraint within every 4-wide group
    assert (keep.reshape(8, 3, 4).sum(-1) <= 2).all()
    # column constraint within every 4-tall group
    assert (keep.reshape(2, 4, 12).sum(1) <= 2).all()
    # greedy keeps the tile-max entry always
    t = np.abs(np.asarray(W)).reshape(2, 4, 3, 4).transpose(0, 2, 1, 3)
    kt = keep.reshape(2, 4, 3, 4).transpose(0, 2, 1, 3)
    for tile, ktile in zip(t.reshape(-1, 4, 4), kt.reshape(-1, 4, 4)):
        i, j = np.unravel_index(np.argmax(tile), (4, 4))
        assert ktile[i, j]
        # 2-approx floor: keeps at least n per tile (here >= 4 of 8 slots)
        assert ktile.sum() >= 4


def test_hybrid_tile_mask_density_and_saliency():
    """PATCH-style tile-level hybrid sparsity: overall density hits the
    target and the most salient tiles stay fully dense."""
    from vlm_compression_tpu.ops.masks import hybrid_tile_mask, mask_density

    rng = np.random.default_rng(0)
    metric = np.abs(rng.standard_normal((256, 256))).astype(np.float32)
    for ts in (0.25, 0.5):
        msk = hybrid_tile_mask(jnp.asarray(metric), ts, 2, 4, tile=64)
        assert float(mask_density(msk)) == pytest.approx(1 - ts, abs=0.02)
    boosted = metric.copy()
    boosted[:64, :64] *= 100
    msk = np.asarray(hybrid_tile_mask(jnp.asarray(boosted), 0.25, 2, 4,
                                      tile=64))
    assert np.all(msk[:64, :64])          # salient tile fully dense
    # sparse tiles obey 2:4 along the input dim
    sparse_rows = msk[-64:, -64:]
    groups = sparse_rows.reshape(64, 16, 4).sum(-1)
    assert np.all(groups == 2) or np.all(groups <= 4)


def test_hybrid_tile_mask_ragged_dims_and_bounds():
    from vlm_compression_tpu.ops.masks import hybrid_tile_mask, mask_density

    rng = np.random.default_rng(1)
    # ragged rows (in-dim stays m-divisible like every real linear)
    metric = jnp.asarray(np.abs(rng.standard_normal((100, 128))),
                         jnp.float32)
    msk = hybrid_tile_mask(metric, 0.3, 2, 4, tile=64)
    assert msk.shape == (100, 128)
    assert 0.6 < float(mask_density(msk)) < 0.85
    with pytest.raises(ValueError):
        hybrid_tile_mask(metric, 0.6, 2, 4)   # > 1 - n/m


def test_nm_mask_supports_slidesparse_family():
    """(2N-2):2N patterns (SlideSparse family — 6:8, 14:16) ride the
    generic n:m extractor: n pruned per group of m, any n < m."""
    import numpy as np

    from vlm_compression_tpu.ops.masks import nm_structured_mask

    rng = np.random.default_rng(0)
    for n, m in ((6, 8), (14, 16)):
        metric = jnp.asarray(rng.random((4, 64)), jnp.float32)
        keep = np.asarray(nm_structured_mask(metric, n, m))
        groups = keep.reshape(4, -1, m)
        assert (groups.sum(-1) == m - n).all()
        # kept entries are exactly the m-n largest per group
        met = np.asarray(metric).reshape(4, -1, m)
        for u in range(4):
            for g in range(met.shape[1]):
                top = set(np.argsort(-met[u, g])[: m - n])
                assert set(np.flatnonzero(groups[u, g])) == top
