"""Masked-matmul autotune dispatch logic (CPU-side; the on-chip
measurement path runs in bench/BENCH_NOTES)."""

import json

import numpy as np

import jax
import jax.numpy as jnp


def test_lookup_reads_cache_file(tmp_path, monkeypatch):
    from vlm_compression_tpu.ops import autotune

    cache = tmp_path / "autotune.json"
    cache.write_text(json.dumps({
        "64,128,128,bfloat16": {"backend": "pallas",
                                "tiles": [64, 128, 128],
                                "pallas_us": 1.0, "xla_us": 2.0}}))
    monkeypatch.setenv("VCT_AUTOTUNE_CACHE", str(cache))
    autotune._CACHE = None   # force reload
    dec = autotune.lookup_masked_matmul(64, 128, 128, "bfloat16")
    assert dec["backend"] == "pallas" and dec["tiles"] == [64, 128, 128]
    assert autotune.lookup_masked_matmul(1, 2, 3, "bfloat16") is None
    autotune._CACHE = None


def test_auto_dispatch_falls_back_to_xla_when_untuned(monkeypatch,
                                                      tmp_path):
    """Unknown shapes under 'auto' must produce the XLA result (correct
    everywhere)."""
    from vlm_compression_tpu.ops import autotune
    from vlm_compression_tpu.ops.masked_linear import (
        masked_matmul,
        masked_matmul_ref,
        use_pallas_masked_matmul,
    )

    monkeypatch.setenv("VCT_AUTOTUNE_CACHE", str(tmp_path / "none.json"))
    autotune._CACHE = None
    use_pallas_masked_matmul("auto")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 96)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((96, 48)), jnp.float32)
    m = jnp.asarray(rng.random((96, 48)) > 0.5)
    np.testing.assert_allclose(np.asarray(masked_matmul(x, w, m)),
                               np.asarray(masked_matmul_ref(x, w, m)),
                               rtol=1e-6)
    autotune._CACHE = None


def test_tile_candidates_cover_decode_and_prefill():
    from vlm_compression_tpu.ops.autotune import _tile_candidates

    pre = _tile_candidates(2048, 2048, 5120)
    assert pre and all(2048 % bm == 0 and 5120 % bn == 0 and 2048 % bk == 0
                       for bm, bn, bk in pre)
    dec = _tile_candidates(16, 2048, 2048)
    assert dec and all(16 % bm == 0 for bm, _, _ in dec)


def test_grad_through_auto_dispatch():
    """custom_vjp stays intact whatever the dispatch decision."""
    from vlm_compression_tpu.ops.masked_linear import masked_matmul

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((32, 16)), jnp.float32)
    m = jnp.asarray(rng.random((32, 16)) > 0.5)
    g = jax.grad(lambda w_: jnp.sum(masked_matmul(x, w_, m) ** 2))(w)
    # gradient must vanish on pruned positions
    assert np.all(np.asarray(g)[~np.asarray(m)] == 0.0)
    assert np.any(np.asarray(g)[np.asarray(m)] != 0.0)


def test_lora_decision_family_is_namespaced(tmp_path, monkeypatch):
    """lora: keys never collide with masked keys for the same shape."""
    from vlm_compression_tpu.ops import autotune

    cache = tmp_path / "autotune.json"
    cache.write_text(json.dumps({
        "64,128,128,bfloat16": {"backend": "pallas",
                                "tiles": [64, 128, 128],
                                "pallas_us": 1.0, "xla_us": 2.0},
        "lora:64,128,128,bfloat16": {"backend": "xla", "tiles": None,
                                     "pallas_us": 3.0, "xla_us": 2.0}}))
    monkeypatch.setenv("VCT_AUTOTUNE_CACHE", str(cache))
    autotune._CACHE = None
    assert autotune.lookup_masked_matmul(
        64, 128, 128, "bfloat16")["backend"] == "pallas"
    assert autotune.lookup_sparse_lora(
        64, 128, 128, "bfloat16")["backend"] == "xla"
    assert autotune.lookup_sparse_lora(1, 2, 3, "bfloat16") is None
    autotune._CACHE = None


def test_sparse_lora_auto_dispatch_untuned_matches_ref(monkeypatch,
                                                       tmp_path):
    from vlm_compression_tpu.ops import autotune
    from vlm_compression_tpu.ops.masked_linear import (
        sparse_lora_matmul,
        sparse_lora_matmul_ref,
        use_pallas_masked_matmul,
    )

    monkeypatch.setenv("VCT_AUTOTUNE_CACHE", str(tmp_path / "none.json"))
    autotune._CACHE = None
    use_pallas_masked_matmul("auto")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 96)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((96, 48)), jnp.float32)
    m = jnp.asarray(rng.random((96, 48)) > 0.5)
    a = jnp.asarray(rng.standard_normal((96, 2)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((2, 48)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(sparse_lora_matmul(x, w, m, a, b, 1.5)),
        np.asarray(sparse_lora_matmul_ref(x, w, m, a, b, 1.5)), rtol=1e-6)
    autotune._CACHE = None
