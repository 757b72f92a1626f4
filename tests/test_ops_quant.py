"""Int8 weight quantization (TPU-native Linear8bitLt counterpart)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlm_compression_tpu.ops.quant import (
    dequantize_params_tree,
    dequantize_weight,
    int8_matmul,
    quantize_params_tree,
    quantize_weight,
)


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    q, s = quantize_weight(w)
    assert q.dtype == jnp.int8 and s.shape == (32,)
    wd = dequantize_weight(q, s)
    # absmax symmetric: per-column error bounded by scale/2
    err = np.abs(np.asarray(wd - w))
    bound = np.asarray(s)[None, :] * 0.5 + 1e-6
    assert (err <= bound).all()
    # column absmax survives exactly up to rounding
    np.testing.assert_allclose(np.abs(np.asarray(wd)).max(0),
                               np.abs(np.asarray(w)).max(0), rtol=1e-2)


def test_int8_matmul_matches_dequant():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    q, s = quantize_weight(w)
    want = x @ dequantize_weight(q, s)
    got = int8_matmul(x, q, s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    # masked variant zeroes pruned weights before the product
    m = jnp.asarray(rng.random((64, 32)) < 0.5)
    want_m = x @ jnp.where(m, dequantize_weight(q, s), 0.0)
    got_m = int8_matmul(x, q, s, m)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                               rtol=1e-4, atol=1e-4)


def test_quantize_params_tree_roundtrip():
    tree = {
        "blocks_0": {"q": {"kernel": jnp.ones((8, 4)) * 0.3,
                           "bias": jnp.zeros((4,))},
                     "norm": {"scale": jnp.ones((8,))}},
    }
    qt = quantize_params_tree(tree)
    leaf = qt["blocks_0"]["q"]
    assert leaf["kernel"].dtype == jnp.int8
    assert "kernel_scale" in leaf
    assert qt["blocks_0"]["norm"]["scale"].dtype != jnp.int8
    back = dequantize_params_tree(qt)
    np.testing.assert_allclose(np.asarray(back["blocks_0"]["q"]["kernel"]),
                               0.3 * np.ones((8, 4)), rtol=1e-2)
    assert "kernel_scale" not in back["blocks_0"]["q"]


def test_sparse_linear_int8_forward():
    from vlm_compression_tpu.models.layers import SparseLinear
    from vlm_compression_tpu.ops.bitmask import pack_masks_tree

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
    layer = SparseLinear(32)
    variables = dict(layer.init({"params": jax.random.key(0)}, x))
    mask = jnp.asarray(rng.random((64, 32)) < 0.5)
    variables["masks"] = {"mask": mask}

    qvars = dict(variables, params=quantize_params_tree(variables["params"]))
    dvars = dict(variables, params=dequantize_params_tree(qvars["params"]))

    for mode in ("dense", "masked"):
        got = layer.apply(qvars, x, mode=mode)
        want = layer.apply(dvars, x, mode=mode)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    # packed mask composes with int8
    pvars = dict(qvars, masks=pack_masks_tree(qvars["masks"]))
    got = layer.apply(pvars, x, mode="masked")
    want = layer.apply(dvars, x, mode="masked")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow  # int4/int8 kernels have direct fast parity tests
def test_quantized_model_forward():
    from vlm_compression_tpu.models.blip2_t5_instruct import (
        Blip2T5Instruct,
        Blip2T5InstructConfig,
    )

    cfg = Blip2T5InstructConfig.tiny()
    model = Blip2T5Instruct(cfg)
    img = cfg.vit.img_size
    batch = dict(
        image=jnp.zeros((1, img, img, 3), jnp.float32),
        input_ids=jnp.ones((1, 6), jnp.int32),
        attention_mask=jnp.ones((1, 6), jnp.int32),
        labels=jnp.ones((1, 4), jnp.int32),
    )
    variables = dict(model.init(jax.random.key(0), **batch))
    out_fp = model.apply(variables, **batch)
    qvars = dict(variables, params=quantize_params_tree(variables["params"]))
    out_q = model.apply(qvars, **batch)
    assert np.isfinite(float(out_q["loss"]))
    # int8 error stays small at tiny scale
    assert abs(float(out_q["loss"]) - float(out_fp["loss"])) < 0.5


def test_int8_matmul_dynamic_accuracy():
    from vlm_compression_tpu.ops.quant import int8_matmul_dynamic

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((128, 64)).astype(np.float32))
    q, s = quantize_weight(w)
    want = np.asarray(x @ dequantize_weight(q, s))
    got = np.asarray(int8_matmul_dynamic(x, q, s))
    # W8A8 error: relative to output scale, bounded by activation rounding
    denom = np.abs(want).max()
    assert np.abs(got - want).max() / denom < 0.02

    # masked variant
    m = jnp.asarray(rng.random((128, 64)) < 0.5)
    want_m = np.asarray(x @ jnp.where(m, dequantize_weight(q, s), 0.0))
    got_m = np.asarray(int8_matmul_dynamic(x, q, s, m))
    assert np.abs(got_m - want_m).max() / denom < 0.02


def test_sparse_linear_w8a8_mode():
    from vlm_compression_tpu.models.layers import SparseLinear
    from vlm_compression_tpu.ops.quant import use_dynamic_int8

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
    layer = SparseLinear(32)
    variables = dict(layer.init({"params": jax.random.key(0)}, x))
    qvars = dict(variables, params=quantize_params_tree(variables["params"]))
    want = layer.apply(
        dict(variables, params=dequantize_params_tree(qvars["params"])),
        x, mode="dense")
    use_dynamic_int8(True)
    try:
        got = layer.apply(qvars, x, mode="dense")
    finally:
        use_dynamic_int8(False)
    denom = float(jnp.abs(want).max())
    assert float(jnp.abs(got - want).max()) / denom < 0.02


def test_int8_outlier_decomposition_beats_plain_w8a8():
    """LLM.int8-style static-k outlier decomposition: with emergent
    outlier feature columns, the decomposed product must be far closer
    to the exact float result than plain per-row W8A8."""
    from vlm_compression_tpu.ops.quant import (
        int8_matmul_dynamic,
        int8_matmul_outlier,
        quantize_weight,
    )

    rng = np.random.default_rng(0)
    K, N, M = 256, 128, 64
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    q, scale = quantize_weight(w)
    x = rng.standard_normal((M, K)).astype(np.float32)
    # emergent outliers: 8 feature columns 100x larger (LLM.int8 setting)
    out_cols = rng.choice(K, 8, replace=False)
    x[:, out_cols] *= 100.0
    x = jnp.asarray(x)

    exact = np.asarray(x @ (np.asarray(q, np.float32)
                            * np.asarray(scale)[None, :]))
    plain = np.asarray(int8_matmul_dynamic(x, q, scale), np.float32)
    decomp = np.asarray(int8_matmul_outlier(x, q, scale, num_outliers=16),
                        np.float32)

    err_plain = np.abs(plain - exact).mean()
    err_decomp = np.abs(decomp - exact).mean()
    assert err_decomp < err_plain / 5, (err_plain, err_decomp)


def test_int8_outlier_respects_mask():
    from vlm_compression_tpu.ops.quant import (
        int8_matmul_outlier,
        quantize_weight,
    )

    rng = np.random.default_rng(1)
    K, N = 128, 64
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    q, scale = quantize_weight(w)
    mask = jnp.asarray(rng.random((K, N)) > 0.5)
    x = jnp.asarray(rng.standard_normal((4, K)), jnp.float32)
    got = np.asarray(int8_matmul_outlier(x, q, scale, mask=mask,
                                         num_outliers=8), np.float32)
    deq = np.asarray(q, np.float32) * np.asarray(scale)[None, :]
    want = np.asarray(x) @ np.where(np.asarray(mask), deq, 0.0)
    np.testing.assert_allclose(got, want, rtol=0.2, atol=0.3)


def test_select_int8_matmul_dispatch():
    from vlm_compression_tpu.ops import quant as Q

    assert Q.select_int8_matmul() is Q.int8_matmul \
        or Q.dynamic_int8_enabled()
    Q.use_dynamic_int8(True)
    try:
        assert Q.select_int8_matmul() is Q.int8_matmul_dynamic
        Q.set_int8_outliers(16)
        f = Q.select_int8_matmul()
        assert f.func is Q.int8_matmul_outlier \
            and f.keywords == {"num_outliers": 16}
    finally:
        Q.use_dynamic_int8(False)
        Q.set_int8_outliers(0)


# ---------------------------------------------------------------------------
# int4 (grouped, nibble-packed)
# ---------------------------------------------------------------------------


def test_int4_pack_unpack_roundtrip():
    from vlm_compression_tpu.ops.quant import (
        quantize_weight_int4,
        unpack_int4,
    )

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((256, 32)).astype(np.float32))
    packed, scale = quantize_weight_int4(w, group=128)
    assert packed.dtype == jnp.uint8 and packed.shape == (128, 32)
    assert scale.shape == (2, 32)
    q = np.asarray(unpack_int4(packed))
    assert q.min() >= -7 and q.max() <= 7
    # every nibble value decodes back to its original signed int
    direct = np.clip(np.round(np.asarray(w).reshape(2, 128, 32)
                              / np.asarray(scale)[:, None, :]), -7, 7)
    np.testing.assert_array_equal(q, direct.reshape(256, 32))


def test_int4_quantization_error_bounded():
    from vlm_compression_tpu.ops.quant import (
        dequantize_weight_int4,
        quantize_weight_int4,
    )

    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((256, 16)).astype(np.float32))
    packed, scale = quantize_weight_int4(w)
    back = np.asarray(dequantize_weight_int4(packed, scale))
    # per-group absmax/7 → max error is half a quantization step
    step = np.repeat(np.asarray(scale), 128, axis=0)
    assert np.all(np.abs(back - np.asarray(w)) <= 0.5 * step + 1e-6)


def test_int4_matmul_matches_dequant():
    from vlm_compression_tpu.ops.bitmask import pack_mask
    from vlm_compression_tpu.ops.quant import (
        dequantize_weight_int4,
        int4_matmul,
        quantize_weight_int4,
    )

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 256)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((256, 64)).astype(np.float32))
    packed, scale = quantize_weight_int4(w)
    deq = dequantize_weight_int4(packed, scale)
    mask = jnp.asarray(rng.random((256, 64)) < 0.5)

    got = int4_matmul(x, packed, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x @ deq),
                               rtol=1e-5, atol=1e-5)
    got_m = int4_matmul(x, packed, scale, mask)
    want_m = x @ jnp.where(mask, deq, 0.0)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                               rtol=1e-5, atol=1e-5)
    # 2-bit packed mask composes
    got_p = int4_matmul(x, packed, scale, pack_mask(mask))
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_m),
                               rtol=1e-5, atol=1e-5)


def test_sparse_linear_int4_forward():
    from vlm_compression_tpu.models.layers import SparseLinear
    from vlm_compression_tpu.ops.quant import (
        dequantize_weight_int4,
        quantize_params_tree_int4,
    )

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 128)).astype(np.float32))
    layer = SparseLinear(32)
    variables = dict(layer.init({"params": jax.random.key(0)}, x))
    mask = jnp.asarray(rng.random((128, 32)) < 0.5)
    variables["masks"] = {"mask": mask}

    qp = quantize_params_tree_int4(variables["params"])
    assert "kernel" not in qp and "kernel_q4" in qp
    qvars = dict(variables, params=qp)
    dvars = dict(variables)
    dvars["params"] = dict(variables["params"],
                           kernel=dequantize_weight_int4(
                               qp["kernel_q4"], qp["kernel_scale"]))

    for mode in ("dense", "masked"):
        got = layer.apply(qvars, x, mode=mode)
        want = layer.apply(dvars, x, mode=mode)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


def test_sparse_linear_int4_lora_dequantizes():
    from vlm_compression_tpu.models.layers import SparseLinear
    from vlm_compression_tpu.ops.quant import quantize_params_tree_int4

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 128)).astype(np.float32))
    layer = SparseLinear(32, lora_rank=4)
    variables = dict(layer.init({"params": jax.random.key(0)}, x,
                                mode="sparse_lora"))
    variables["masks"] = {"mask": jnp.asarray(rng.random((128, 32)) < 0.5)}
    qvars = dict(variables,
                 params=quantize_params_tree_int4(variables["params"]))
    # B=0 at init → sparse_lora == masked on the dequantized weight
    got = layer.apply(qvars, x, mode="sparse_lora")
    want = layer.apply(qvars, x, mode="masked")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
