"""Bit-packed masks: round-trip, packed matmul parity, layer integration."""

import jax
import jax.numpy as jnp
import numpy as np

from vlm_compression_tpu.ops.bitmask import (
    pack_mask,
    pack_masks_tree,
    unpack_mask,
    unpack_masks_tree,
)
from vlm_compression_tpu.ops.masked_linear import (
    masked_matmul_packed,
    masked_matmul_ref,
)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    for shape in [(64, 96), (33, 7), (128, 256), (16, 5)]:
        m = jnp.asarray(rng.random(shape) < 0.5)
        p = pack_mask(m)
        assert p.dtype == jnp.uint32
        assert p.shape == (8 * ((shape[0] + 127) // 128), shape[1])
        np.testing.assert_array_equal(np.asarray(unpack_mask(p, shape[0])),
                                      np.asarray(m))


def test_packed_matmul_matches_bool():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 12, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((128, 256)), jnp.float32)
    m = jnp.asarray(rng.random((128, 256)) < 0.5)
    want = masked_matmul_ref(x, w, m)
    got = masked_matmul_packed(x, w, pack_mask(m))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed_matmul_grads_match():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((8, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 96)), jnp.float32)
    m = jnp.asarray(rng.random((64, 96)) < 0.5)
    p = pack_mask(m)

    gb = jax.grad(lambda w: jnp.sum(masked_matmul_ref(x, w, m) ** 2))(w)
    gp = jax.grad(lambda w: jnp.sum(masked_matmul_packed(x, w, p) ** 2))(w)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gb),
                               rtol=1e-4, atol=1e-4)
    # pruned weights receive zero gradient
    assert float(jnp.abs(jnp.where(m, 0.0, gp)).max()) == 0.0


def test_masks_tree_pack_and_layer_forward():
    from vlm_compression_tpu.models.layers import SparseLinear

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 64)), jnp.float32)
    layer = SparseLinear(32)
    variables = layer.init({"params": jax.random.key(0)}, x)
    variables = dict(variables)
    mask = jnp.asarray(rng.random((64, 32)) < 0.5)
    variables["masks"] = {"mask": mask}

    y_bool = layer.apply(variables, x, mode="masked")
    packed_vars = dict(variables, masks=pack_masks_tree(variables["masks"]))
    assert packed_vars["masks"]["mask"].dtype == jnp.uint32
    y_packed = layer.apply(packed_vars, x, mode="masked")
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_bool),
                               rtol=1e-5, atol=1e-5)

    # round-trip restores the bool collection exactly
    restored = unpack_masks_tree(packed_vars["masks"])
    np.testing.assert_array_equal(np.asarray(restored["mask"]),
                                  np.asarray(mask))


def test_pallas_packed_kernel_interpret():
    """Run the actual Pallas packed kernel in interpreter mode on CPU."""
    from jax.experimental.pallas import tpu as pltpu

    from vlm_compression_tpu.ops.masked_linear import (
        _masked_matmul_packed_pallas,
    )

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((128, 128)), jnp.float32)
    m = jnp.asarray(rng.random((128, 128)) < 0.5)
    want = masked_matmul_ref(x, w, m)
    with pltpu.force_tpu_interpret_mode():
        got = _masked_matmul_packed_pallas(x, w, pack_mask(m))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_group256_one_bit_roundtrip_and_matmul():
    """GROUP=256 layout uses all 32 bits/word (1 bit per weight)."""
    from vlm_compression_tpu.ops.bitmask import (
        GROUP_1BIT,
        pack_mask,
        packed_rows,
        unpack_mask,
    )
    from vlm_compression_tpu.ops.masked_linear import (
        infer_pack_group,
        masked_matmul_packed,
        masked_matmul_ref,
    )

    rng = np.random.default_rng(3)
    for k in (256, 512, 640):
        m = jnp.asarray(rng.random((k, 128)) > 0.5)
        p = pack_mask(m, GROUP_1BIT)
        assert p.shape[0] == packed_rows(k, GROUP_1BIT)
        # half the words of the 2-bit layout
        assert p.shape[0] * 2 == packed_rows(k, 128) or k % 256
        np.testing.assert_array_equal(
            np.asarray(unpack_mask(p, k, GROUP_1BIT)), np.asarray(m))
        assert infer_pack_group(k, p.shape[0]) == GROUP_1BIT
        x = jnp.asarray(rng.standard_normal((8, k)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, 128)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(masked_matmul_packed(x, w, p)),
            np.asarray(masked_matmul_ref(x, w, m)), rtol=1e-5, atol=1e-5)


def test_masks_tree_records_group():
    from vlm_compression_tpu.ops.bitmask import (
        pack_masks_tree,
        unpack_masks_tree,
    )

    rng = np.random.default_rng(4)
    m = jnp.asarray(rng.random((300, 64)) > 0.5)
    tree = pack_masks_tree({"l": {"mask": m}}, group=256)
    assert int(tree["l"]["mask_group"]) == 256
    back = unpack_masks_tree(tree)
    np.testing.assert_array_equal(np.asarray(back["l"]["mask"]),
                                  np.asarray(m))


def test_group256_lora_forward_unpacks_correctly():
    """Regression (advisor): SparseLinear's LoRA path must infer the
    pack group when unpacking 1-bit masks."""
    import jax

    from vlm_compression_tpu.models.layers import SparseLinear
    from vlm_compression_tpu.ops.bitmask import pack_masks_tree

    rng = np.random.default_rng(0)
    lin = SparseLinear(64, lora_rank=4, param_dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 512)), jnp.float32)
    variables = dict(lin.init(jax.random.key(0), x, mode="sparse_lora"))
    ref = lin.apply(variables, x, mode="sparse_lora")
    packed_vars = dict(variables)
    packed_vars["masks"] = pack_masks_tree(variables["masks"], group=256)
    got = lin.apply(packed_vars, x, mode="sparse_lora")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
