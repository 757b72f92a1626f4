"""Flash-attention kernel vs the naive reference (interpret mode on CPU).

The Pallas kernel must match ``mha_reference`` — which itself matches the
towers' inline einsum→softmax→einsum blocks (eva_vit.py:90-141,
modeling_t5.py:491-653 semantics) — across bias shapes, causal masking,
unaligned sequence lengths, and head dims needing lane padding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlm_compression_tpu.ops.attention import (
    NEG_INF, attention_core, mha_reference, use_flash_attention)


@pytest.fixture(autouse=True)
def _force_kernel():
    use_flash_attention(True)   # interpret mode off-TPU
    yield
    use_flash_attention("auto")


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


def _check(q, k, v, biases=(), scale=1.0, causal=False, atol=2e-5):
    got = attention_core(q, k, v, biases, scale=scale, causal=causal)
    want = mha_reference(q, k, v, [b for b in biases if b is not None],
                         scale=scale, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=atol, rtol=1e-4)


def test_plain_aligned():
    rng = np.random.default_rng(0)
    q = _rand(rng, 2, 256, 2, 128)
    k = _rand(rng, 2, 256, 2, 128)
    v = _rand(rng, 2, 256, 2, 128)
    _check(q, k, v, scale=128 ** -0.5)


def test_unaligned_vit_shape():
    """EVA ViT-g: 257 tokens, head_dim 88 — both need padding."""
    rng = np.random.default_rng(1)
    q = _rand(rng, 2, 257, 3, 88)
    k = _rand(rng, 2, 257, 3, 88)
    v = _rand(rng, 2, 257, 3, 88)
    _check(q, k, v, scale=88 ** -0.5)


def test_t5_bias_terms():
    """Relative-position bias (1,h,n,m) + padding mask (b,1,1,m), no
    scale (T5 folds it into init), d_kv=64 lane padding."""
    rng = np.random.default_rng(2)
    b, n, m, h, d = 2, 200, 200, 4, 64
    q, k, v = (_rand(rng, b, n, h, d) * 0.3 for _ in range(3))
    pos = _rand(rng, 1, h, n, m)
    mask = jnp.where(jnp.asarray(rng.random((b, 1, 1, m))) < 0.2,
                     NEG_INF, 0.0).astype(jnp.float32)
    _check(q, k, v, [pos, mask])


def test_none_biases_dropped():
    rng = np.random.default_rng(3)
    q = k = v = _rand(rng, 1, 128, 1, 128)
    _check(q, k, v, [None, None], scale=0.1)


def test_causal_square():
    rng = np.random.default_rng(4)
    q = _rand(rng, 2, 320, 2, 64)
    k = _rand(rng, 2, 320, 2, 64)
    v = _rand(rng, 2, 320, 2, 64)
    _check(q, k, v, scale=0.125, causal=True)


def test_causal_rectangular():
    """Right-aligned causal with m > n (cache-priming convention):
    query i sees keys j ≤ i + (m − n) — REAL offsets, not padded ones."""
    rng = np.random.default_rng(5)
    q = _rand(rng, 1, 130, 2, 64)
    k = _rand(rng, 1, 250, 2, 64)
    v = _rand(rng, 1, 250, 2, 64)
    _check(q, k, v, scale=0.125, causal=True)


def test_fully_masked_rows_match_reference():
    """A row whose every key is masked degrades to the uniform average in
    BOTH paths (softmax over all-NEG_INF)."""
    rng = np.random.default_rng(6)
    b, n, m, h, d = 1, 128, 128, 1, 64
    q, k, v = (_rand(rng, b, n, h, d) for _ in range(3))
    mask = jnp.full((b, 1, 1, m), NEG_INF, jnp.float32)
    _check(q, k, v, [mask], scale=0.125, atol=1e-4)


def test_bf16_inputs():
    rng = np.random.default_rng(7)
    q = _rand(rng, 1, 256, 2, 128).astype(jnp.bfloat16)
    k = _rand(rng, 1, 256, 2, 128).astype(jnp.bfloat16)
    v = _rand(rng, 1, 256, 2, 128).astype(jnp.bfloat16)
    _check(q, k, v, scale=128 ** -0.5, atol=2e-2)


def test_gradients_match_reference():
    """custom_vjp backward = exact VJP of the reference, including the
    bias gradients (T5's position bias is trainable)."""
    rng = np.random.default_rng(8)
    b, n, m, h, d = 1, 160, 160, 2, 64
    q, k, v = (_rand(rng, b, n, h, d) * 0.3 for _ in range(3))
    pos = _rand(rng, 1, h, n, m) * 0.1

    def loss_flash(q_, k_, v_, p_):
        return jnp.sum(attention_core(q_, k_, v_, [p_], scale=0.125) ** 2)

    def loss_ref(q_, k_, v_, p_):
        return jnp.sum(mha_reference(q_, k_, v_, [p_], scale=0.125) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, pos)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, pos)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=1e-3)


def test_auto_dispatch_uses_reference_off_tpu():
    use_flash_attention("auto")
    rng = np.random.default_rng(9)
    q = k = v = _rand(rng, 1, 128, 1, 64)
    got = attention_core(q, k, v, scale=0.125)
    want = mha_reference(q, k, v, (), scale=0.125)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_tiny_t5_tower_parity():
    """Whole-tower check: tiny T5 forward (rel-pos bias + padding mask
    threading through attention_core) is identical under the forced
    kernel and the reference path."""
    from vlm_compression_tpu.models.t5 import T5Config, T5ForConditionalGeneration

    cfg = T5Config.tiny(dtype="float32", param_dtype="float32")
    model = T5ForConditionalGeneration(cfg)
    rng = np.random.default_rng(10)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 12)))
    dec = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 6)))
    amask = jnp.asarray([[1] * 12, [1] * 7 + [0] * 5])
    params = model.init(jax.random.PRNGKey(0), ids, amask, dec)

    use_flash_attention(False)
    want = model.apply(params, ids, amask, dec)
    use_flash_attention(True)
    got = model.apply(params, ids, amask, dec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)


def test_tiny_vit_tower_parity():
    from vlm_compression_tpu.models.eva_vit import EvaViT, EvaViTConfig

    cfg = EvaViTConfig.tiny(dtype="float32", param_dtype="float32")
    model = EvaViT(cfg)
    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.standard_normal(
        (2, cfg.img_size, cfg.img_size, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img)

    use_flash_attention(False)
    want = model.apply(params, img)
    use_flash_attention(True)
    got = model.apply(params, img)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("causal", [False, True])
def test_pallas_backward_biasfree(causal):
    """Bias-free path: the Pallas dq/dkv kernels (flash backward — score
    tiles recomputed in VMEM, no (n, m) matrix in HBM) must match the
    reference VJP, including unaligned n/m and lane-padded head dims."""
    rng = np.random.default_rng(12)
    b, n, m, h, d = 2, 200, 200, 2, 88
    q, k, v = (_rand(rng, b, n, h, d) * 0.3 for _ in range(3))

    def loss_flash(q_, k_, v_):
        return jnp.sum(attention_core(q_, k_, v_, scale=0.11,
                                      causal=causal) ** 2)

    def loss_ref(q_, k_, v_):
        return jnp.sum(mha_reference(q_, k_, v_, (), scale=0.11,
                                     causal=causal) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=1e-3)


def test_pallas_backward_rectangular_causal():
    rng = np.random.default_rng(13)
    q = _rand(rng, 1, 130, 2, 64) * 0.3
    k = _rand(rng, 1, 260, 2, 64) * 0.3
    v = _rand(rng, 1, 260, 2, 64) * 0.3

    gf = jax.grad(lambda *a: jnp.sum(
        attention_core(*a, scale=0.125, causal=True) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda *a: jnp.sum(
        mha_reference(*a, (), scale=0.125, causal=True) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=1e-3)


@pytest.mark.slow  # kernel grads fast-covered by the direct pallas_backward_* tests
def test_vit_tower_grads_through_pallas_backward():
    """End-to-end: tiny ViT loss grads identical between forced-kernel
    (Pallas fwd + Pallas bwd — no bias terms in ViT) and reference."""
    from vlm_compression_tpu.models.eva_vit import EvaViT, EvaViTConfig

    cfg = EvaViTConfig.tiny(dtype="float32", param_dtype="float32")
    model = EvaViT(cfg)
    rng = np.random.default_rng(14)
    img = jnp.asarray(rng.standard_normal(
        (2, cfg.img_size, cfg.img_size, 3)), jnp.float32)
    variables = dict(model.init(jax.random.PRNGKey(0), img))
    params = variables.pop("params")

    def loss(p):
        return jnp.sum(model.apply({**variables, "params": p}, img) ** 2)

    use_flash_attention(False)
    gr = jax.grad(loss)(params)
    use_flash_attention(True)
    gf = jax.grad(loss)(params)
    for a, b_ in zip(jax.tree_util.tree_leaves(gf),
                     jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-3, rtol=2e-3)


def test_flash_attention_sharded_mesh():
    """custom_partitioning: the kernel runs per-shard on a (data, model)
    mesh with batch+heads sharded — values AND grads match the reference,
    and output sharding follows the inputs (no forced replication)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh (tests/conftest.py)")
    mesh = Mesh(np.array(devs).reshape(4, 2), ("data", "model"))
    rng = np.random.default_rng(15)
    q, k, v = (jnp.asarray(rng.standard_normal((4, 256, 2, 64)),
                           jnp.float32) * 0.3 for _ in range(3))
    sh = NamedSharding(mesh, P("data", None, "model", None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))

    @jax.jit
    def fwd(q_, k_, v_):
        return attention_core(q_, k_, v_, scale=0.125, causal=True)

    out = fwd(qs, ks, vs)
    want = mha_reference(q, k, v, (), scale=0.125, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-5, rtol=1e-4)
    # the unconstrained jit output layout is the compiler's choice; what
    # matters is that it stayed distributed (no forced replication)
    assert any(ax is not None for ax in out.sharding.spec)

    @jax.jit
    def loss(q_, k_, v_):
        return jnp.sum(attention_core(q_, k_, v_, scale=0.125,
                                      causal=True) ** 2)

    gf = jax.grad(loss, argnums=(0, 1, 2))(qs, ks, vs)
    gr = jax.grad(lambda *a: jnp.sum(mha_reference(
        *a, (), scale=0.125, causal=True) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=1e-3)


def test_kv_broadcast_bias():
    """A per-query additive bias with key dim 1 — (b, h, n, 1) — must
    BROADCAST across keys in the kernel (regression: zero-padding it
    applied the bias to key column 0 only)."""
    rng = np.random.default_rng(16)
    q, k, v = (_rand(rng, 2, 200, 2, 64) * 0.3 for _ in range(3))
    bias = _rand(rng, 2, 2, 200, 1)
    _check(q, k, v, [bias], scale=0.125, atol=1e-4)


def test_causal_more_queries_than_keys_no_nan():
    """causal with n > m: early queries see ZERO keys — the dispatch
    falls back to the reference (the kernel's block skip would emit
    0/0 NaN rows) and both paths give the uniform-average rows."""
    rng = np.random.default_rng(17)
    q = _rand(rng, 1, 384, 2, 64)
    k = _rand(rng, 1, 128, 2, 64)
    v = _rand(rng, 1, 128, 2, 64)
    got = attention_core(q, k, v, scale=0.125, causal=True)
    assert bool(jnp.isfinite(got).all())
    want = mha_reference(q, k, v, (), scale=0.125, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def _grad_check(b, n, m, h, d, causal, biases, scale, atol=5e-4):
    """Pallas backward (dq/dkv/dbias kernels) vs the reference VJP,
    including the bias cotangents."""
    rng = np.random.default_rng(99)
    q, k, v = (_rand(rng, b, nn, h, d) * 0.3 for nn in (n, m, m))

    def loss(fn):
        def f(q_, k_, v_, bs):
            return jnp.sum(fn(q_, k_, v_, list(bs), scale=scale,
                              causal=causal) ** 2)
        return f

    gf = jax.grad(loss(attention_core), argnums=(0, 1, 2, 3))(
        q, k, v, tuple(biases))
    use_flash_attention("auto")
    try:
        gr = jax.grad(loss(mha_reference), argnums=(0, 1, 2, 3))(
            q, k, v, tuple(biases))
    finally:
        use_flash_attention(True)
    for a, b_ in zip(gf[:3] + tuple(gf[3]), gr[:3] + tuple(gr[3])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=atol, rtol=1e-3)


def test_pallas_backward_t5_bias_pattern():
    """T5: trainable rel-pos (1,h,n,m) + padding mask (b,1,1,m).  The
    dbias kernel reduces over batch for the rel-pos and over (h, n) for
    the mask — both must match the reference VJP's bias cotangents."""
    rng = np.random.default_rng(20)
    b, n, m, h, d = 2, 200, 200, 4, 64
    relpos = _rand(rng, 1, h, n, m) * 0.5
    pad = jnp.where(jnp.asarray(rng.random((b, 1, 1, m))) < 0.2,
                    NEG_INF, 0.0).astype(jnp.float32)
    _grad_check(b, n, m, h, d, False, [relpos, pad], 1.0)


def test_pallas_backward_decoder_mask_pattern():
    """Decoder-only towers: one combined (b,1,n,m) additive mask."""
    rng = np.random.default_rng(21)
    b, n, m, h, d = 2, 200, 200, 4, 64
    full = jnp.where(jnp.asarray(rng.random((b, 1, n, m))) < 0.15,
                     NEG_INF, 0.0).astype(jnp.float32)
    _grad_check(b, n, m, h, d, False, [full], d ** -0.5)


def test_pallas_backward_cross_attention_pad():
    """Q-Former cross-attention: (b,1,1,m) pad bias, n != m."""
    rng = np.random.default_rng(22)
    pad = jnp.where(jnp.asarray(rng.random((2, 1, 1, 197))) < 0.2,
                    NEG_INF, 0.0).astype(jnp.float32)
    _grad_check(2, 32, 197, 4, 64, False, [pad], 64 ** -0.5)


def test_pallas_backward_causal_full_bias():
    """Full (b,h,n,m) real-valued bias under causal masking — every
    dbias grid dim kept (no reduction; blocks visited once)."""
    rng = np.random.default_rng(23)
    b, n, m, h, d = 2, 140, 140, 2, 64
    bias = _rand(rng, b, h, n, m) * 0.3
    _grad_check(b, n, m, h, d, True, [bias], d ** -0.5)


def test_flash_attention_sharded_biased_dbias():
    """Sharded T5 pattern: batch on "data", heads on "model"; the
    rel-pos bias replicates over batch, so its cotangent needs a psum
    across the data axis inside the custom_partitioning lower_fn —
    this pins that reduction against the unsharded reference."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh (tests/conftest.py)")
    mesh = Mesh(np.array(devs).reshape(4, 2), ("data", "model"))
    rng = np.random.default_rng(24)
    b, n, h, d = 4, 256, 2, 64
    q, k, v = (jnp.asarray(rng.standard_normal((b, n, h, d)),
                           jnp.float32) * 0.3 for _ in range(3))
    relpos = jnp.asarray(rng.standard_normal((1, h, n, n)),
                         jnp.float32) * 0.5
    pad = jnp.where(jnp.asarray(rng.random((b, 1, 1, n))) < 0.2,
                    NEG_INF, 0.0).astype(jnp.float32)
    xsh = NamedSharding(mesh, P("data", None, "model", None))
    qs, ks, vs = (jax.device_put(x, xsh) for x in (q, k, v))
    rs = jax.device_put(relpos, NamedSharding(
        mesh, P(None, "model", None, None)))
    ps = jax.device_put(pad, NamedSharding(
        mesh, P("data", None, None, None)))

    @jax.jit
    def loss(q_, k_, v_, r_, p_):
        return jnp.sum(attention_core(q_, k_, v_, [r_, p_],
                                      scale=1.0) ** 2)

    gf = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(qs, ks, vs, rs, ps)
    use_flash_attention("auto")
    try:
        gr = jax.grad(lambda *a: jnp.sum(mha_reference(
            a[0], a[1], a[2], [a[3], a[4]], 1.0) ** 2),
            argnums=(0, 1, 2, 3, 4))(q, k, v, relpos, pad)
    finally:
        use_flash_attention(True)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=1e-3)


@pytest.mark.slow  # kernel grads fast-covered by the direct pallas_backward_* tests
def test_t5_tower_grads_through_pallas_backward():
    """End-to-end: tiny T5 loss grads (incl. the rel-pos bias EMBEDDING
    parameter, reached through the dbias kernel) identical between
    forced-kernel and reference paths."""
    from vlm_compression_tpu.models.t5 import (T5Config,
                                               T5ForConditionalGeneration)

    cfg = T5Config(d_model=64, d_ff=128, num_layers=2,
                   num_decoder_layers=2, num_heads=2, vocab_size=128,
                   dtype=jnp.float32, param_dtype=jnp.float32)
    model = T5ForConditionalGeneration(cfg)
    rng = np.random.default_rng(25)
    ids = jnp.asarray(rng.integers(2, 128, (2, 200)))
    amask = jnp.asarray(rng.random((2, 200)) < 0.9, jnp.int32)
    labels = jnp.asarray(rng.integers(2, 128, (2, 150)))
    variables = model.init(jax.random.PRNGKey(0), ids, amask,
                           labels=labels, mode="dense")

    def loss(p):
        out = model.apply(p, ids, amask, labels=labels, mode="dense")
        return out["loss"]

    use_flash_attention(False)
    gr = jax.grad(loss)(variables)
    use_flash_attention(True)
    gf = jax.grad(loss)(variables)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(gr))
    for path, a in flat_f:
        b_ = flat_r[path]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-3, rtol=5e-3,
            err_msg=jax.tree_util.keystr(path))
