"""One-shot on-chip validation + tuning for features landed off-chip.

Run on the real TPU after a tunnel outage (each stage prints PASS/FAIL
and continues, so one Mosaic failure doesn't hide the rest):

    python scripts/chip_validation.py [--skip-autotune]

Stages:
  1. flash fwd Mosaic compile + parity vs XLA reference (ViT/T5/causal
     shape classes, incl. the 1-D lse store the interpreter can't vet)
  2. flash bwd (dq/dkv kernels) parity
  3. attn: autotune family (writes ~/.cache/vct/autotune.json)
  4. speculative decode sanity at base scale (tokens match greedy)
  5. int8 KV cache decode sanity
"""

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

# the image's sitecustomize pins the axon backend; honor an explicit CPU
# request (smoke-testing this script off-chip) the way tests/conftest does
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.sum(jnp.asarray(x).ravel()[:8].astype(jnp.float32)))


def stage(name):
    def deco(fn):
        def run(results):
            t0 = time.perf_counter()
            try:
                fn()
                results[name] = "PASS"
            except Exception:
                traceback.print_exc()
                results[name] = "FAIL"
            print(f"[{results[name]}] {name} ({time.perf_counter()-t0:.1f}s)",
                  flush=True)
        return run
    return deco


@stage("flash_forward_parity")
def s1():
    from vlm_compression_tpu.ops.attention import (
        NEG_INF, attention_core, mha_reference, use_flash_attention)

    rng = np.random.default_rng(0)
    cases = [
        dict(b=4, n=257, m=257, h=16, d=88, causal=False, bias=False),
        dict(b=2, n=200, m=200, h=4, d=64, causal=False, bias=True),
        dict(b=2, n=320, m=320, h=2, d=128, causal=True, bias=False),
        dict(b=1, n=130, m=250, h=2, d=64, causal=True, bias=False),
    ]
    use_flash_attention(True)
    try:
        for c in cases:
            q, k, v = (jnp.asarray(rng.standard_normal(
                (c["b"], c[a], c["h"], c["d"])), jnp.bfloat16) * 0.3
                for a in ("n", "m", "m"))
            biases = []
            if c["bias"]:
                biases = [jnp.where(
                    jnp.asarray(rng.random((c["b"], 1, 1, c["m"]))) < 0.2,
                    NEG_INF, 0.0).astype(jnp.float32)]
            got = attention_core(q, k, v, biases, scale=c["d"] ** -0.5,
                                 causal=c["causal"])
            want = mha_reference(q, k, v, biases, scale=c["d"] ** -0.5,
                                 causal=c["causal"])
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                        - want.astype(jnp.float32))))
            print(f"  {c}: max|Δ|={err:.4f}")
            assert err < 3e-2, (c, err)
    finally:
        use_flash_attention("auto")


@stage("flash_backward_parity")
def s2():
    from vlm_compression_tpu.ops.attention import (
        attention_core, mha_reference, use_flash_attention)

    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(rng.standard_normal((2, 200, 2, 88)),
                           jnp.float32) * 0.3 for _ in range(3))
    use_flash_attention(True)
    try:
        gf = jax.grad(lambda *a: jnp.sum(attention_core(
            *a, scale=0.11, causal=True) ** 2), argnums=(0, 1, 2))(q, k, v)
    finally:
        use_flash_attention("auto")
    gr = jax.grad(lambda *a: jnp.sum(mha_reference(
        *a, (), scale=0.11, causal=True) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        err = float(jnp.max(jnp.abs(a - b)))
        print(f"  grad max|Δ|={err:.5f}")
        # fp32 inputs, but TPU dots run bf16 multiply passes by default —
        # both paths carry ~1e-4 relative noise on O(10) grads (measured
        # 5.3e-3 abs on a v5e)
        assert err < 1e-2


@stage("autotune_attention")
def s3():
    from vlm_compression_tpu.ops.autotune import autotune_attention

    autotune_attention(verbose=True)


@stage("speculative_decode")
def s4():
    from vlm_compression_tpu.models.generation import (
        GenerationConfig, t5_generate, t5_speculative_generate)
    from vlm_compression_tpu.models.t5 import (
        T5Config, T5ForConditionalGeneration)

    # Exactness (spec == greedy) holds when the target's chunked-verify
    # argmax equals its incremental argmax.  A random-init model has
    # top-2 logit gaps down to ~0.02, and TPU matmuls default to
    # bf16-precision passes even for fp32 inputs (noise ~0.02 between
    # the chunked and cached-incremental paths) — measured on a v5e:
    # the same near-tie flips BOTH ways.  Full-precision dots shrink
    # the noise to ~1e-6 so the token-for-token assertion is meaningful;
    # real checkpoints have far wider margins.
    import jax as _jax
    _jax.config.update("jax_default_matmul_precision", "highest")
    cfg = T5Config(d_model=512, d_ff=1024, num_layers=4,
                   num_decoder_layers=4, num_heads=8, vocab_size=1024,
                   dtype=jnp.float32)
    model = T5ForConditionalGeneration(cfg)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)))
    amask = jnp.ones((2, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, amask,
                        jnp.zeros((2, 4), jnp.int32))
    gcfg = GenerationConfig(max_length=24, eos_token_id=1, pad_token_id=0)
    try:
        t0 = time.perf_counter()
        seqs, _, stats = t5_speculative_generate(model, params, ids, amask,
                                                 cfg=gcfg, gamma=4)
        _sync(seqs)
        t_spec = time.perf_counter() - t0
        want = t5_generate(model, params, ids, amask, cfg=gcfg,
                           mode="dense")
        assert np.array_equal(np.asarray(seqs), np.asarray(want))
    finally:
        _jax.config.update("jax_default_matmul_precision", None)
    print(f"  rounds={int(stats['rounds'])} committed="
          f"{int(stats['committed'])} wall={t_spec:.1f}s (cold)")


@stage("int8_kv_cache")
def s5():
    from vlm_compression_tpu.models.generation import (
        GenerationConfig, t5_generate)
    from vlm_compression_tpu.models.t5 import (
        T5Config, T5ForConditionalGeneration)

    cfg = T5Config(d_model=512, d_ff=1024, num_layers=4,
                   num_decoder_layers=4, num_heads=8, vocab_size=1024,
                   kv_cache_int8=True)
    model = T5ForConditionalGeneration(cfg)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)))
    amask = jnp.ones((2, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, amask,
                        jnp.zeros((2, 4), jnp.int32))
    seqs = t5_generate(model, params, ids, amask,
                       cfg=GenerationConfig(max_length=16))
    assert seqs.shape == (2, 16)
    print(f"  int8-cache decode ok: {np.asarray(seqs)[0, :8].tolist()}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-autotune", action="store_true")
    args = ap.parse_args()
    print("backend:", jax.default_backend(), jax.devices())
    # drain any tunnel backlog before timing anything
    t0 = time.perf_counter()
    _sync(jnp.ones((256, 256)) @ jnp.ones((256, 256)))
    print(f"first-op drain: {time.perf_counter()-t0:.1f}s", flush=True)

    results = {}
    s1(results)
    s2(results)
    if not args.skip_autotune:
        s3(results)
    s4(results)
    s5(results)
    print("\nSummary:", results)
    sys.exit(1 if "FAIL" in results.values() else 0)


if __name__ == "__main__":
    main()
