"""Annealed Hessian-guided soft-mask n:m pruning (ops/softmask.py,
`{t5,vit,blipt5}_softmask_pruner` — beyond-reference, SparseForge
pattern)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlm_compression_tpu.ops.softmask import (
    _obs_error,
    hard_topn,
    soft_topn,
    softmask_nm_prune,
)


def test_soft_topn_relaxation_properties():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((5, 3, 4)), jnp.float32)
    soft = soft_topn(logits, 2, jnp.asarray(1.0))
    s = np.asarray(soft)
    assert s.min() >= 0.0 and s.max() <= 1.0 + 0.2   # warm-τ spill only
    np.testing.assert_allclose(s.sum(-1), 2.0, rtol=1e-5)
    # τ → 0 converges to the exact hard top-2
    cold = np.asarray(soft_topn(logits, 2, jnp.asarray(1e-4)))
    hard = np.asarray(hard_topn(logits, 2))
    np.testing.assert_allclose(cold, hard.astype(np.float32), atol=1e-3)


def test_soft_topn_is_differentiable():
    logits = jnp.asarray([[0.3, -0.1, 0.8, 0.2]], jnp.float32)

    def f(lg):
        return jnp.sum(soft_topn(lg, 2, jnp.asarray(0.7)) ** 2)

    g = jax.grad(f)(logits)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.asarray(g) != 0)


def _correlated_problem(seed, units=8, n_in=32, samples=64):
    """Hessian from correlated inputs — where one-shot saliency misses
    interactions and mask training can win."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((samples, n_in // 4))
    x = np.repeat(base, 4, axis=1) + 0.3 * rng.standard_normal(
        (samples, n_in))
    h = (2.0 / samples) * (x.T @ x)
    w = rng.standard_normal((units, n_in))
    return (jnp.asarray(w, jnp.float32), jnp.asarray(h, jnp.float32))


def test_softmask_nm_prune_structure_and_no_regression():
    w, h = _correlated_problem(1)
    keep, err_t, err_i = softmask_nm_prune(w, h, 2, 4, steps=32)
    km = np.asarray(keep).reshape(w.shape[0], -1, 4)
    assert (km.sum(-1) == 2).all()            # exact 2-of-4 kept
    # returned mask's true error is min(trained, init) by construction
    realized = float(_obs_error(w, h, jnp.asarray(keep, jnp.float32)))
    assert realized <= float(err_i) + 1e-4


def test_softmask_beats_oneshot_on_correlated_inputs():
    """On correlated calibration inputs the annealed mask must strictly
    improve the OBS reconstruction error vs its one-shot init."""
    wins = 0
    for seed in range(3):
        w, h = _correlated_problem(seed + 10)
        _, err_t, err_i = softmask_nm_prune(w, h, 2, 4, steps=64)
        if float(err_t) < float(err_i) * 0.999:
            wins += 1
    assert wins >= 2, f"trained mask only improved on {wins}/3 seeds"


@pytest.mark.slow
def test_t5_softmask_pruner_end_to_end():
    from vlm_compression_tpu.compression import load_pruner
    from vlm_compression_tpu.compression.pruners import FlaxModel
    from vlm_compression_tpu.models.t5 import (
        T5Config,
        T5ForConditionalGeneration,
        shift_right,
    )

    rng = jax.random.PRNGKey(5)
    cfg = T5Config.tiny(param_dtype="float32", dtype="float32")
    module = T5ForConditionalGeneration(cfg)
    ids = jax.random.randint(rng, (4, 6), 1, cfg.vocab_size)
    mask = jnp.ones((4, 6), jnp.int32)
    labels = jax.random.randint(rng, (4, 5), 1, cfg.vocab_size)
    variables = module.init(rng, ids, mask, shift_right(labels))
    batches = [{"input_ids": ids, "attention_mask": mask, "labels": labels}]

    pruner = load_pruner("t5_softmask_pruner", FlaxModel(module, variables),
                         batches, prune_spec="2-0.5-1.0-1.0", num_samples=4,
                         prune_n=2, prune_m=4, softmask_steps=8)
    model, _ = pruner.prune(lora_model=True)
    m = model.variables["masks"]["encoder"]["blocks_0"]["ffn"]["wi_0"]["mask"]
    km = np.asarray(m).T.reshape(m.shape[1], -1, 4)
    assert (km.sum(-1) == 2).all()
