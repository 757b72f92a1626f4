"""WoodFisher importance: blockwise empirical Fisher inverse.

TPU-native reconstruction of the reference's WoodFisher experiment
(``evaluate.py:258-276``).  The reference instantiates
``WoodFisher(model, loader, num_samples, fisher_damp=1e-3, fisher_parts=5,
fisher_optimized=False, ignore_keys=[])`` and calls
``compute_fisher_inv_and_importance_score()`` — but the class itself is
defined NOWHERE in the snapshot (the script cannot run upstream).  This
module implements the published WoodFisher estimator (Singh & Alistarh,
2020) that call signature describes:

  * empirical Fisher  F = damp·I + (1/N) Σₙ gₙgₙᵀ  over per-sample
    gradients, in independent diagonal blocks ("parts") of each parameter;
  * F⁻¹ maintained directly through the Sherman–Morrison recursion
      F⁻¹ ← F⁻¹ − (F⁻¹gₙ)(F⁻¹gₙ)ᵀ / (N + gₙᵀF⁻¹gₙ),
    seeded with F⁻¹ = I/damp — a `lax.scan` over samples carrying the
    (parts, C, C) block inverses, all MXU matmuls;
  * OBD importance  w² / (2·diag(F⁻¹))  per weight.

Block sizes: each leaf is flattened and split into ``fisher_parts`` chunks,
capped at ``max_chunk`` columns so the carried block inverses stay
tractable (the estimator is exact per block regardless of the split).
Per-sample gradients are collected with one jitted full-tree backward per
sample; XL-scale towers need per-tower filtering via ``include``.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("num_samples",))
def _sm_fold(finv: jnp.ndarray, grads: jnp.ndarray, num_samples: int
             ) -> jnp.ndarray:
    """Fold per-sample chunked gradients into block Fisher inverses.

    finv  : (P, C, C) running block inverses.
    grads : (n, P, C) per-sample gradients for this leaf, chunked.
    """

    def step(finv, g):
        v = jnp.einsum("pij,pj->pi", finv, g,
                       precision=jax.lax.Precision.HIGHEST)
        denom = num_samples + jnp.einsum("pi,pi->p", g, v)
        finv = finv - v[:, :, None] * v[:, None, :] / denom[:, None, None]
        return finv, None

    finv, _ = jax.lax.scan(step, finv, grads)
    return finv


def _chunk(flat: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """(n, numel) → (n, P, C), zero-padded to a whole number of chunks."""
    n, numel = flat.shape
    parts = -(-numel // chunk)
    pad = parts * chunk - numel
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, pad)))
    return flat.reshape(n, parts, chunk)


class WoodFisher:
    """Blockwise Fisher-inverse importance scorer.

    model      : FlaxModel-like (``.module`` + ``.variables``) or a pair.
    batches    : calibration batches (dicts of arrays, leading batch dim).
    num_samples: total samples N in the Fisher average.
    include    : optional predicate on the param path tuple; leaves that
                 fail it are skipped (the reference splits scores by
                 ``visual_encoder``/``t5_model`` prefix after the fact —
                 filtering up front avoids holding grads for both towers).
    """

    def __init__(self, model, batches: Sequence, num_samples: int,
                 fisher_damp: float = 1e-3, fisher_parts: int = 5,
                 fisher_optimized: bool = False,
                 ignore_keys: Sequence[str] = (),
                 include: Optional[Callable[[Tuple[str, ...]], bool]] = None,
                 max_chunk: int = 256,
                 loss_fn: Optional[Callable] = None):
        self.module = model.module
        self.variables = dict(model.variables)
        self.batches = batches
        self.num_samples = int(num_samples)
        self.fisher_damp = float(fisher_damp)
        self.fisher_parts = int(fisher_parts)
        self.fisher_optimized = bool(fisher_optimized)  # parity knob, unused
        self.ignore_keys = tuple(ignore_keys)
        self.include = include
        self.max_chunk = int(max_chunk)
        self.loss_fn = loss_fn or (
            lambda v, b: self.module.apply(v, **b)["loss"])

    # -- helpers ----------------------------------------------------------

    def _keep(self, path: Tuple[str, ...]) -> bool:
        name = "/".join(path)
        if any(k in name for k in self.ignore_keys):
            return False
        return self.include(path) if self.include else True

    def _chunk_size(self, numel: int) -> int:
        return max(1, min(self.max_chunk, -(-numel // self.fisher_parts)))

    def _per_sample_grads(self):
        """Yield flattened-path grad dicts, one per calibration sample."""
        frozen = {k: v for k, v in self.variables.items() if k != "params"}
        params = self.variables["params"]

        @jax.jit
        def gradfn(p, batch):
            return jax.grad(
                lambda q: self.loss_fn({"params": q, **frozen}, batch))(p)

        seen = 0
        for batch in self.batches:
            bs = next(iter(batch.values())).shape[0]
            for i in range(bs):
                if seen >= self.num_samples:
                    return
                sample = {k: v[i:i + 1] for k, v in batch.items()}
                g = gradfn(params, sample)
                flat = {
                    tuple(str(k.key) for k in kp): leaf
                    for kp, leaf in jax.tree_util.tree_leaves_with_path(g)
                }
                yield {p: l for p, l in flat.items() if self._keep(p)}
                seen += 1

    # -- public API (reference call shape, evaluate.py:265-276) -----------

    def compute_fisher_inv_and_importance_score(self) -> Dict:
        """Returns {path: importance array (param shape)}; also stores the
        final block inverses' diagonals in ``self.fisher_inv_diag``."""
        finv: Dict[Tuple[str, ...], jnp.ndarray] = {}
        shapes: Dict[Tuple[str, ...], tuple] = {}

        for g in self._per_sample_grads():
            for path, leaf in g.items():
                numel = int(np.prod(leaf.shape))
                c = self._chunk_size(numel)
                chunked = _chunk(leaf.astype(jnp.float32).reshape(1, -1), c)
                if path not in finv:
                    shapes[path] = leaf.shape
                    parts = chunked.shape[1]
                    finv[path] = jnp.broadcast_to(
                        jnp.eye(c, dtype=jnp.float32) / self.fisher_damp,
                        (parts, c, c)).copy()
                finv[path] = _sm_fold(finv[path], chunked, self.num_samples)

        params = self.variables["params"]
        self.fisher_inv_diag = {}
        scores: Dict[Tuple[str, ...], jnp.ndarray] = {}
        for path, f in finv.items():
            shape = shapes[path]
            numel = int(np.prod(shape))
            diag = jnp.diagonal(f, axis1=1, axis2=2).reshape(-1)[:numel]
            self.fisher_inv_diag[path] = diag.reshape(shape)
            w = _tree_get(params, path).astype(jnp.float32).reshape(-1)
            imp = (w * w) / (2.0 * jnp.maximum(diag, 1e-20))
            scores[path] = imp.reshape(shape)
        return scores


def _tree_get(tree, path: Tuple[str, ...]):
    node = tree
    for k in path:
        node = node[k]
    return node
