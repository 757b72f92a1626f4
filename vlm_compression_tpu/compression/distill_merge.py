"""Layer distillation-by-merging + importance-guided unstructured pruning.

Reconstruction of the reference's WoodFisher/distillation experiment
surface (``evaluate.py``).  That script calls
``vit_modify_with_weight_init`` / ``t5_modify_with_weight_init`` /
``qformer_pruning`` — none of which exist anywhere in the snapshot — so
this module implements the operations its flag surface describes:

  * ``--distilled_block_ids "0,1;2,3;..."`` — merge groups of transformer
    blocks into one block each (``--distillation_init`` sum/mean, optional
    ``--distilled_block_weights``), producing a shallower tower;
  * ``--permute_before_merge`` / ``--permute_on_block_before_merge`` —
    align later blocks' hidden units to the group's first block before
    merging (linear assignment on weight-column similarity);
  * ``--modules_to_merge`` — regex gate on which param leaves merge
    (others keep the first block's values);
  * ``"unstrct_*"`` distillation inits — unstructured zeroing of the
    lowest-importance weights at ``--distill_merge_ratio`` using
    derivative / activation / WoodFisher importance scores.

All tree surgery is host-side numpy on param pytrees (one-time model
transformation, not device work).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# block-id parsing
# --------------------------------------------------------------------------

def parse_block_ids(spec: str) -> List[List[int]]:
    """'0,1;2,3;4' → [[0,1],[2,3],[4]].  Also accepts '0-3;4-7' ranges."""
    groups = []
    for part in spec.split(";"):
        part = part.strip()
        if not part:
            continue
        ids: List[int] = []
        for tok in part.split(","):
            tok = tok.strip()
            if "-" in tok:
                a, b = tok.split("-")
                ids.extend(range(int(a), int(b) + 1))
            else:
                ids.append(int(tok))
        groups.append(ids)
    return groups


def parse_block_weights(spec: Optional[str], groups: List[List[int]]
                        ) -> List[List[float]]:
    """Per-group merge weights; defaults to uniform."""
    if not spec:
        return [[1.0 / len(g)] * len(g) for g in groups]
    out = []
    for part, g in zip(spec.split(";"), groups):
        ws = [float(t) for t in part.split(",")]
        if len(ws) != len(g):
            raise ValueError(f"weights {ws} do not match group {g}")
        out.append(ws)
    return out


# --------------------------------------------------------------------------
# permutation alignment
# --------------------------------------------------------------------------

def _assign(cost: np.ndarray) -> np.ndarray:
    """Min-cost assignment (rows→cols)."""
    from scipy.optimize import linear_sum_assignment

    _, cols = linear_sum_assignment(cost)
    return cols


def _ffn_permutation(ref: Dict, other: Dict, up_key: str, down_key: str
                     ) -> Optional[np.ndarray]:
    """Permutation of the FFN hidden dim aligning `other` to `ref`.

    Kernels are Flax (in, out): the hidden dim is axis 1 of the up
    projection and axis 0 of the down projection.  Similarity is cosine
    over the concatenated per-unit weight vectors.
    """
    try:
        ru = np.asarray(ref[up_key]["kernel"], np.float32)
        rd = np.asarray(ref[down_key]["kernel"], np.float32)
        ou = np.asarray(other[up_key]["kernel"], np.float32)
        od = np.asarray(other[down_key]["kernel"], np.float32)
    except KeyError:
        return None
    rvec = np.concatenate([ru.T, rd], axis=1)        # (hidden, in+out)
    ovec = np.concatenate([ou.T, od], axis=1)
    rn = rvec / (np.linalg.norm(rvec, axis=1, keepdims=True) + 1e-8)
    on = ovec / (np.linalg.norm(ovec, axis=1, keepdims=True) + 1e-8)
    return _assign(-(rn @ on.T))                     # maximize similarity


def _apply_ffn_permutation(block: Dict, perm: np.ndarray, up_keys: Sequence[str],
                           down_key: str) -> Dict:
    block = jax.tree_util.tree_map(lambda x: x, block)  # shallow-ish copy
    for uk in up_keys:
        if uk in block:
            lin = dict(block[uk])
            lin["kernel"] = np.asarray(lin["kernel"])[:, perm]
            if "bias" in lin:
                lin["bias"] = np.asarray(lin["bias"])[perm]
            if "mask" in lin:
                lin["mask"] = np.asarray(lin["mask"])[:, perm]
            block[uk] = lin
    if down_key in block:
        lin = dict(block[down_key])
        lin["kernel"] = np.asarray(lin["kernel"])[perm, :]
        if "mask" in lin:
            lin["mask"] = np.asarray(lin["mask"])[perm, :]
        block[down_key] = lin
    return block


_FFN_LAYOUTS = (
    # (container path in block, up keys, down key)
    (("mlp",), ("fc1",), "fc2"),                # EVA ViT
    (("ffn",), ("wi_0", "wi_1"), "wo"),         # T5 gated
    (("mlp",), ("gate", "up"), "down"),         # LLaMA
)


def permute_block_like(ref_block: Dict, block: Dict) -> Dict:
    """Align `block`'s FFN hidden units to `ref_block` (identity when the
    layout is not recognized)."""
    for path, up_keys, down_key in _FFN_LAYOUTS:
        node_r, node_o = ref_block, block
        ok = True
        for k in path:
            if not (isinstance(node_r, dict) and k in node_r and k in node_o):
                ok = False
                break
            node_r, node_o = node_r[k], node_o[k]
        if not ok:
            continue
        perm = _ffn_permutation(node_r, node_o, up_keys[0], down_key)
        if perm is None:
            continue
        new_inner = _apply_ffn_permutation(node_o, perm, up_keys, down_key)
        out = dict(block)
        node = out
        for k in path[:-1]:
            node[k] = dict(node[k])
            node = node[k]
        node[path[-1]] = new_inner
        return out
    return block


# --------------------------------------------------------------------------
# merging
# --------------------------------------------------------------------------

def merge_tower_blocks(tower_params: Dict, block_ids: List[List[int]],
                       block_weights: Optional[List[List[float]]] = None,
                       modules_to_merge: str = ".*",
                       permute: bool = False,
                       block_prefix: str = "blocks_") -> Dict:
    """Merge groups of `<block_prefix><i>` subtrees into one block each.

    Returns a new tower param dict with ``len(block_ids)`` blocks numbered
    densely from 0; non-block leaves pass through.  Leaves whose dotted
    name does not match ``modules_to_merge`` take the group's FIRST
    block's value (the reference gates merging per module type).
    """
    pat = re.compile(modules_to_merge)
    weights = block_weights or [[1.0 / len(g)] * len(g) for g in block_ids]
    out = {k: v for k, v in tower_params.items()
           if not k.startswith(block_prefix)}

    for new_i, (group, ws) in enumerate(zip(block_ids, weights)):
        blocks = [tower_params[f"{block_prefix}{i}"] for i in group]
        if permute and len(blocks) > 1:
            blocks = [blocks[0]] + [permute_block_like(blocks[0], b)
                                    for b in blocks[1:]]

        def merge_leaf(path, *leaves):
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            if not pat.search(name):
                return leaves[0]
            if leaves[0].dtype == bool:  # masks: keep where any keeps
                acc = leaves[0]
                for l in leaves[1:]:
                    acc = np.logical_or(acc, l)
                return acc
            acc = sum(w * np.asarray(l, np.float32)
                      for w, l in zip(ws, leaves))
            return np.asarray(acc, np.asarray(leaves[0]).dtype)

        out[f"{block_prefix}{new_i}"] = jax.tree_util.tree_map_with_path(
            merge_leaf, blocks[0], *blocks[1:])
    return out


# --------------------------------------------------------------------------
# unstructured importance pruning (the "unstrct_*" distillation inits)
# --------------------------------------------------------------------------

def prune_by_importance(params: Dict, scores: Dict[Tuple[str, ...], jnp.ndarray],
                        keep_ratio: float) -> Tuple[Dict, Dict]:
    """Zero the lowest-importance weights leaf-by-leaf; returns
    (new_params, pruned_indices {path: flat int32 indices})."""
    params = jax.tree_util.tree_map(lambda x: x, params)
    pruned_indices = {}
    for path, imp in scores.items():
        node = params
        for k in path[:-1]:
            node = node[k]
        leaf = np.asarray(node[path[-1]])
        flat_imp = np.asarray(imp, np.float32).reshape(-1)
        k_prune = int(round(flat_imp.size * (1.0 - keep_ratio)))
        if k_prune <= 0:
            continue
        idx = np.argpartition(flat_imp, k_prune - 1)[:k_prune]
        flat = leaf.reshape(-1).copy()
        flat[idx] = 0
        node[path[-1]] = flat.reshape(leaf.shape)
        pruned_indices[path] = np.sort(idx).astype(np.int32)
    return params, pruned_indices


def count_params(tree) -> int:
    return int(sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(tree)))


def count_nonzero(tree) -> int:
    return int(sum(int(jnp.count_nonzero(l))
                   for l in jax.tree_util.tree_leaves(tree)
                   if jnp.issubdtype(l.dtype, jnp.floating)))
