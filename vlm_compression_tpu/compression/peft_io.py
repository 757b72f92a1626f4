"""SparseLoRA adapter state IO.

Counterpart of the vendored PEFT's ``save_pretrained/from_pretrained`` +
``get_peft_model_state_dict`` (lavis/peft/src/peft/utils/save_and_load.py,
peft_model.py:269): extract ONLY the adapter-relevant leaves — ``lora``
factors and ``masks`` — so a RESSA checkpoint ships megabytes, not the
frozen towers; re-attach onto a freshly built model's variables.

``print_trainable_parameters`` mirrors the reference's accounting
(peft_model.py:269): trainable = lora leaves, total = params + lora.
"""

from __future__ import annotations

import logging
import os
from typing import Dict

import jax
import numpy as np


def adapter_state(variables: dict) -> Dict:
    """{collection: tree} restricted to lora + masks."""
    return {k: variables[k] for k in ("lora", "masks") if k in variables}


def attach_adapter_state(variables: dict, adapter: Dict) -> dict:
    out = dict(variables)
    out.update({k: adapter[k] for k in ("lora", "masks") if k in adapter})
    return out


def save_adapter(variables: dict, path: str) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ck = ocp.StandardCheckpointer()
    ck.save(path, adapter_state(variables), force=True)
    ck.wait_until_finished()
    return path


def load_adapter(path: str, template: Dict = None) -> Dict:
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer().restore(os.path.abspath(path),
                                              template)


def count_parameters(variables: dict) -> Dict[str, int]:
    def n(tree):
        return int(sum(np.prod(x.shape) for x in
                       jax.tree_util.tree_leaves(tree)))

    total = n(variables.get("params", {}))
    trainable = n(variables.get("lora", {}))
    return {"trainable": trainable, "total": total + trainable}


def print_trainable_parameters(variables: dict) -> str:
    c = count_parameters(variables)
    pct = 100.0 * c["trainable"] / max(c["total"], 1)
    msg = (f"trainable params: {c['trainable']:,} || "
           f"all params: {c['total']:,} || trainable%: {pct:.4f}")
    logging.info(msg)
    return msg


def remaining_parameter_fraction(variables: dict) -> float:
    """Fraction of non-pruned weights (reference train.py:578-583 prints
    'proportion of remaining parameters')."""
    masks = variables.get("masks", {})
    kept = total = 0
    for leaf in jax.tree_util.tree_leaves(masks):
        if getattr(leaf, "dtype", None) == np.bool_ or \
                str(getattr(leaf, "dtype", "")) == "bool":
            kept += int(np.sum(np.asarray(leaf)))
            total += leaf.size
    if total == 0:
        return 1.0
    return kept / total


def model_size_accounting(variables: dict) -> Dict[str, int]:
    """The reference's model-size report (train.py:365-406,
    evaluate_new.py:221-289): ``orig_total_size`` = every base parameter
    (LoRA excluded, matching the pre-``get_peft_model`` count) and
    ``distilled_total_size`` = parameters that survive pruning — masked
    kernels contribute their keep-count, everything else its numel.

    Counts come from mask shapes, not a device sweep for zeros, so this
    is exact under SparseLoRA (where pruned base weights are *masked*,
    not necessarily stored as zeros) and free of device transfers for
    all but the masks."""
    params = variables.get("params", {})
    masks = variables.get("masks", {})

    flat_masks = {}

    def walk_masks(tree, path):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk_masks(v, path + (k,))
        else:
            flat_masks[path] = tree

    walk_masks(masks, ())

    orig = distilled = 0

    def walk(tree, path):
        nonlocal orig, distilled
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + (k,))
            return
        n = int(np.prod(tree.shape)) if getattr(tree, "shape", None) else 1
        orig += n
        # the masks collection mirrors the params tree with 'mask' in
        # place of 'kernel'
        mask = flat_masks.get(path[:-1] + ("mask",)) \
            if path and path[-1] == "kernel" else None
        if mask is not None and getattr(mask, "dtype", None) is not None \
                and str(mask.dtype) == "bool" and mask.shape == tree.shape:
            distilled += int(np.sum(np.asarray(mask)))
        else:
            distilled += n
    walk(params, ())
    return {"orig_total_size": orig, "distilled_total_size": distilled}
