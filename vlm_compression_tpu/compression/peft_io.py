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
    ``distilled_total_size`` = parameters that survive pruning.

    Survivor counting per kernel, mirroring the reference's
    ``(param != 0).sum()`` over non-lora params:

    * bool mask present → mask keep-count (exact under SparseLoRA, where
      pruned base weights are masked rather than stored as zeros);
    * bit-packed (uint32) mask present → unpacked on DEVICE and summed;
    * no mask (the ``lora_model=False`` prune path physically zeroes
      weights and skips masks, calibrate.py:302-313; likewise
      ``--strip_lora_masks`` checkpoint evals) → device count_nonzero;
    * int4 kernels (``kernel_q4``, nibble-packed) count their unpacked
      numel / nonzero nibbles; ``kernel_scale`` siblings are auxiliary
      and excluded (the reference counts the original model's params).

    All reductions run on device; one scalar fetch per kernel."""
    import jax.numpy as jnp

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

    def kernel_rows(leaf, name):
        if name == "kernel_q4":
            return 2 * leaf.shape[0]
        return leaf.shape[0]

    def survivors(leaf, name, mask):
        from vlm_compression_tpu.ops.bitmask import is_packed, unpack_mask
        from vlm_compression_tpu.ops.masked_linear import infer_pack_group

        rows = kernel_rows(leaf, name)
        if mask is not None and is_packed(mask):
            mask = unpack_mask(mask, rows,
                               infer_pack_group(rows, mask.shape[0]))
        if mask is not None and str(mask.dtype) == "bool" \
                and mask.shape[0] == rows:
            return int(jnp.sum(mask))
        if name == "kernel_q4":
            from vlm_compression_tpu.ops.quant import unpack_int4

            return int(jnp.count_nonzero(unpack_int4(leaf)))
        if str(leaf.dtype).startswith(("float", "bfloat", "int8")):
            return int(jnp.count_nonzero(leaf))
        return int(np.prod(leaf.shape)) if leaf.shape else 1

    def walk(tree, path):
        nonlocal orig, distilled
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + (k,))
            return
        name = path[-1] if path else ""
        if name == "kernel_scale":
            return                       # quantization metadata, not params
        shape = getattr(tree, "shape", None)
        n = int(np.prod(shape)) if shape else 1
        if name == "kernel_q4":
            n *= 2                       # two weights per packed byte
        orig += n
        if name in ("kernel", "kernel_q4") and getattr(tree, "ndim", 0) == 2:
            mask = flat_masks.get(path[:-1] + ("mask",))
            distilled += survivors(tree, name, mask)
        else:
            distilled += n
    walk(params, ())
    return {"orig_total_size": orig, "distilled_total_size": distilled}
