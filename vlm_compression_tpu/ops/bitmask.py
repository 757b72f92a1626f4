"""Bit-packed keep-masks.

The reference stores masks as full-size bool buffers next to every pruned
linear (lavis/peft/src/peft/tuners/lora.py:317) — on InstructBLIP-XL that
is ~3.4 GB of HBM (one byte per weight) and, during the masked forward,
50% extra HBM traffic on top of the bf16 weights.  Packed layouts cut
both: GROUP=128 stores 2 bits per weight (4× shrink), GROUP=256 stores
1 bit per weight (8× shrink — ~6.25% extra bytes on the bf16 weight
stream).

Layout — tile-friendly interleave.  A keep-mask for a Flax kernel
``(in, out)`` packs along the CONTRACTION axis (rows), one GROUP-row
group at a time: within group ``g`` (mask rows ``G·g .. G·g+G-1``), mask
row ``G·g + r`` lives in packed row ``8g + (r % 8)`` at bit ``r // 8``.
Mosaic requires sublane block dims divisible by 8, so every group packs
into 8 words; GROUP=128 uses 16 of the 32 bits per word, GROUP=256 uses
all 32.  The Pallas consumer expands a packed tile in VMEM with
``pltpu.repeat`` (which TILES: output row r = input row r % nrows)
followed by an ``iota // 8`` shift — no gathers, pure VPU ops.  Rows pad
up to a multiple of GROUP.

Pure-XLA pack/unpack here; the fused Pallas consumer lives in
ops/masked_linear.py.
"""

from __future__ import annotations

import jax.numpy as jnp

GROUP = 128        # default mask rows per packed group
GROUP_1BIT = 256   # full-word layout: 1 bit per weight
WPG = 8            # packed words per group (sublane-aligned)
BITS = GROUP // WPG  # bits used per word in the default layout (16)


def packed_rows(n_rows: int, group: int = GROUP) -> int:
    return WPG * ((n_rows + group - 1) // group)


def pack_mask(mask: jnp.ndarray, group: int = GROUP) -> jnp.ndarray:
    """(in, out) bool → (8·ceil(in/group), out) uint32, interleaved:
    mask row group·g + r ↔ packed[8g + r%8], bit r//8."""
    bits = group // WPG
    assert bits <= 32, group
    n, m = mask.shape
    pad = (-n) % group
    b = jnp.pad(mask.astype(jnp.uint32), ((0, pad), (0, 0)))
    g = b.shape[0] // group
    # row r = bit·WPG + word  →  (g, bits, WPG, m): axis1 = bit, axis2 = word
    b = b.reshape(g, bits, WPG, m)
    shifts = jnp.arange(bits, dtype=jnp.uint32)[None, :, None, None]
    return jnp.sum(b << shifts, axis=1).reshape(g * WPG, m).astype(jnp.uint32)


def unpack_mask(packed: jnp.ndarray, n_rows: int,
                group: int = GROUP) -> jnp.ndarray:
    """(8·ceil(n/group), out) uint32 → (n_rows, out) bool."""
    bits = group // WPG
    p, m = packed.shape
    g = p // WPG
    words = packed.reshape(g, 1, WPG, m)
    shifts = jnp.arange(bits, dtype=jnp.uint32)[None, :, None, None]
    vals = (words >> shifts) & jnp.uint32(1)
    return vals.reshape(g * group, m)[:n_rows].astype(bool)


def is_packed(mask: jnp.ndarray) -> bool:
    """Packed masks are uint32; bool masks are the unpacked original."""
    return mask.dtype == jnp.uint32


def pack_masks_tree(masks: dict, group: int = GROUP) -> dict:
    """Pack every {'mask': bool(in,out)} leaf of a masks collection.

    Post-prune opt-in: pruners keep writing bool masks (golden-mask parity
    stays byte-exact); call this once before long retraining/serving runs
    to reclaim the HBM.  ``mask_rows``/``mask_group`` record the unpadded
    row count and layout for ``unpack_masks_tree`` and the kernel.
    """
    if isinstance(masks, dict):
        if "mask" in masks and getattr(masks["mask"], "ndim", 0) == 2 \
                and masks["mask"].dtype == jnp.bool_:
            return {"mask": pack_mask(masks["mask"], group),
                    "mask_rows": jnp.int32(masks["mask"].shape[0]),
                    "mask_group": jnp.int32(group)}
        return {k: pack_masks_tree(v, group) for k, v in masks.items()}
    return masks


def unpack_masks_tree(masks: dict) -> dict:
    """Inverse of pack_masks_tree."""
    if isinstance(masks, dict):
        if "mask" in masks and is_packed(masks["mask"]):
            n = int(masks["mask_rows"])
            group = int(masks.get("mask_group", GROUP))
            return {"mask": unpack_mask(masks["mask"], n, group)}
        return {k: unpack_masks_tree(v) for k, v in masks.items()}
    return masks
