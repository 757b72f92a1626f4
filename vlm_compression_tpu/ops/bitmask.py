"""Bit-packed keep-masks.

The reference stores masks as full-size bool buffers next to every pruned
linear (lavis/peft/src/peft/tuners/lora.py:317) — on InstructBLIP-XL that
is ~3.4 GB of HBM (one byte per weight) and, during the masked forward,
50% extra HBM traffic on top of the bf16 weights.  This layout stores
2 bits per weight (16 mask rows per uint32 word — see the alignment note
below), cutting both by 4×: a packed mask adds ~12.5% to the bf16 weight
bytes instead of 50%.

Layout — tile-friendly interleave.  A keep-mask for a Flax kernel
``(in, out)`` packs along the CONTRACTION axis (rows), 128-row group at a
time: within group ``g`` (mask rows ``128g .. 128g+127``), mask row
``128g + r`` lives in packed row ``8g + (r % 8)`` at bit ``r // 8``.
Sixteen of the 32 bits per word are used — Mosaic requires sublane block
dims divisible by 8, so 8 words per 128-row group is the densest layout
the kernel can address without misaligned loads: 2 bits/weight, a 4×
shrink vs 8-bit bool.  The Pallas consumer expands a packed tile in
VMEM with ``pltpu.repeat`` (which TILES: output row r = input row
r % nrows) followed by a ``iota // 8`` shift — no gathers, pure VPU ops.
Rows pad up to a multiple of 128.

Pure-XLA pack/unpack here; the fused Pallas consumer lives in
ops/masked_linear.py.
"""

from __future__ import annotations

import jax.numpy as jnp

GROUP = 128        # mask rows per packed group (kernel contraction block)
WPG = 8            # packed words per group (sublane-aligned)
BITS = GROUP // WPG  # bits used per word (16)


def packed_rows(n_rows: int) -> int:
    return WPG * ((n_rows + GROUP - 1) // GROUP)


def pack_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """(in, out) bool → (8·ceil(in/128), out) uint32, interleaved layout:
    mask row 128g+r ↔ packed[8g + r%8], bit r//8."""
    n, m = mask.shape
    pad = (-n) % GROUP
    b = jnp.pad(mask.astype(jnp.uint32), ((0, pad), (0, 0)))
    g = b.shape[0] // GROUP
    # row r = bit·WPG + word  →  (g, BITS, WPG, m): axis1 = bit, axis2 = word
    b = b.reshape(g, BITS, WPG, m)
    shifts = jnp.arange(BITS, dtype=jnp.uint32)[None, :, None, None]
    return jnp.sum(b << shifts, axis=1).reshape(g * WPG, m).astype(jnp.uint32)


def unpack_mask(packed: jnp.ndarray, n_rows: int) -> jnp.ndarray:
    """(8·ceil(n/128), out) uint32 → (n_rows, out) bool."""
    p, m = packed.shape
    g = p // WPG
    words = packed.reshape(g, 1, WPG, m)
    shifts = jnp.arange(BITS, dtype=jnp.uint32)[None, :, None, None]
    bits = (words >> shifts) & jnp.uint32(1)
    return bits.reshape(g * GROUP, m)[:n_rows].astype(bool)


def is_packed(mask: jnp.ndarray) -> bool:
    """Packed masks are uint32; bool masks are the unpacked original."""
    return mask.dtype == jnp.uint32


def pack_masks_tree(masks: dict) -> dict:
    """Pack every {'mask': bool(in,out)} leaf of a masks collection.

    Post-prune opt-in: pruners keep writing bool masks (golden-mask parity
    stays byte-exact); call this once before long retraining/serving runs
    to reclaim the HBM.  ``mask_rows`` records the unpadded row count for
    ``unpack_masks_tree`` (SparseLinear itself knows in_features).
    """
    if isinstance(masks, dict):
        if "mask" in masks and getattr(masks["mask"], "ndim", 0) == 2 \
                and masks["mask"].dtype == jnp.bool_:
            return {"mask": pack_mask(masks["mask"]),
                    "mask_rows": jnp.int32(masks["mask"].shape[0])}
        return {k: pack_masks_tree(v) for k, v in masks.items()}
    return masks


def unpack_masks_tree(masks: dict) -> dict:
    """Inverse of pack_masks_tree."""
    if isinstance(masks, dict):
        if "mask" in masks and is_packed(masks["mask"]):
            n = int(masks["mask_rows"])
            return {"mask": unpack_mask(masks["mask"], n)}
        return {k: unpack_masks_tree(v) for k, v in masks.items()}
    return masks
