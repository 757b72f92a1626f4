"""On-chip autotuner for the fused masked matmul (VERDICT round-1 item 4).

The bool-mask Pallas kernel's win over XLA's fused ``where``+dot depends
on shape and tiling, and tunnel-backend timings are treacherous
(``block_until_ready`` is a no-op — the only reliable barrier is
materializing a device scalar).  So the default dispatch is per-shape
decisions produced by this module:

* ``tune_masked_matmul(m, k, n, dtype)`` measures XLA vs a small tile
  sweep of the Pallas kernel with scalar-fenced timing and records the
  winner;
* decisions persist to ``VCT_AUTOTUNE_CACHE`` (default
  ``~/.cache/vct/autotune.json``) so a host tunes once;
* ``DEFAULT_DECISIONS`` ships decisions measured on a v5e for the
  InstructBLIP-XL serving/prefill shape classes, so the flagship path is
  tuned out of the box;
* unknown shapes fall back to the XLA path (never wrong, sometimes
  slower) until ``autotune_masked_matmul`` is called for them.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

# decisions measured on TPU v5e (single chip, warm, scalar-fenced; see
# BENCH_NOTES.md "masked-matmul autotune" table).  Keys are
# "m,k,n,dtype"; values {"backend": "pallas"|"xla", "tiles": [bm,bn,bk],
# "pallas_us": float, "xla_us": float}.  A host-local cache file
# overrides these.
DEFAULT_DECISIONS: Dict[str, dict] = {
    # T5-XL prefill
    "2048,2048,2048,bfloat16": {
        "backend": "xla", "tiles": [1024, 256, 1024],
        "pallas_us": 2865.5, "xla_us": 2773.0},
    "2048,2048,5120,bfloat16": {
        "backend": "pallas", "tiles": [1024, 512, 512],
        "pallas_us": 3100.2, "xla_us": 4645.2},
    "2048,5120,2048,bfloat16": {
        "backend": "pallas", "tiles": [1024, 512, 512],
        "pallas_us": 4286.4, "xla_us": 5448.6},
    # ViT-g prefill (K=1408 class tiles at bk=128)
    "4096,1408,1408,bfloat16": {
        "backend": "pallas", "tiles": [1024, 128, 128],
        "pallas_us": 3524.8, "xla_us": 3601.1},
    "4096,1408,6144,bfloat16": {
        "backend": "xla", "tiles": [1024, 512, 128],
        "pallas_us": 4128.1, "xla_us": 3743.5},
    "4096,6144,1408,bfloat16": {
        "backend": "pallas", "tiles": [512, 128, 1024],
        "pallas_us": 3241.5, "xla_us": 4770.2},
    # decode steps (batch 16; chained single-program timing)
    "16,2048,2048,bfloat16": {
        "backend": "pallas", "tiles": [16, 512, 512],
        "pallas_us": 332.1, "xla_us": 425.5},
    "16,2048,5120,bfloat16": {
        "backend": "xla", "tiles": [16, 512, 512],
        "pallas_us": 435.8, "xla_us": 373.1},
    "16,5120,2048,bfloat16": {
        "backend": "pallas", "tiles": [16, 512, 512],
        "pallas_us": 409.6, "xla_us": 414.9},
    # fused sparse-LoRA (y = x·((W + s·A·B)⊙M)) — XLA wins every XL
    # training/prefill class: its fusion folds the rank-r merge into the
    # dot's operand read, so the Pallas kernel's per-tile merge buys
    # nothing (measured solo + load-free, see BENCH_NOTES).  Decisions
    # shipped anyway so other shapes/chips can flip per-shape.
    "lora:2048,2048,2048,bfloat16": {
        "backend": "xla", "tiles": [1024, 512, 256],
        "pallas_us": 691.0, "xla_us": 624.9},
    "lora:2048,2048,5120,bfloat16": {
        "backend": "xla", "tiles": [1024, 512, 256],
        "pallas_us": 942.3, "xla_us": 835.8},
    "lora:2048,5120,2048,bfloat16": {
        "backend": "xla", "tiles": [1024, 512, 256],
        "pallas_us": 949.3, "xla_us": 792.9},
    "lora:4096,1408,1408,bfloat16": {
        "backend": "xla", "tiles": [1024, 128, 128],
        "pallas_us": 896.2, "xla_us": 617.7},
    "lora:4096,1408,6144,bfloat16": {
        "backend": "xla", "tiles": [1024, 512, 128],
        "pallas_us": 1283.9, "xla_us": 937.7},
    "lora:4096,6144,1408,bfloat16": {
        "backend": "xla", "tiles": [1024, 128, 1024],
        "pallas_us": 1305.1, "xla_us": 1010.4},
    # flash attention (v5e, scalar-fenced, solo; round-3 re-measure with
    # fwd+bwd evidence for the classes RESSA retraining backprops through
    # — see BENCH_NOTES "attention autotune").  Decoder-only prefill wins
    # grow with sequence length (1.27× @1k → 1.56× @2k: the materialized
    # probability tensor's HBM traffic is quadratic); train-gated classes
    # flip to XLA when the Pallas backward loses even though the forward
    # wins (ViT 257, T5 decoder self/cross at KD lengths).
    "attn:16,16,257,257,88,bfloat16,f": {
        "backend": "xla", "tiles": [128, 384],
        "pallas_us": 3398.2, "xla_us": 3592.0,
        "pallas_train_us": 4929.0, "xla_train_us": 3952.1},
    "attn:8,32,512,512,64,bfloat16,f": {
        "backend": "pallas", "tiles": [256, 512],
        "pallas_us": 3745.4, "xla_us": 3794.0,
        "pallas_train_us": 6390.6, "xla_train_us": 7407.8},
    # Vicuna prefill classes re-measured train-gated in round 5: the
    # Pallas backward WINS too (1.21× @512 → 1.51× @2k), so the flag is
    # safe for RESSA retraining shapes, not just eval prefill
    "attn:4,32,512,512,128,bfloat16,f": {
        "backend": "pallas", "tiles": [128, 512],
        "pallas_us": 2923.3, "xla_us": 3732.8,
        "pallas_train_us": 4386.9, "xla_train_us": 5328.6},
    "attn:2,32,1024,1024,128,bfloat16,f": {
        "backend": "pallas", "tiles": [256, 512],
        "pallas_us": 3344.4, "xla_us": 4926.9,
        "pallas_train_us": 4688.8, "xla_train_us": 6391.5},
    "attn:1,32,2048,2048,128,bfloat16,f": {
        "backend": "pallas", "tiles": [256, 512],
        "pallas_us": 4102.9, "xla_us": 6708.3,
        "pallas_train_us": 6704.1, "xla_train_us": 10098.4},
    # causal-FLAG classes (above-diagonal block skip; round 5): the skip
    # pays off quadratically with length — 1.07× at GPT-2's 1k context,
    # 2.20× at the generic 2k class (XLA materializes the full n×m
    # probability tensor either way; the kernel skips half its tiles)
    "attn:4,12,1024,1024,64,bfloat16,c": {
        "backend": "pallas", "tiles": [256, 512],
        "pallas_us": 2997.2, "xla_us": 3193.3},
    "attn:2,32,2048,2048,128,bfloat16,c": {
        "backend": "pallas", "tiles": [256, 512],
        "pallas_us": 5015.0, "xla_us": 11054.0},
    # OPT-2.7B prefill measured a 0.5% "win" — inside the tunnel's ±15%
    # variance band, so the doctrine keeps the reference
    "attn:4,32,512,512,80,bfloat16,f": {
        "backend": "xla", "tiles": [256, 512],
        "pallas_us": 3259.1, "xla_us": 3275.1},
    "attn:8,32,256,256,64,bfloat16,f": {
        "backend": "xla", "tiles": [128, 256],
        "pallas_us": 3317.6, "xla_us": 3194.7,
        "pallas_train_us": 4529.4, "xla_train_us": 3278.6},
    "attn:8,32,256,512,64,bfloat16,f": {
        "backend": "xla", "tiles": [256, 512],
        "pallas_us": 3274.5, "xla_us": 3487.8,
        "pallas_train_us": 4030.2, "xla_train_us": 3744.9},
}

_CACHE: Optional[Dict[str, dict]] = None   # merged view (defaults + tuned)
_TUNED: Dict[str, dict] = {}               # file-backed entries only


def _cache_path() -> str:
    return os.environ.get(
        "VCT_AUTOTUNE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "vct",
                     "autotune.json"))


def _load_cache() -> Dict[str, dict]:
    global _CACHE
    if _CACHE is None:
        _TUNED.clear()
        try:
            with open(_cache_path()) as f:
                _TUNED.update(json.load(f))
        except (OSError, ValueError):
            pass
        _CACHE = dict(DEFAULT_DECISIONS)
        _CACHE.update(_TUNED)
    return _CACHE


def _save_cache() -> None:
    """Persist only this host's MEASURED decisions — never the shipped
    DEFAULT_DECISIONS, so library updates to the defaults keep taking
    effect on hosts that haven't tuned those shapes themselves."""
    path = _cache_path()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(_TUNED, f, indent=1, sort_keys=True)
    except OSError:
        pass


def _key(m: int, k: int, n: int, dtype: str) -> str:
    return f"{m},{k},{n},{dtype}"


def lookup_masked_matmul(m: int, k: int, n: int,
                         dtype: str) -> Optional[dict]:
    return _load_cache().get(_key(m, k, n, dtype))


# ---------------------------------------------------------------------------
# scalar-fenced timing (tunnel-safe)
# ---------------------------------------------------------------------------


def _sync(x) -> float:
    """The only reliable device barrier over the tunnel backend: fetch a
    scalar reduction."""
    return float(jnp.sum(x.ravel()[:8]))


def time_call(fn, *args, iters: int = 10) -> float:
    """Seconds per call, warm (one untimed call first), scalar-fenced."""
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def time_call_chained(fn, x, w, mask, iters: int = 64) -> float:
    """Seconds per kernel invocation with ALL iterations inside one
    compiled program (a fori_loop whose carry feeds back into the input
    at 1e-38 scale, so XLA cannot CSE the calls away).  This removes
    host→device dispatch from the measurement — essential for small
    (decode-step) shapes, where tunnel dispatch latency is 1000× the
    kernel time and would otherwise decide the winner."""

    def chained(x, w, mask):
        def body(_, acc):
            # cast the perturbed input back to x.dtype: bf16 + f32 carry
            # would otherwise promote the whole measurement to f32
            xi = (x.astype(jnp.float32) + acc).astype(x.dtype)
            y = fn(xi, w, mask)
            return acc * 0.5 + y[0, :1].astype(jnp.float32) * 1e-38

        return jax.lax.fori_loop(0, iters, body,
                                 jnp.zeros((1,), jnp.float32))

    f = jax.jit(chained)
    out = f(x, w, mask)
    _sync(out)
    t0 = time.perf_counter()
    out = f(x, w, mask)
    _sync(out)
    return (time.perf_counter() - t0) / iters


# ---------------------------------------------------------------------------
# tuning
# ---------------------------------------------------------------------------


def _tile_candidates(m: int, k: int, n: int):
    seen = []
    for bm in (1024, 512, 256, 128):
        if m % bm:
            continue
        for bn in (512, 256, 128):
            if n % bn:
                continue
            # bk=128 matters for K=1408-class (ViT-g) shapes, whose only
            # 128-multiple tiling is 128 itself
            for bk in (512, 1024, 256, 128):
                if k % bk:
                    continue
                seen.append((bm, bn, bk))
    # small-m shapes (decode steps): allow skinny bm
    if not any(m % bm == 0 for bm in (1024, 512, 256, 128)):
        for bm in (64, 32, 16, 8):
            if m % bm == 0:
                for bn in (512, 256, 128):
                    if n % bn == 0:
                        for bk in (512, 256):
                            if k % bk == 0:
                                seen.append((bm, bn, bk))
                break
    return seen[:9]


def tune_masked_matmul(m: int, k: int, n: int, dtype: str = "bfloat16",
                       iters: int = 10, verbose: bool = False) -> dict:
    """Measure XLA vs Pallas tile candidates for one shape; record and
    return the decision."""
    from vlm_compression_tpu.ops import masked_linear as ml

    cache = _load_cache()
    key = _key(m, k, n, dtype)
    if key in cache:
        return cache[key]
    if jax.default_backend() != "tpu":
        # never record CPU timings for a TPU dispatch decision
        return {"backend": "xla", "tiles": None,
                "pallas_us": None, "xla_us": None}

    jdt = jnp.dtype(dtype)
    kx, kw, km = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(kx, (m, k), jnp.float32).astype(jdt)
    w = jax.random.normal(kw, (k, n), jnp.float32).astype(jdt)
    mask = jax.random.bernoulli(km, 0.5, (k, n))

    # decode-class shapes: chain iterations inside one program so the
    # decision reflects kernel time, not tunnel dispatch latency
    chained = m <= 128

    def measure(fn):
        if chained:
            return time_call_chained(fn, x, w, mask, iters=8 * iters)
        return time_call(jax.jit(fn), x, w, mask, iters=iters)

    t_xla = measure(ml.masked_matmul_ref)

    best_tiles, t_pallas = None, float("inf")
    if jax.default_backend() == "tpu":
        for tiles in _tile_candidates(m, k, n):
            try:
                t = measure(lambda a, b, c, tt=tiles:
                            ml._masked_matmul_pallas(a, b, c, tt))
            except Exception:
                continue
            if verbose:
                print(f"  tiles {tiles}: {t * 1e6:.0f} us")
            if t < t_pallas:
                best_tiles, t_pallas = tiles, t

    decision = {
        "backend": ("pallas" if t_pallas < t_xla else "xla"),
        "tiles": list(best_tiles) if best_tiles else None,
        "pallas_us": round(t_pallas * 1e6, 1) if best_tiles else None,
        "xla_us": round(t_xla * 1e6, 1),
    }
    cache[key] = decision
    _TUNED[key] = decision
    _save_cache()
    if verbose:
        print(f"{key}: {decision}")
    return decision


# InstructBLIP FlanT5-XL serving shape classes: (tokens, in, out) of the
# hot masked linears.  Prefill = batch 16 × ~77 enc tokens (ViT 257+32
# query tokens for the vision tower); decode = batch 16 × 1.
XL_SHAPES = [
    # T5-XL d_model 2048, d_ff 5120: q/k/v/o and wi/wo, prefill-ish m
    (2048, 2048, 2048),
    (2048, 2048, 5120),
    (2048, 5120, 2048),
    # ViT-g 1408/6144, 257 tokens × batch 16 ≈ 4112 → padded class 4096
    (4096, 1408, 1408),
    (4096, 1408, 6144),
    (4096, 6144, 1408),
    # decode steps (batch 16, m=16)
    (16, 2048, 2048),
    (16, 2048, 5120),
    (16, 5120, 2048),
]


def autotune_masked_matmul(shapes=None, dtype: str = "bfloat16",
                           iters: int = 10, verbose: bool = True) -> dict:
    """Tune a list of (m, k, n) shapes (default: the XL serving classes)
    and leave the dispatch default on "auto" so they take effect."""
    out = {}
    for m, k, n in (shapes or XL_SHAPES):
        out[_key(m, k, n, dtype)] = tune_masked_matmul(
            m, k, n, dtype, iters=iters, verbose=verbose)
    return out


# ---------------------------------------------------------------------------
# sparse-LoRA fused matmul: y = x @ ((W + s·A·B) ⊙ M).  Separate decision
# family ("lora:" key prefix): the per-call adapter merge changes the op
# enough that masked-matmul winners must not carry over.  Measured on
# v5e: XLA wins ALL six XL classes for this op (its fusion folds the
# rank-r merge into the dot operand read) even where Pallas wins the
# plain masked matmul — see BENCH_NOTES "Fused sparse-LoRA dispatch".
# ---------------------------------------------------------------------------


def _lora_key(m: int, k: int, n: int, dtype: str) -> str:
    return "lora:" + _key(m, k, n, dtype)


def lookup_sparse_lora(m: int, k: int, n: int, dtype: str) -> Optional[dict]:
    return _load_cache().get(_lora_key(m, k, n, dtype))


def time_call_chained_lora(fn, x, w, mask, a, b, iters: int = 48) -> float:
    """Chained timing for the fused-LoRA op.  x, W and A are all perturbed
    by the carry each iteration: the (W + s·A·B)⊙M merge happens once per
    forward call in real use (weights change every optimizer step), so it
    must stay inside the measured region — with loop-invariant weights XLA
    hoists the merge out of the fori_loop and the comparison is fiction."""

    def chained(x, w, mask, a, b):
        def body(_, acc):
            xi = (x.astype(jnp.float32) + acc).astype(x.dtype)
            wi = (w.astype(jnp.float32) + acc).astype(w.dtype)
            ai = (a.astype(jnp.float32) + acc).astype(a.dtype)
            y = fn(xi, wi, mask, ai, b)
            return acc * 0.5 + y[0, :1].astype(jnp.float32) * 1e-38

        return jax.lax.fori_loop(0, iters, body,
                                 jnp.zeros((1,), jnp.float32))

    f = jax.jit(chained)
    _sync(f(x, w, mask, a, b))
    t0 = time.perf_counter()
    _sync(f(x, w, mask, a, b))
    return (time.perf_counter() - t0) / iters


def tune_sparse_lora_matmul(m: int, k: int, n: int, r: int = 8,
                            dtype: str = "bfloat16", iters: int = 48,
                            verbose: bool = False) -> dict:
    """Measure XLA vs Pallas tile candidates for the fused-LoRA op at one
    shape; record and return the decision.  The decision is keyed on
    (m, k, n, dtype) only — rank-r work is negligible next to the main
    contraction for any practical r (reference uses 2-32)."""
    from vlm_compression_tpu.ops import masked_linear as ml

    cache = _load_cache()
    key = _lora_key(m, k, n, dtype)
    if key in cache:
        return cache[key]
    if jax.default_backend() != "tpu":
        return {"backend": "xla", "tiles": None,
                "pallas_us": None, "xla_us": None}

    jdt = jnp.dtype(dtype)
    kx, kw, km, ka, kb = jax.random.split(jax.random.key(0), 5)
    x = jax.random.normal(kx, (m, k), jnp.float32).astype(jdt)
    w = jax.random.normal(kw, (k, n), jnp.float32).astype(jdt)
    mask = jax.random.bernoulli(km, 0.5, (k, n))
    a = (jax.random.normal(ka, (k, r), jnp.float32) * 0.05).astype(jdt)
    b = (jax.random.normal(kb, (r, n), jnp.float32) * 0.05).astype(jdt)
    scale = 2.0

    def measure(fn):
        return time_call_chained_lora(fn, x, w, mask, a, b, iters=iters)

    t_xla = measure(lambda x_, w_, m_, a_, b_:
                    ml.sparse_lora_matmul_ref(x_, w_, m_, a_, b_, scale))

    best_tiles, t_pallas = None, float("inf")
    for tiles in _tile_candidates(m, k, n):
        try:
            t = measure(lambda x_, w_, m_, a_, b_, tt=tiles:
                        ml._sparse_lora_pallas(x_, w_, m_, a_, b_, scale, tt))
        except Exception:
            continue
        if verbose:
            print(f"  tiles {tiles}: {t * 1e6:.0f} us")
        if t < t_pallas:
            best_tiles, t_pallas = tiles, t

    decision = {
        "backend": ("pallas" if t_pallas < t_xla else "xla"),
        "tiles": list(best_tiles) if best_tiles else None,
        "pallas_us": round(t_pallas * 1e6, 1) if best_tiles else None,
        "xla_us": round(t_xla * 1e6, 1),
    }
    cache[key] = decision
    _TUNED[key] = decision
    _save_cache()
    if verbose:
        print(f"{key}: {decision}")
    return decision


def autotune_sparse_lora(shapes=None, r: int = 8, dtype: str = "bfloat16",
                         iters: int = 48, verbose: bool = True) -> dict:
    """Tune the fused sparse-LoRA dispatch (default: the XL training/
    prefill shape classes — decode uses the merged weights, so the skinny
    m=16 classes are skipped unless passed explicitly)."""
    out = {}
    default = [s for s in XL_SHAPES if s[0] > 128]
    for m, k, n in (shapes or default):
        out[_lora_key(m, k, n, dtype)] = tune_sparse_lora_matmul(
            m, k, n, r=r, dtype=dtype, iters=iters, verbose=verbose)
    return out


# ---------------------------------------------------------------------------
# Flash attention: fused online-softmax kernel vs XLA's materialized
# scores path (ops/attention.py).  Decision family "attn:" keyed on
# (batch, heads, q_len, kv_len, head_dim, dtype, causal); the value's
# "tiles" field holds [block_q, block_k].  Same doctrine as the masked
# matmul: unknown shape classes run the XLA reference (never wrong);
# the kernel activates per class only after a measured on-chip win.
# ---------------------------------------------------------------------------


def _attn_key(b: int, h: int, n: int, m: int, d: int, dtype: str,
              causal: bool) -> str:
    return f"attn:{b},{h},{n},{m},{d},{dtype},{'c' if causal else 'f'}"


def lookup_attention(b: int, h: int, n: int, m: int, d: int,
                     dtype: str, causal: bool) -> Optional[dict]:
    return _load_cache().get(_attn_key(b, h, n, m, d, dtype, causal))


def _attn_block_candidates(n: int, m: int):
    def up128(x):
        return ((x + 127) // 128) * 128

    seen, cands = set(), []
    for bq in (256, 128, 512):
        for bk in (256, 128, 512):
            if bq * bk > 512 * 256:       # keep the score tile comfortably
                continue                  # inside VMEM with q/k/v/acc
            # the wrapper clamps blocks to the padded lengths; dedupe
            # candidates that collapse to the same effective tiling
            eff = (min(bq, up128(n)), min(bk, up128(m)))
            if eff not in seen:
                seen.add(eff)
                cands.append(eff)
    return cands


def tune_attention(b: int, h: int, n: int, m: int, d: int,
                   dtype: str = "bfloat16", causal: bool = False,
                   bias_pattern: str = "mask", iters: int = 10,
                   train: bool = False, force: bool = False,
                   verbose: bool = False) -> dict:
    """Measure the XLA reference vs flash block candidates for one
    attention shape class; record and return the decision.

    ``bias_pattern`` reproduces the towers' actual additive terms so the
    measured class is the executed one: "none" (ViT), "mask" a padding
    mask (b, 1, 1, m), "relpos+mask" T5's (1, h, n, m) + (b, 1, 1, m),
    "full" the decoder-only combined causal+pad mask (b, 1, n, m).

    ``train=True`` additionally times fwd+bwd (jax.grad wrt q/k/v, and wrt
    the rel-pos bias for the relpos class — the towers' only
    parameter-derived bias) for the XLA path and the best Pallas tiles;
    the recorded backend is then "pallas" only if it wins BOTH directions
    (a class used in RESSA retraining pays the backward every step)."""
    from vlm_compression_tpu.ops import attention as at

    cache = _load_cache()
    key = _attn_key(b, h, n, m, d, dtype, causal)
    if key in cache and not force:
        dec = cache[key]
        if not train or dec.get("xla_train_us") is not None:
            return dec
    if jax.default_backend() != "tpu":
        return {"backend": "xla", "tiles": None,
                "pallas_us": None, "xla_us": None}

    jdt = jnp.dtype(dtype)
    kq, kk, kv, kb = jax.random.split(jax.random.key(0), 4)
    q = jax.random.normal(kq, (b, n, h, d), jnp.float32).astype(jdt)
    k = jax.random.normal(kk, (b, m, h, d), jnp.float32).astype(jdt)
    v = jax.random.normal(kv, (b, m, h, d), jnp.float32).astype(jdt)
    pad = jnp.where(jax.random.bernoulli(kb, 0.9, (b, 1, 1, m)),
                    0.0, -1e9).astype(jnp.float32)
    if bias_pattern == "none":
        biases = []
    elif bias_pattern == "mask":
        biases = [pad]
    elif bias_pattern == "relpos+mask":
        biases = [jax.random.normal(kb, (1, h, n, m), jnp.float32), pad]
    elif bias_pattern == "relpos_full":
        # T5 decoder self-attn in training: rel-pos + causal + pad are
        # pre-summed into one (b, h, n, m) fp32 bias (t5.py:319-321)
        tri = jnp.where(jnp.arange(m)[None, :]
                        <= jnp.arange(n)[:, None] + (m - n), 0.0, -1e9)
        biases = [jax.random.normal(kb, (1, h, n, m), jnp.float32)
                  + tri[None, None] + pad]
    elif bias_pattern == "full":
        tri = jnp.where(jnp.arange(m)[None, :]
                        <= jnp.arange(n)[:, None] + (m - n), 0.0, -1e9)
        biases = [tri[None, None] + pad]
    else:
        raise ValueError(bias_pattern)
    scale = float(d) ** -0.5

    t_xla = time_call(
        jax.jit(lambda q_, k_, v_: at.mha_reference(
            q_, k_, v_, biases, scale, causal)), q, k, v, iters=iters)

    best, t_pallas = None, float("inf")
    for bq, bk in _attn_block_candidates(n, m):
        try:
            t = time_call(
                jax.jit(lambda q_, k_, v_, bq=bq, bk=bk:
                        at._flash_attention_pallas(
                            q_, k_, v_, biases, scale, causal,
                            block_q=bq, block_k=bk)),
                q, k, v, iters=iters)
        except Exception:
            continue
        if verbose:
            print(f"  blocks ({bq},{bk}): {t * 1e6:.0f} us")
        if t < t_pallas:
            best, t_pallas = (bq, bk), t

    decision = {
        "backend": ("pallas" if t_pallas < t_xla else "xla"),
        "tiles": list(best) if best else None,
        "pallas_us": round(t_pallas * 1e6, 1) if best else None,
        "xla_us": round(t_xla * 1e6, 1),
    }

    if train and best is not None:
        grad_bias = bias_pattern in ("relpos+mask", "relpos_full")
        ct = jax.random.normal(jax.random.key(1), (b, n, h, d),
                               jnp.float32).astype(jdt)

        def mk_grad(fwd):
            def loss(q_, k_, v_, *bs):
                all_b = list(bs) + biases[len(bs):]
                out = fwd(q_, k_, v_, all_b)
                return jnp.sum(out.astype(jnp.float32)
                               * ct.astype(jnp.float32))
            nb = 1 if grad_bias else 0
            g = jax.grad(loss, argnums=tuple(range(3 + nb)))

            # reduce every grad fully so no backward output can be DCE'd,
            # and time_call gets one array to fence on
            def run(*a):
                return jnp.stack([jnp.sum(t.astype(jnp.float32))
                                  for t in g(*a)])
            return jax.jit(run)

        def xla_fwd(q_, k_, v_, bs):
            return at.mha_reference(q_, k_, v_, bs, scale, causal)

        def pl_fwd(q_, k_, v_, bs):
            return at._flash_attention(q_, k_, v_, bs, scale, causal,
                                       False, tuple(best))

        args = (q, k, v) + ((biases[0],) if grad_bias else ())
        tx_train = time_call(mk_grad(xla_fwd), *args, iters=iters)
        try:
            tp_train = time_call(mk_grad(pl_fwd), *args, iters=iters)
        except Exception:
            tp_train = float("inf")
        decision["xla_train_us"] = round(tx_train * 1e6, 1)
        decision["pallas_train_us"] = (round(tp_train * 1e6, 1)
                                       if tp_train < float("inf") else None)
        if decision["backend"] == "pallas" and not tp_train < tx_train:
            decision["backend"] = "xla"

    cache[key] = decision
    _TUNED[key] = decision
    _save_cache()
    if verbose:
        print(f"{key}: {decision}")
    return decision


# Flagship attention shape classes with the towers' ACTUAL bias terms:
# EVA ViT-g prefill (batch 16, 257 tokens, 16 heads × 88, no bias),
# T5-XL encoder (rel-pos + padding mask), decoder-only prefill at
# 512/1024/2048 (Vicuna h32·d128, OPT-2.7B h32·d80 — combined causal+pad
# mask passed as a bias, causal=False: how llama.py/opt.py actually call
# attention_core), T5-XL decoder self/cross attention at KD-training
# lengths.  `train=True` marks the classes RESSA retraining runs a
# backward through — their decision requires a fwd AND bwd win.
ATTN_SHAPES = [
    # (b, h, n, m, d, causal, bias_pattern, train)
    (16, 16, 257, 257, 88, False, "none", True),       # ViT-g prefill
    (8, 32, 512, 512, 64, False, "relpos+mask", True),  # T5 enc self
    (4, 32, 512, 512, 128, False, "full", True),       # Vicuna prefill 512
    (2, 32, 1024, 1024, 128, False, "full", True),     # Vicuna prefill 1k
    (1, 32, 2048, 2048, 128, False, "full", True),     # Vicuna prefill 2k
    (4, 32, 512, 512, 80, False, "full", False),       # OPT-2.7B prefill
    (8, 32, 256, 256, 64, False, "relpos_full", True),  # T5 dec self (KD)
    (8, 32, 256, 512, 64, False, "mask", True),        # T5 dec cross (KD)
    # causal-FLAG classes (kernel's above-diagonal block skip — a
    # different program from the bias-encoded causality the Vicuna path
    # uses): GPT-2 dialogue prefill at its 1k context, and the generic
    # 2k causal class; pad-mask bias as the towers pass it
    (4, 12, 1024, 1024, 64, True, "mask", False),      # GPT-2 prefill 1k
    (2, 32, 2048, 2048, 128, True, "mask", False),     # causal 2k w/ bias
]


def autotune_attention(shapes=None, dtype: str = "bfloat16",
                       iters: int = 10, verbose: bool = True) -> dict:
    out = {}
    for b, h, n, m, d, causal, pattern, train in (shapes or ATTN_SHAPES):
        out[_attn_key(b, h, n, m, d, dtype, causal)] = tune_attention(
            b, h, n, m, d, dtype=dtype, causal=causal, bias_pattern=pattern,
            train=train, iters=iters, verbose=verbose)
    return out
