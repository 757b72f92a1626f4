"""A/B the VCT_OBS_PRECISION knob on the real chip.

For each XL OBS shape class: time the full sparsegpt solve (hinv + sweep)
at the current precision and report mask density; with --compare, also
load masks dumped by a previous run (different precision) and report the
mask-agreement fraction — quantifies what bf16_3x actually changes.

    VCT_OBS_PRECISION=highest python scripts/ab_obs_precision.py --dump /tmp/m_hi
    VCT_OBS_PRECISION=high    python scripts/ab_obs_precision.py --dump /tmp/m_3x --compare /tmp/m_hi
"""

import argparse
import os
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _sync(x):
    return float(jnp.sum(jnp.asarray(x).ravel()[:4].astype(jnp.float32)))


# (label, G, units, in) — the XL bench's OBS group shapes (profile_obs.py)
SHAPES = [
    ("t5dec_qkvo_G8", 8, 2048, 2048),
    ("t5enc_qkvo_G4", 4, 2048, 2048),
    ("t5_wi", 1, 5120, 2048),
    ("t5_wo", 1, 2048, 5120),
    ("vit_qkv", 1, 4224, 1408),
    ("vit_proj", 1, 1408, 1408),
    ("vit_fc1", 1, 6144, 1408),
    ("vit_fc2", 1, 1408, 6144),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--dump", default=None)
    ap.add_argument("--compare", default=None)
    args = ap.parse_args()

    from vlm_compression_tpu.ops import sparsegpt as S

    print("precision:", os.environ.get("VCT_OBS_PRECISION", "highest"),
          "backend:", jax.default_backend(), flush=True)
    _sync(jnp.ones((256, 256)) @ jnp.ones((256, 256)))

    total = 0.0
    for label, G, units, din in SHAPES:
        # Deterministic, process-independent seed: Python's str hash is
        # salted per process, which would make --dump and --compare runs
        # prune DIFFERENT random W/H and turn agree= into a coin flip.
        rng = np.random.default_rng(zlib.crc32(label.encode()))
        X = rng.normal(size=(4096, din)).astype(np.float32)
        H0 = (X.T @ X / 2048).astype(np.float32)
        W = jnp.asarray(rng.standard_normal(size=(G, units, din))
                        .astype(np.float32))
        H = jnp.broadcast_to(jnp.asarray(H0), (G, din, din))
        if G == 1:
            fn = jax.jit(lambda w, h: S.sparsegpt_prune(w[0], h[0], 0.5))
        else:
            fn = jax.jit(lambda w, h: S.sparsegpt_prune_batched(w, h, 0.5))
        r = fn(W, H)
        _sync(r.weight)                 # warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = fn(W, H)
        _sync(r.weight)
        dt = (time.perf_counter() - t0) / args.iters
        total += dt
        mask = np.asarray(r.keep_mask).reshape(-1)
        line = f"{label:16s} {dt*1e3:8.1f} ms  density={mask.mean():.4f}"
        if args.compare:
            prev = np.load(os.path.join(args.compare, label + ".npy"))
            agree = float((prev == mask).mean())
            line += f"  agree={agree:.6f}"
        print(line, flush=True)
        if args.dump:
            os.makedirs(args.dump, exist_ok=True)
            np.save(os.path.join(args.dump, label + ".npy"), mask)
    print(f"TOTAL {total:.2f} s per solve sweep", flush=True)


if __name__ == "__main__":
    main()
