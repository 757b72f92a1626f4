"""Per-shape OBS phase profile (run on the real chip).

Splits one SparseGPT solve into its two halves per XL shape class:

  hinv   — damped Cholesky of the flipped Hessian + triangular inverse
           (produces the upper Cholesky factor of H⁻¹)
  sweep  — the blocked column sweep (lax.scan over 128-col blocks, the
           row-vectorized forward-substitution closed form + trailing
           MXU update)

Timing: scalar-fenced (block_until_ready is a no-op over the axon
tunnel), warm (first call untimed), iters averaged.

    python scripts/profile_obs.py [--iters 3]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _sync(x):
    return float(jnp.sum(jnp.asarray(x).ravel()[:4].astype(jnp.float32)))


# (label, G, units, in) — the XL bench's OBS group shapes
SHAPES = [
    ("t5dec qkvo G8 (2048²)", 8, 2048, 2048),
    ("t5enc qkvo G4 (2048²)", 4, 2048, 2048),
    ("t5 wi (2048→5120)", 1, 5120, 2048),
    ("t5 wo (5120→2048)", 1, 2048, 5120),
    ("vit qkv (1408→4224)", 1, 4224, 1408),
    ("vit proj (1408²)", 1, 1408, 1408),
    ("vit fc1 (1408→6144)", 1, 6144, 1408),
    ("vit fc2 (6144→1408)", 1, 1408, 6144),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from vlm_compression_tpu.ops import sparsegpt as S

    @functools.partial(jax.jit, static_argnames=())
    def hinv_one(h, damp):
        M = S.damped_cholesky(h[::-1, ::-1], damp)
        panel = S._pick_panel(M.shape[0])
        Minv = S._tri_inverse_lower_blocked(M, panel or 128)
        return Minv[::-1, ::-1]

    def timed(fn, *a):
        out = fn(*a)
        _sync(out if not isinstance(out, tuple) else out[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        _sync(out if not isinstance(out, tuple) else out[0])
        return (time.perf_counter() - t0) / args.iters

    print("backend:", jax.default_backend(), flush=True)
    total_h = total_s = 0.0
    mult = {"t5dec qkvo G8 (2048²)": 24, "t5enc qkvo G4 (2048²)": 24,
            "t5 wi (2048→5120)": 48, "t5 wo (5120→2048)": 48,
            "vit qkv (1408→4224)": 39, "vit proj (1408²)": 39,
            "vit fc1 (1408→6144)": 39, "vit fc2 (6144→1408)": 39}
    for label, g, units, din in SHAPES:
        k = jax.random.PRNGKey(0)
        kw, kx = jax.random.split(k)
        x = jax.random.normal(kx, (max(1024, din // 2), din), jnp.float32)
        h1 = (2.0 / x.shape[0]) * (x.T @ x) + 0.01 * jnp.eye(din)
        w1 = 0.02 * jax.random.normal(kw, (units, din), jnp.float32)
        damp = 0.01 * jnp.mean(jnp.diagonal(h1))

        if g == 1:
            t_h = timed(hinv_one, h1, damp)
            t_full = timed(lambda: S.sparsegpt_prune(w1, h1, 0.5))
        else:
            hs = jnp.stack([h1] * g)
            ws = jnp.stack([w1] * g)
            vh = jax.jit(jax.vmap(hinv_one, in_axes=(0, None)))
            t_h = timed(vh, hs, damp)
            t_full = timed(lambda: S.sparsegpt_prune_batched(ws, hs, 0.5))
        t_s = t_full - t_h
        n = mult.get(label, 1)
        total_h += n * t_h
        total_s += n * t_s
        print(f"{label:26s} hinv {t_h*1e3:8.1f} ms   sweep≈ {t_s*1e3:8.1f} ms"
              f"   full {t_full*1e3:8.1f} ms   ×{n} → {n*t_full:6.2f} s",
              flush=True)
    print(f"\nprojected totals: hinv {total_h:.1f} s   sweep {total_s:.1f} s"
          f"   full {total_h + total_s:.1f} s", flush=True)


if __name__ == "__main__":
    main()
