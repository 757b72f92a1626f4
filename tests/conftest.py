"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
``--xla_force_host_platform_device_count`` (SURVEY.md §4 implication).
Must run before jax is imported anywhere.
"""

import os
import re

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Compile time dominates the suite on a 1-CPU host; opt level 0 cuts CPU
# compiles ~30% and the tiny test models don't need fused code.  CAVEAT:
# opt level 0 reorders fp32 reductions enough to flip top-k TIES, so the
# opt-0 tier is for speed-insensitive tests only — bit-exactness tests
# that compare across program shapes (sharded vs unsharded) re-exec
# themselves in a subprocess with VCT_XLA_OPT=1 (see
# test_sharded_prune.py).  Any pre-existing level flag is replaced so the
# subprocess env wins over the inherited parent flags.
opt_level = os.environ.get("VCT_XLA_OPT", "0")
flags = re.sub(r"--xla_backend_optimization_level=\S+", "", flags).strip()
flags = flags + f" --xla_backend_optimization_level={opt_level}"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# The image's sitecustomize pins JAX_PLATFORMS to the TPU tunnel backend at
# interpreter start; override after import (backend init is lazy, so this
# takes effect as long as no devices were touched yet).
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: tiny-model compiles dominate suite runtime;
# repeat sessions hit the cache.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Full-fp32 matmuls: this host's XLA CPU backend runs DEFAULT-precision
# f32 dots through a reduced-precision fast path (measured 1.1e-3 relative
# error on a 68×16 gram matrix vs 1e-7 at HIGHEST).  The reference
# framework is exact-fp32 torch; parity suites compare against it at
# fp32-tie tolerances, so the whole suite pins HIGHEST.  (The TPU bench
# path intentionally keeps bf16 MXU matmuls for the model forwards —
# parity-critical compression math pins its own precision: ops/stats.py
# Hessian fold, ops/sparsegpt.py VCT_OBS_PRECISION.)
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    d = jax.devices()
    assert len(d) == 8, f"expected 8 virtual devices, got {len(d)}"
    return d
