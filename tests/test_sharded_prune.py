"""Distributed pruning over a device mesh.

The reference prunes strictly single-process (train.py:542 forces
distributed=False).  Here the calibration engine is one jitted SPMD
program per block, so pruning scales the same way the train step does:
shard calibration batches on the ``data`` axis and kernels on the
``model`` axis (units dimension — per-unit top-k and the OBS row
recursion are row-parallel), and GSPMD inserts the collectives.  Masks
must match the unsharded run exactly.
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vlm_compression_tpu.compression import load_pruner
from vlm_compression_tpu.compression.pruners.base import FlaxModel
from vlm_compression_tpu.models.blip2_t5_instruct import (
    Blip2T5Instruct,
    Blip2T5InstructConfig,
)
from vlm_compression_tpu.parallel.mesh import MeshConfig, make_mesh

# compile-heavy: excluded from the fast suite (pytest -m "not slow")
pytestmark = pytest.mark.slow



def _tiny_setup(seed=0):
    cfg = Blip2T5InstructConfig.tiny()
    model = Blip2T5Instruct(cfg)
    img = cfg.vit.img_size
    rng = jax.random.key(seed)
    batches = []
    for i in range(2):
        k = jax.random.fold_in(rng, i)
        ki, kt, kl = jax.random.split(k, 3)
        batches.append(dict(
            image=jax.random.normal(ki, (8, img, img, 3), jnp.float32),
            input_ids=jax.random.randint(kt, (8, 6), 3, 50, jnp.int32),
            attention_mask=jnp.ones((8, 6), jnp.int32),
            labels=jax.random.randint(kl, (8, 4), 3, 50, jnp.int32),
        ))
    variables = model.init(jax.random.key(1), **batches[0])
    return model, dict(variables), batches


def _collect_masks(variables):
    out = {}

    def walk(node, path=()):
        for k, v in sorted(node.items()):
            if isinstance(v, dict):
                walk(v, path + (k,))
            elif k == "mask":
                out["/".join(path)] = np.asarray(v)

    walk(variables.get("masks", {}))
    return out


@pytest.mark.parametrize("pruner_name", ["blipt5_wanda_pruner",
                                         "blipt5_sparsegpt_pruner"])
def test_sharded_prune_matches_unsharded(pruner_name):
    if (pruner_name == "blipt5_wanda_pruner"
            and os.environ.get("VCT_XLA_OPT", "0") == "0"):
        # The Wanda case asserts BIT-IDENTICAL masks, which requires XLA
        # opt level >= 1: at the fast tier's opt level 0 the backend
        # reorders fp32 reductions enough to flip top-k ties between the
        # sharded and unsharded programs (2/512 bits at
        # t5_model/decoder/blocks_1/ffn/wo).  Re-exec this exact test in
        # a subprocess pinned to opt level 1 via VCT_XLA_OPT (conftest.py
        # replaces any inherited level flag), so the invariant is proven
        # under the harness that ships at any outer tier.
        env = dict(os.environ, VCT_XLA_OPT="1")
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
             f"{__file__}::test_sharded_prune_matches_unsharded"
             f"[{pruner_name}]"],
            env=env, capture_output=True, text=True, timeout=3600,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        assert r.returncode == 0, (
            f"opt-1 subprocess failed:\n{r.stdout[-6000:]}\n{r.stderr[-2000:]}")
        return
    _run_prune_comparison(pruner_name)


def _run_prune_comparison(pruner_name):
    model, variables, batches = _tiny_setup()
    common = dict(vit_prune_spec="2-0.5-1.0-1.0",
                  t5_prune_spec="2-0.5-1.0-1.0", num_samples=16)

    # unsharded reference
    ref = load_pruner(pruner_name, FlaxModel(model, variables), batches,
                      **common)
    ref_model, _ = ref.prune(lora_model=True)
    ref_masks = _collect_masks(ref_model.variables)
    assert ref_masks

    # sharded: batches on data axis, kernels on the units (out) dim
    mesh = make_mesh(MeshConfig(data=4, model=2))
    dsh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def shard_kernels(node):
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = shard_kernels(v)
            elif k == "kernel" and v.ndim == 2 and v.shape[1] % 2 == 0:
                out[k] = jax.device_put(
                    v, NamedSharding(mesh, P(None, "model")))
            else:
                out[k] = jax.device_put(v, rep)
        return out

    model2, variables2, batches2 = _tiny_setup()
    variables2["params"] = shard_kernels(variables2["params"])
    batches2 = [{k: jax.device_put(v, dsh) for k, v in b.items()}
                for b in batches2]
    sh = load_pruner(pruner_name, FlaxModel(model2, variables2), batches2,
                     **common)
    sh_model, _ = sh.prune(lora_model=True)
    sh_masks = _collect_masks(sh_model.variables)

    assert set(sh_masks) == set(ref_masks)
    for k in ref_masks:
        if pruner_name == "blipt5_wanda_pruner":
            # stats sums commute exactly here — bit-identical masks
            np.testing.assert_array_equal(sh_masks[k], ref_masks[k],
                                          err_msg=k)
        else:
            # OBS thresholds sit on W²/d² values whose Hessian sums
            # reorder across data shards — fp32 tie-flips move a few
            # bits, and OBS weight updates compound them into later
            # blocks (the reference diverges the same way across GPU
            # counts)
            frac = np.mean(sh_masks[k] != ref_masks[k])
            assert frac <= 0.06, (k, frac)
            np.testing.assert_allclose(sh_masks[k].mean(),
                                       ref_masks[k].mean(), atol=0.02)

    if pruner_name == "blipt5_sparsegpt_pruner":
        # Mask tie-flips are only acceptable if they are *objective*
        # ties.  Two bounds:
        #
        # (a) PER-LAYER OBS objective (VERDICT r2 item 9): for every
        #     pruned linear, the layerwise reconstruction error
        #     e(W') = ‖X·(W'⊙M − W₀)‖²_F on the calibration activations
        #     (original-model streams as the common measuring stick —
        #     sparsegpt_pruner.py:183-215's objective with a fixed X)
        #     of the sharded run must be within 10% of the unsharded
        #     one.  A single layer regressing can no longer hide inside
        #     a global total.
        # (b) global calibration-loss divergence < 1%.
        model0, vars0, batches0 = _tiny_setup()
        hessians = {}
        for b in batches0:
            _, aux = model0.apply(vars0, **b, mutable=["calib"])

            def walk(node, path=()):
                for k, v in node.items():
                    if k == "input":
                        key = "/".join(path)
                        for x in v:  # sow stores a tuple per apply
                            X = np.asarray(x, np.float64).reshape(
                                -1, x.shape[-1])
                            hessians[key] = hessians.get(key, 0.0) + X.T @ X
                    elif isinstance(v, dict):
                        walk(v, path + (k,))

            walk(dict(aux)["calib"])

        def kernel_at(tree, key):
            node = tree
            for p in key.split("/"):
                node = node[p]
            return np.asarray(node["kernel"], np.float64)

        def layer_err(m, key):
            node_m = m.variables["masks"]
            for p in key.split("/"):
                node_m = node_m[p]
            w_eff = kernel_at(m.variables["params"], key) \
                * np.asarray(node_m["mask"], np.float64)
            dw = w_eff - kernel_at(vars0["params"], key)
            H = hessians[key]
            return float(np.einsum("io,ij,jo->", dw, H, dw))

        # every pruned linear must be covered (t5_proj sows calibration
        # inputs but is never pruned — reference parity)
        assert set(ref_masks) <= set(hessians)
        for key in ref_masks:
            e_ref, e_sh = layer_err(ref_model, key), layer_err(sh_model, key)
            assert e_sh <= 1.10 * e_ref + 1e-8, (key, e_ref, e_sh)

        def model_loss(m, bs):
            tot = 0.0
            for b in bs:
                out = m.module.apply(m.variables, **b)
                tot += float(out["loss"])
            return tot / len(bs)

        l_ref = model_loss(ref_model, batches)
        l_sh = model_loss(sh_model, batches2)
        rel = abs(l_sh - l_ref) / max(abs(l_ref), 1e-9)
        assert rel < 1e-2, (l_ref, l_sh, rel)
