"""Allocator + global-pruner parity against the reference's OWN code
(VERDICT r3 #3).

Executes, un-rewritten from ``/root/reference``:

  - ``LayerSparsity.return_sparsity`` (layer_single_base_pruner.py:240-420)
    — the waterfilling allocation with max-sparsity clamps and exact-total
    fixups, the first-order obd/aobd/gradient scorers (:422-478), and the
    MeZO zeroth-order estimators (:495-728), at layer/block/model
    granularity and sum/avg aggregation;
  - ``BLIPT5GlobalPruner.global_iterative_pruning`` + ``get_mask`` /
    ``get_layerwise_mask`` (global_pruner.py:108-238) through the real
    ``prune()`` of the mag/aobd/mezo registry variants.

Our ``compression/allocator.LayerSparsity`` and
``compression/pruners/global_pruner`` must reproduce the same per-key
ratios and masks from the same weights/data.  The MeZO comparisons REPLAY
the reference's torch.manual_seed Gaussians through our estimators via the
``noise_fn`` injection hook, so the stochastic estimator math itself is
compared, not the RNG.

Shared toy: a two-tower residual-MLP (visual_encoder.blocks.* +
t5_model.encoder.blocks.*) built twice — torch modules for the reference,
a bare param pytree + pure-jnp loss for us — with identical fp32 weights
(kernel = weight.T) and identical batches.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from vlm_compression_tpu.compression.allocator import (
    LayerSparsity as OurLayerSparsity,
    build_group_mapping,
    compute_the_sparsity_per_group,
    select_prunable_keys,
)

REF = "/root/reference"
PRUNERS_DIR = os.path.join(REF, "lavis", "compression", "pruners")

pytestmark = [
    pytest.mark.skipif(
        not os.path.isdir(PRUNERS_DIR),
        reason="reference snapshot not present"),
    pytest.mark.slow,
]


# ---------------------------------------------------------------------------
# Reference module loading
# ---------------------------------------------------------------------------


def _stub_module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _passthrough(func):
    def wrapper(*a, **kw):
        return func(*a, **kw)
    return wrapper


class _Registry:
    @staticmethod
    def register_pruner(name):
        def deco(cls):
            return cls
        return deco


@pytest.fixture(scope="module")
def ref_mods():
    for pkg in ("lavis", "lavis.common", "lavis.compression",
                "lavis.compression.pruners"):
        if pkg not in sys.modules:
            m = _stub_module(pkg)
            m.__path__ = []
    _stub_module("lavis.common.registry", registry=_Registry())
    _stub_module(
        "lavis.compression.pruners.utils",
        print_time=_passthrough, loss_vision_language=None,
        loss_language=None, loss_vision=None)

    class _BasePruner:
        def __init__(self, model=None, data_loader=None, is_strct_pruning=False,
                     keep_indices_or_masks_cache=None, importance_scores_cache=None,
                     is_global=False, num_samples=64, **kw):
            self.model = model
            self.data_loader = data_loader
            self.is_strct_pruning = is_strct_pruning
            self.is_global = is_global
            self.num_samples = num_samples

    _stub_module("lavis.compression.pruners.base_pruner",
                 BasePruner=_BasePruner)

    mods = {}
    lsp_path = os.path.join(PRUNERS_DIR, "layer_single_base_pruner.py")
    spec = importlib.util.spec_from_file_location("_ref_lsbp", lsp_path)
    lsbp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(lsbp)
    mods["lsbp"] = lsbp
    # global_pruner imports LayerWiseBasePruner/LayerSparsity from the real
    # module we just executed
    sys.modules["lavis.compression.pruners.layer_single_base_pruner"] = lsbp
    gp_path = os.path.join(PRUNERS_DIR, "global_pruner.py")
    spec = importlib.util.spec_from_file_location("_ref_gp", gp_path)
    gp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gp)
    mods["gp"] = gp
    return mods


# ---------------------------------------------------------------------------
# Shared two-tower toy (torch modules + param pytree with identical values)
# ---------------------------------------------------------------------------

D, F, BS = 6, 10, 2
N_VIS, N_T5 = 2, 2


class _Blk(nn.Module):
    def __init__(self, n_in, n_hid, names=("fc1", "fc2")):
        super().__init__()
        setattr(self, names[0], nn.Linear(n_in, n_hid, bias=False))
        setattr(self, names[1], nn.Linear(n_hid, n_in, bias=False))
        self._names = names

    def forward(self, h):
        a = getattr(self, self._names[0])
        b = getattr(self, self._names[1])
        return h + torch.tanh(b(torch.relu(a(h))))


class TwoTower(nn.Module):
    def __init__(self, seed=0):
        super().__init__()
        torch.manual_seed(seed)
        self.visual_encoder = nn.Module()
        self.visual_encoder.blocks = nn.ModuleList(
            _Blk(D, F, ("fc1", "fc2")) for _ in range(N_VIS))
        self.t5_model = nn.Module()
        self.t5_model.encoder = nn.Module()
        self.t5_model.encoder.blocks = nn.ModuleList(
            _Blk(D, F, ("wi", "wo")) for _ in range(N_T5))

    def forward(self, x):
        h = x
        for blk in self.visual_encoder.blocks:
            h = blk(h)
        for blk in self.t5_model.encoder.blocks:
            h = blk(h)
        return h


def torch_loss_func(model, d, cuda_enabled=False):
    """reference loss_func signature: (loss, batch_len)."""
    out = model(d["x"])
    return ((out - d["y"]) ** 2).mean(), d["x"].shape[0]


def to_param_tree(model):
    """torch weights → our pytree (kernel = weight.T), names aligned:
    'visual_encoder.blocks.0.fc1.weight' ↔ 'visual_encoder/blocks_0/fc1'."""
    tree = {}
    for name, p in model.named_parameters():
        parts = name.replace(".weight", "").split(".")
        parts = [f"blocks_{parts[i + 1]}" if parts[i] == "blocks" else q
                 for i, q in enumerate(parts) if not q.isdigit()]
        node = tree
        for q in parts[:-1]:
            node = node.setdefault(q, {})
        node[parts[-1]] = {
            "kernel": jnp.asarray(p.detach().numpy().T.copy())}
    return tree


def to_torch_name(key_str):
    return key_str.replace("/", ".").replace("blocks_", "blocks.") + ".weight"


def jnp_loss(variables, batch):
    """Same math as TwoTower.forward, from the pytree."""
    p = variables["params"]
    h = batch["x"]

    def blk(h, node, a, b):
        z = jnp.maximum(h @ node[a]["kernel"], 0.0)
        return h + jnp.tanh(z @ node[b]["kernel"])

    for i in range(N_VIS):
        h = blk(h, p["visual_encoder"][f"blocks_{i}"], "fc1", "fc2")
    for i in range(N_T5):
        h = blk(h, p["t5_model"]["encoder"][f"blocks_{i}"], "wi", "wo")
    return jnp.mean((h - batch["y"]) ** 2)


def make_data(n_batches=4, seed=3):
    g = torch.Generator().manual_seed(seed)
    tb = [{"x": torch.randn(BS, D, generator=g),
           "y": torch.randn(BS, D, generator=g)} for _ in range(n_batches)]
    jb = [{k: jnp.asarray(v.numpy()) for k, v in b.items()} for b in tb]
    return tb, jb


class _Model:
    """What our allocator expects: .variables (module unused via loss_fn)."""

    def __init__(self, variables):
        self.variables = variables
        self.module = None


def make_mapping(model, granularity):
    """Reference-side layer_to_group_mapping via OUR build_group_mapping
    through the name bijection (so the grouping shape itself is compared)."""
    keys = select_prunable_keys(
        to_param_tree(model), prefixes=("visual_encoder", "t5_model"))
    ours = build_group_mapping(keys, granularity)
    return {to_torch_name("/".join(k)): g for k, g in ours.items()}, keys, ours


def ratios_close(ref_dict, our_dict, group_np, mapping_t, atol_params=2.0):
    """Per-key sparsity ratios equal up to atol_params parameters of the
    key's GROUP (fp32-vs-fp64 ceil boundaries move single parameters)."""
    assert set(ref_dict) == set(our_dict)
    for k in ref_dict:
        npar = group_np[mapping_t[k]]
        assert abs(ref_dict[k] - our_dict[k]) * npar <= atol_params, (
            k, ref_dict[k], our_dict[k], npar)


# ---------------------------------------------------------------------------
# A. pure allocation math (controlled scores; scoring bypassed)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("granularity,aggregate,skew", [
    ("layer", "sum", "random"),
    ("block", "avg", "random"),
    ("model", "sum", "random"),
    ("block", "sum", "clamped"),   # forces the max-sparsity clamp
    ("layer", "avg", "zero"),      # a zero-score group
])
def test_waterfilling_allocation_matches_reference(ref_mods, granularity,
                                                   aggregate, skew):
    lsbp = ref_mods["lsbp"]
    model = TwoTower(seed=1)
    tb, _ = make_data()
    mapping_t, keys, mapping_ours = make_mapping(model, granularity)

    rng = np.random.default_rng(hash((granularity, aggregate, skew)) % 2**31)
    scores = {}
    for name, p in model.named_parameters():
        if name not in mapping_t:
            continue
        s = rng.random(tuple(p.shape)).astype(np.float32)
        if skew == "clamped" and "visual_encoder" in name:
            s *= 1000.0    # huge scores → group wants all params → clamp
        if skew == "zero" and name.endswith("blocks.0.fc1.weight"):
            s *= 0.0
        scores[name] = torch.from_numpy(s)

    ref = lsbp.LayerSparsity(
        model=model, data_loader=tb, loss_func=torch_loss_func,
        num_samples=4, original_sparsity=0.5, max_sparsity_per_layer=0.8,
        score_method=f"obd_{aggregate}", layer_to_group_mapping=mapping_t)
    ref.importance_measure = {k: v.clone() for k, v in scores.items()}
    ref_sparsity = ref.return_sparsity()

    # our side: same group sums → compute_the_sparsity_per_group
    nparams = {name: int(p.numel()) for name, p in model.named_parameters()
               if name in mapping_t}
    group_scores, group_np = {}, {}
    for name in mapping_t:
        g = mapping_t[name]
        group_scores[g] = group_scores.get(g, 0.0) + float(
            scores[name].sum())
        group_np[g] = group_np.get(g, 0) + nparams[name]
    if aggregate == "avg":
        for g in group_scores:
            group_scores[g] /= group_np[g]
    total_keep = int(sum(nparams.values()) * 0.5)
    # bug-compat mode ⇒ the reference's allocation bit-for-bit (incl. its
    # broken over-budget fixup, which systematically over-keeps)
    our_ref_mode = compute_the_sparsity_per_group(
        total_keep, group_scores, group_np, max_sparsity_per_layer=0.8,
        reference_fixups=True)
    our_sparsity = {to_torch_name("/".join(k)): our_ref_mode[mapping_ours[k]]
                    for k in keys}
    ratios_close(ref_sparsity, our_sparsity, group_np, mapping_t,
                 atol_params=0.51)

    # default mode: the budget is hit EXACTLY (our announced invariant —
    # the reference's own check prints an overshoot for the same inputs)
    our_groups = compute_the_sparsity_per_group(
        total_keep, group_scores, group_np, max_sparsity_per_layer=0.8)
    our_total = sum(round((1.0 - our_groups[g]) * group_np[g])
                    for g in group_np)
    assert our_total == total_keep, (our_total, total_keep)


# ---------------------------------------------------------------------------
# B. first-order scorers end-to-end (autograd vs jax.grad)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("score_method,granularity", [
    ("obd_avg", "block"),
    ("aobd_sum", "layer"),
    ("gradient_avg", "model"),
])
def test_first_order_allocation_matches_reference(ref_mods, score_method,
                                                  granularity):
    lsbp = ref_mods["lsbp"]
    model = TwoTower(seed=2)
    tb, jb = make_data(n_batches=4, seed=5)
    mapping_t, keys, _ = make_mapping(model, granularity)

    ref = lsbp.LayerSparsity(
        model=model, data_loader=tb, loss_func=torch_loss_func,
        num_samples=4 * BS, original_sparsity=0.5,
        max_sparsity_per_layer=0.8, score_method=score_method,
        layer_to_group_mapping=mapping_t)
    ref_sparsity = ref.return_sparsity()

    ours = OurLayerSparsity(
        model=_Model({"params": to_param_tree(model)}), data_loader=jb,
        original_sparsity=0.5, granularity=granularity,
        max_sparsity_per_layer=0.8, score_method=score_method,
        num_data=4 * BS, prefixes=("visual_encoder", "t5_model"),
        loss_fn=jnp_loss, reference_fixups=True)
    our_sparsity = {to_torch_name(k): v
                    for k, v in ours.return_sparsity().items()}

    # score parity first (per-key sums, fp32 autograd-vs-jax tolerance)
    our_sums = ours._score_first_order(
        {"params": to_param_tree(model)}, keys)
    for k in keys:
        ref_sum = float(ref.importance_measure[to_torch_name("/".join(k))]
                        .sum())
        np.testing.assert_allclose(our_sums[k], ref_sum, rtol=2e-4,
                                   err_msg="/".join(k))

    group_np = {}
    for name in mapping_t:
        g = mapping_t[name]
        group_np[g] = group_np.get(g, 0) + int(
            dict(model.named_parameters())[name].numel())
    ratios_close(ref_sparsity, our_sparsity, group_np, mapping_t)


# ---------------------------------------------------------------------------
# C. MeZO estimators under replayed reference noise
# ---------------------------------------------------------------------------

EPS = 1e-2  # larger than the 1e-3 default: (l1-l2)/2eps needs fp32 headroom


def _torch_z(seed, shapes):
    """zo_perturb_parameters' Gaussians: ONE manual_seed, then one
    torch.normal per param in order (reference :489-494)."""
    torch.manual_seed(seed)
    return [torch.normal(mean=0.0, std=1.0, size=tuple(s)).numpy()
            for s in shapes]


def test_mezo_diff_allocation_matches_reference(ref_mods):
    lsbp = ref_mods["lsbp"]
    model = TwoTower(seed=4)
    tb, jb = make_data(n_batches=3, seed=7)
    mapping_t, keys, _ = make_mapping(model, "block")
    names = [n for n, _ in model.named_parameters() if n in mapping_t]
    shapes = [tuple(dict(model.named_parameters())[n].shape) for n in names]

    # replay the reference's np.random seed stream to extract every z
    np.random.seed(123)
    Z = {}   # (batch_i, torch_name) -> z ndarray
    for i in range(len(tb)):
        s = np.random.randint(1000000000)
        for n, z in zip(names, _torch_z(s, shapes)):
            Z[(i, n)] = z

    np.random.seed(123)   # the reference consumes the same stream
    ref = lsbp.LayerSparsity(
        model=model, data_loader=tb, loss_func=torch_loss_func,
        num_samples=3 * BS, original_sparsity=0.5,
        max_sparsity_per_layer=0.8, score_method="mezo-aobd_avg",
        noise_eps=EPS, layer_to_group_mapping=mapping_t)
    ref_sparsity = ref.return_sparsity()

    def noise_fn(batch_i, key_str, shape):
        return Z[(batch_i, to_torch_name(key_str))].T

    ours = OurLayerSparsity(
        model=_Model({"params": to_param_tree(model)}), data_loader=jb,
        original_sparsity=0.5, granularity="block",
        max_sparsity_per_layer=0.8, score_method="mezo-aobd_avg",
        num_data=3 * BS, noise_eps=EPS,
        prefixes=("visual_encoder", "t5_model"), loss_fn=jnp_loss,
        noise_fn=noise_fn, reference_fixups=True)
    our_sums = ours._score_mezo_diff({"params": to_param_tree(model)}, keys)
    for k in keys:
        ref_sum = float(ref.importance_measure[to_torch_name("/".join(k))]
                        .sum())
        # pg = (l1-l2)/2eps is a CANCELLING fp32 difference; at toy scale
        # the noise floor is ~0.3% relative — structural errors are >2x
        np.testing.assert_allclose(our_sums[k], ref_sum, rtol=1e-2,
                                   atol=1e-10, err_msg="/".join(k))

    our_sparsity = {to_torch_name(k): v
                    for k, v in ours.return_sparsity().items()}
    group_np = {}
    for name in mapping_t:
        g = mapping_t[name]
        group_np[g] = group_np.get(g, 0) + int(
            dict(model.named_parameters())[name].numel())
    ratios_close(ref_sparsity, our_sparsity, group_np, mapping_t)


@pytest.mark.parametrize("score_method", ["lmezo-obd_avg",
                                          "olmezo-gradient_sum"])
def test_mezo_layer_allocation_matches_reference(ref_mods, score_method):
    lsbp = ref_mods["lsbp"]
    model = TwoTower(seed=6)
    # lmezo hard-codes num_samples=8 & n_mezo=4 (reference :600-602), and
    # the sample budget is consumed per NOISE eval — bs=2 ⇒ 1 batch of the
    # loader per leaf; supply 3 so the budget logic (not the data) stops it
    tb, jb = make_data(n_batches=3, seed=9)
    mapping_t, keys, _ = make_mapping(model, "layer")
    names = [n for n, _ in model.named_parameters() if n in mapping_t]
    shapes = {n: tuple(dict(model.named_parameters())[n].shape)
              for n in names}
    one = score_method.startswith("olmezo")
    n_mezo = 1 if one else 4          # olmezo: num_noise=1
    num_samples = 8

    # replay the exact (leaf, batch, noise) seed stream the reference draws
    np.random.seed(77)
    Z = {}
    for name in names:                # reference loops leaves outer
        accum = 0
        for bi in range(len(tb)):
            if accum >= num_samples:
                break
            for ni in range(n_mezo):
                if accum >= num_samples:
                    break
                s = np.random.randint(1000000000)
                Z[(name, bi, ni)] = _torch_z(s, [shapes[name]])[0]
                accum += BS

    np.random.seed(77)
    ref = lsbp.LayerSparsity(
        model=model, data_loader=tb, loss_func=torch_loss_func,
        num_samples=num_samples, original_sparsity=0.5,
        max_sparsity_per_layer=0.8, score_method=score_method,
        num_noise=n_mezo, noise_eps=EPS, layer_to_group_mapping=mapping_t)
    ref_sparsity = ref.return_sparsity()

    def noise_fn(tag, key_str, shape):
        _, bi, ni = tag
        return Z[(to_torch_name(key_str), bi, ni)].T

    ours = OurLayerSparsity(
        model=_Model({"params": to_param_tree(model)}), data_loader=jb,
        original_sparsity=0.5, granularity="layer",
        max_sparsity_per_layer=0.8, score_method=score_method,
        num_data=num_samples, num_noise=n_mezo, noise_eps=EPS,
        prefixes=("visual_encoder", "t5_model"), loss_fn=jnp_loss,
        noise_fn=noise_fn, reference_fixups=True)
    our_sums = ours._score_mezo_layer({"params": to_param_tree(model)}, keys)
    for k in keys:
        ref_sum = float(ref.importance_measure[to_torch_name("/".join(k))]
                        .sum())
        np.testing.assert_allclose(our_sums[k], ref_sum, rtol=2e-3,
                                   atol=1e-10, err_msg="/".join(k))

    our_sparsity = {to_torch_name(k): v
                    for k, v in ours.return_sparsity().items()}
    group_np = {name: int(dict(model.named_parameters())[name].numel())
                for name in mapping_t}
    ratios_close(ref_sparsity, our_sparsity,
                 {mapping_t[n]: group_np[n] for n in mapping_t}, mapping_t)


# ---------------------------------------------------------------------------
# D. global pruners: masks via the reference's real prune()
# ---------------------------------------------------------------------------


def _ref_global_prune(gp_mod, gp_cls, model, data, *, iteration=1,
                      is_global=True, prune_per_model=False, num_noise=1,
                      num_samples=8):
    pruner = gp_cls(
        model=model, data_loader=data,
        t5_prune_spec="2-0.5-1.0-1.0", vit_prune_spec="2-0.5-1.0-1.0",
        is_global=is_global, prune_per_model=prune_per_model,
        iteration=iteration, num_samples=num_samples, num_noise=num_noise)
    pruner.pruner_name = gp_cls.__name__
    # loss_vision_language is stubbed to None in the module; the mag/rand/
    # mezo paths never call it, aobd receives it as loss_func param — patch
    # the module global so the aobd path uses our toy loss
    sys.modules["lavis.compression.pruners.utils"].loss_vision_language = \
        torch_loss_func
    gp_mod.loss_vision_language = torch_loss_func
    pruned, _ = pruner.prune()
    return {n: (p.detach().numpy() != 0)
            for n, p in pruned.named_parameters()}


def _our_global_masks(name, model, jb, **kw):
    from vlm_compression_tpu.compression import load_pruner
    from vlm_compression_tpu.compression.pruners.base import FlaxModel

    class _Mod:
        """module shim: our global pruners only call apply() for aobd/mezo."""

        def apply(self, variables, **batch):
            return {"loss": jnp_loss(variables, batch)}

    fm = FlaxModel(_Mod(), {"params": to_param_tree(model)})
    pruner = load_pruner(name, fm, jb,
                         t5_prune_spec="2-0.5-1.0-1.0",
                         vit_prune_spec="2-0.5-1.0-1.0", **kw)
    pruned, _ = pruner.prune()
    out = {}

    def walk(node, path=()):
        for k, v in sorted(node.items()):
            if isinstance(v, dict) and k != "mask" :
                walk(v, path + (k,))
            elif k == "mask":
                out[to_torch_name("/".join(path))] = np.asarray(v)

    walk(pruned.variables["masks"])
    return out


@pytest.mark.parametrize("iteration,mode", [
    (1, "global"), (2, "global"), (1, "per_model"), (1, "layerwise")])
def test_global_mag_pruner_masks_match_reference(ref_mods, iteration, mode):
    gp = ref_mods["gp"]
    model = TwoTower(seed=8)
    tb, jb = make_data(n_batches=2, seed=11)
    ref_masks = _ref_global_prune(
        gp, gp.BLIPT5MagPruner, model, tb, iteration=iteration,
        is_global=mode != "layerwise", prune_per_model=mode == "per_model")
    our_masks = _our_global_masks(
        "blipt5_mag_pruner", TwoTower(seed=8), jb,
        is_global=mode != "layerwise", prune_per_model=mode == "per_model",
        iteration=iteration)
    assert set(our_masks) <= set(ref_masks)
    assert our_masks
    for k, m in our_masks.items():
        np.testing.assert_array_equal(m.T, ref_masks[k], err_msg=k)
    # non-selected params (none here) stay dense in the reference
    for k in set(ref_masks) - set(our_masks):
        assert ref_masks[k].all(), k


def test_global_aobd_pruner_masks_match_reference(ref_mods):
    gp = ref_mods["gp"]
    model = TwoTower(seed=10)
    tb, jb = make_data(n_batches=2, seed=13)
    ref_masks = _ref_global_prune(gp, gp.BLIPT5AOBDPruner, model, tb,
                                  num_samples=2 * BS)
    our_masks = _our_global_masks(
        "blipt5_aobd_pruner", TwoTower(seed=10), jb, is_global=True,
        num_samples=2 * BS)
    for k, m in our_masks.items():
        np.testing.assert_array_equal(m.T, ref_masks[k], err_msg=k)


def test_global_mezo_pruner_masks_match_reference(ref_mods):
    gp = ref_mods["gp"]
    model = TwoTower(seed=12)
    tb, jb = make_data(n_batches=2, seed=15)
    mapping_t, keys, _ = make_mapping(model, "layer")
    names = [n for n, _ in model.named_parameters() if n in mapping_t]
    shapes = {n: tuple(dict(model.named_parameters())[n].shape)
              for n in names}

    # the reference's zo-seed stream: leaves outer, batches inner, 1 noise,
    # sample budget consumed per noise eval (num_samples=2*BS → 2 batches)
    np.random.seed(55)
    Z = {}
    for name in names:
        accum = 0
        for bi in range(len(tb)):
            if accum >= 2 * BS:
                break
            s = np.random.randint(1000000000)
            Z[(name, bi, 0)] = _torch_z(s, [shapes[name]])[0]
            accum += BS

    np.random.seed(55)
    ref_masks = _ref_global_prune(gp, gp.BLIPT5AMeZoPruner, model, tb,
                                  num_samples=2 * BS)

    def noise_fn(tag, key_str, shape):
        _, bi, ni = tag
        return Z[(to_torch_name(key_str), bi, ni)].T

    our_masks = _our_global_masks(
        "blipt5_mezo_pruner", TwoTower(seed=12), jb, is_global=True,
        num_samples=2 * BS, noise_fn=noise_fn)
    for k, m in our_masks.items():
        np.testing.assert_array_equal(m.T, ref_masks[k], err_msg=k)


def test_global_rand_pruner_density(ref_mods):
    """Rand scores are RNG-native per framework; parity is density only."""
    gp = ref_mods["gp"]
    model = TwoTower(seed=14)
    tb, jb = make_data(n_batches=2, seed=17)
    torch.manual_seed(99)
    ref_masks = _ref_global_prune(gp, gp.BLIPT5RandPruner, model, tb)
    our_masks = _our_global_masks("blipt5_rand_pruner", TwoTower(seed=14),
                                  jb, is_global=True)
    ref_total = sum(m.sum() for m in ref_masks.values())
    ref_n = sum(m.size for m in ref_masks.values())
    our_total = sum(m.sum() for m in our_masks.values())
    our_n = sum(m.size for m in our_masks.values())
    assert abs(ref_total / ref_n - our_total / our_n) < 0.02
