"""Golden mask parity against the reference's OWN torch code (VERDICT r2 #2).

Every other oracle test in this suite *transcribes* the reference math into
a local torch oracle; a transcription error would pass those tests and
silently blow the VQAv2 accuracy target.  This module closes that hole: it
loads the reference pruner modules from ``/root/reference`` directly
(importlib + light ``sys.modules`` stubs for their lavis/peft import
surface), drives each T5-layer pruner's real ``_prune`` end-to-end on a tiny
fp32 torch shell with fixed calibration batches, and asserts our JAX kernels
produce BIT-FOR-BIT equal masks from the same weights and the same
per-linear activation streams.

Reference code exercised un-rewritten:
  - WrappedGPT stats + Wanda mask build   (wanda_pruner.py:51-81, 276-354)
  - SparseGPT Hessian + fasterprune OBS   (sparsegpt_pruner.py:55-215, 405-459)
  - DSnoT stats + regrow/prune cycles     (dsnot_pruner.py:40-105, 313-770)

The shell replicates only the *plumbing* the pruners demand of a model
(``t5_model.encoder.block`` layout, ``config.use_cache``, ``maybe_autocast``,
the T5 kwargs the Catcher caches) — none of the scored math.
"""

import contextlib
import copy
import importlib.util
import os
import sys
import types
from unittest import mock

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from vlm_compression_tpu.ops import masks as mask_ops
from vlm_compression_tpu.ops import stats as stats_ops
from vlm_compression_tpu.ops.dsnot import dsnot_refine_mask
from vlm_compression_tpu.ops.sparsegpt import sparsegpt_prune

REF = "/root/reference"
PRUNERS_DIR = os.path.join(REF, "lavis", "compression", "pruners")

pytestmark = [
    pytest.mark.skipif(
        not os.path.isdir(PRUNERS_DIR), reason="reference snapshot not present"
    ),
    pytest.mark.slow,  # torch-side per-column python loops; ~seconds, not ms
]

# ---------------------------------------------------------------------------
# Reference module loading (no copying: the files execute from /root/reference)
# ---------------------------------------------------------------------------


def _passthrough_print_time(func):
    def wrapper(*args, **kwargs):
        return func(*args, **kwargs)

    return wrapper


class _LoraLinear(nn.Module):
    """Stub for peft lora.Linear: only an isinstance/type target here."""


class _LoraLayer:
    pass


class _Linear8bitLt(nn.Module):
    pass


def _stub_module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


@pytest.fixture(scope="module")
def ref_pruners():
    """Load the three reference pruner modules with their deps stubbed."""

    class _Registry:
        @staticmethod
        def register_pruner(name):
            def deco(cls):
                return cls

            return deco

    for pkg in ("lavis", "lavis.common", "lavis.compression",
                "lavis.compression.pruners", "lavis.peft", "lavis.peft.src",
                "lavis.peft.src.peft", "lavis.peft.src.peft.tuners"):
        if pkg not in sys.modules:
            m = _stub_module(pkg)
            m.__path__ = []
    _stub_module("lavis.common.registry", registry=_Registry())
    _stub_module(
        "lavis.compression.pruners.utils",
        print_time=_passthrough_print_time,
        loss_vision_language=None,
        loss_language=None,
        loss_vision=None,
    )

    class _LayerWiseBasePruner:
        pass

    class _LayerSparsity:
        pass

    _stub_module(
        "lavis.compression.pruners.layer_single_base_pruner",
        LayerWiseBasePruner=_LayerWiseBasePruner,
        LayerSparsity=_LayerSparsity,
    )
    _stub_module(
        "lavis.peft.src.peft.tuners.lora",
        Linear=_LoraLinear,
        LoraLayer=_LoraLayer,
        Linear8bitLt=_Linear8bitLt,
    )

    mods = {}
    for key in ("wanda", "sparsegpt", "dsnot"):
        path = os.path.join(PRUNERS_DIR, f"{key}_pruner.py")
        spec = importlib.util.spec_from_file_location(f"_ref_{key}_pruner", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mods[key] = mod
    return mods


# ---------------------------------------------------------------------------
# Torch shell: the minimal model surface the reference _prune path touches
# ---------------------------------------------------------------------------

D, FF, SEQ, NSAMP = 16, 32, 8, 4

T5_CACHE_KEYS = (
    "attention_mask", "position_bias", "encoder_attention_mask",
    "encoder_decoder_position_bias", "layer_head_mask",
    "cross_attn_layer_head_mask", "encoder_hidden_states",
)
_NONE_KW = {k: None for k in T5_CACHE_KEYS}


class ShellBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.q = nn.Linear(D, D, bias=False)
        self.wi = nn.Linear(D, FF, bias=False)
        self.wo = nn.Linear(FF, D, bias=False)

    def forward(self, hidden, attention_mask=None, position_bias=None,
                encoder_attention_mask=None, encoder_decoder_position_bias=None,
                layer_head_mask=None, cross_attn_layer_head_mask=None,
                encoder_hidden_states=None, dense=True, **kw):
        h = hidden + torch.tanh(self.q(hidden))
        h = h + self.wo(torch.relu(self.wi(h)))
        return (h,)


class ShellT5(nn.Module):
    def __init__(self, n_blocks):
        super().__init__()
        self.encoder = nn.Module()
        self.encoder.block = nn.ModuleList(ShellBlock() for _ in range(n_blocks))
        self.config = types.SimpleNamespace(use_cache=False)


class Shell(nn.Module):
    def __init__(self, n_blocks=2, seed=0):
        super().__init__()
        torch.manual_seed(seed)
        self.t5_model = ShellT5(n_blocks)

    def maybe_autocast(self, dtype=None):
        # reference maybe_autocast is a no-op off-CUDA (blip2.py:40-48)
        return contextlib.nullcontext()

    def run_calib(self, batch):
        h = batch["inputs_embeds"]
        for blk in self.t5_model.encoder.block:
            h = blk(h, **_NONE_KW)[0]
        return h


def make_batches(seed=1):
    g = torch.Generator().manual_seed(seed)
    return [
        {"inputs_embeds": torch.randn(1, SEQ, D, generator=g),
         "text_input": ["calib"]}
        for _ in range(NSAMP)
    ]


class UniformSparsity(dict):
    """Mirrors the reference's uniform-ratio fallback object
    (layer_single_base_pruner.py:251-255): same ratio for any key."""

    def __init__(self, ratio):
        super().__init__()
        self.ratio = ratio

    def __missing__(self, key):
        return self.ratio


def make_pruner(cls, **attrs):
    """Instantiate a reference pruner class without its heavyweight __init__
    (which wants a live model + data loader); set only the attributes the
    _prune path reads."""
    p = object.__new__(cls)
    for k, v in attrs.items():
        setattr(p, k, v)
    return p


def ref_linears(shell):
    """[(block_idx, name, module)] in the reference's find_layers order."""
    out = []
    for bi, blk in enumerate(shell.t5_model.encoder.block):
        for name, mod in blk.named_modules():
            if isinstance(mod, nn.Linear):
                out.append((bi, name, mod))
    return out


def capture_linear_inputs(pruned_shell, orig_shell, batches):
    """Per-linear activation streams exactly as the reference's hooks saw
    them: block i's stats pass runs with block i's weights still ORIGINAL
    (hooks fire during the pre-mask replay), while its inputs come from
    blocks < i already pruned/updated.  So: capture block i on the original
    block, then propagate to block i+1 through the pruned block."""
    store = {}
    h_list = [b["inputs_embeds"] for b in batches]
    pruned_blocks = pruned_shell.t5_model.encoder.block
    orig_blocks = orig_shell.t5_model.encoder.block
    with torch.no_grad():
        for bi, (pblk, oblk) in enumerate(zip(pruned_blocks, orig_blocks)):
            hooks = []
            for name, mod in oblk.named_modules():
                if isinstance(mod, nn.Linear):
                    def mk(key):
                        def hook(_m, inp, _out):
                            store.setdefault(key, []).append(
                                inp[0].detach().to(torch.float32).numpy())
                        return hook
                    hooks.append(mod.register_forward_hook(mk((bi, name))))
            for h in h_list:
                oblk(h, **_NONE_KW)
            for h in hooks:
                h.remove()
            h_list = [pblk(h, **_NONE_KW)[0] for h in h_list]
    return store


def our_stats(xs, with_hessian=False):
    st = stats_ops.init_calib_stats(xs[0].shape[-1], with_hessian=with_hessian)
    for x in xs:
        st = stats_ops.update_calib_stats(st, jnp.asarray(x))
    return st


# ---------------------------------------------------------------------------
# Wanda
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("prune_n,prune_m", [(0, 0), (2, 4)])
def test_wanda_masks_bit_for_bit(ref_pruners, prune_n, prune_m):
    wanda = ref_pruners["wanda"]
    shell = Shell(n_blocks=2, seed=0)
    orig = copy.deepcopy(shell)
    batches = make_batches()

    pruner = make_pruner(
        wanda.T5LayerWandaPruner,
        prune_n=prune_n, prune_m=prune_m, model_prefix="t5_model",
        forward_to_cache=lambda model, batch, lora_model=False:
            model.run_calib(batch),
    )
    with torch.no_grad():
        pruner._prune(
            shell, batches, model_prefix="t5_model",
            module_to_process="t5_model.encoder.block",
            n_samples=NSAMP, sparsity_ratio=UniformSparsity(0.5),
            lora_model=False,
        )

    streams = capture_linear_inputs(shell, orig, batches)
    orig_mods = {(bi, n): m for bi, n, m in ref_linears(orig)}
    for bi, name, mod in ref_linears(shell):
        ref_keep = mod.mask.numpy()  # reference stores keep-mask (~W_mask)
        W0 = jnp.asarray(orig_mods[(bi, name)].weight.data.numpy())
        st = our_stats(streams[(bi, name)])
        metric = mask_ops.wanda_metric(W0, st.scaler_row)
        if prune_n:
            ours = mask_ops.nm_structured_mask(metric, prune_n, prune_m)
        else:
            ours = mask_ops.unstructured_mask(metric, 0.5)
        np.testing.assert_array_equal(
            np.asarray(ours), ref_keep,
            err_msg=f"wanda mask mismatch at block {bi} linear {name}")
        # the reference also zeroed the pruned weights (lora_model=False)
        assert (mod.weight.data.numpy()[~ref_keep] == 0).all()


# ---------------------------------------------------------------------------
# SparseGPT
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("prune_n,prune_m", [(0, 0), (2, 4)])
def test_sparsegpt_masks_bit_for_bit(ref_pruners, prune_n, prune_m):
    spg = ref_pruners["sparsegpt"]
    shell = Shell(n_blocks=2, seed=2)
    orig = copy.deepcopy(shell)
    batches = make_batches(seed=3)

    pruner = make_pruner(
        spg.T5LayerSparseGPTPruner,
        prune_n=prune_n, prune_m=prune_m, model_prefix="t5_model",
        forward_to_cache=lambda model, batch: model.run_calib(batch),
    )
    # fasterprune ends with torch.cuda.synchronize(), which raises on a
    # CPU-only torch build — stub it for the reference run only.
    with torch.no_grad(), mock.patch("torch.cuda.synchronize", lambda: None):
        pruner._prune(
            shell, batches, "cpu", model_prefix="t5_model",
            module_to_process="t5_model.encoder.block",
            n_samples=NSAMP, sparsity_ratio=UniformSparsity(0.5),
        )

    streams = capture_linear_inputs(shell, orig, batches)
    orig_mods = {(bi, n): m for bi, n, m in ref_linears(orig)}
    for bi, name, mod in ref_linears(shell):
        W_ref = mod.weight.data.numpy()
        ref_keep = W_ref != 0  # fasterprune zeroes pruned entries in place
        W0 = jnp.asarray(orig_mods[(bi, name)].weight.data.numpy())
        st = our_stats(streams[(bi, name)], with_hessian=True)
        H = stats_ops.finalize_hessian(st)
        res = sparsegpt_prune(W0, H, 0.5, prune_n=prune_n, prune_m=prune_m,
                              blocksize=128)
        np.testing.assert_array_equal(
            np.asarray(res.keep_mask), ref_keep,
            err_msg=f"sparsegpt mask mismatch at block {bi} linear {name}")
        # OBS-updated weights agree to fp32 linalg tolerance (different
        # but equivalent factorization routes)
        np.testing.assert_allclose(
            np.asarray(res.weight), W_ref, rtol=5e-3, atol=5e-4,
            err_msg=f"sparsegpt weight mismatch at block {bi} linear {name}")


# ---------------------------------------------------------------------------
# DSnoT
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("prune_n,prune_m", [(0, 0), (2, 4)])
def test_dsnot_masks_bit_for_bit(ref_pruners, prune_n, prune_m):
    dsn = ref_pruners["dsnot"]
    shell = Shell(n_blocks=2, seed=4)
    orig = copy.deepcopy(shell)
    batches = make_batches(seed=5)

    # max_cycle_time must stay below the narrowest linear's in-features here:
    # the reference's two-pointer walk advances one slot per cycle and
    # torch.gather RAISES once a pointer runs off the candidate list (UB the
    # reference never hits at production widths; our kernel clamps instead —
    # ops/dsnot.py body).  6 cycles < 16 columns keeps its own loop defined.
    pruner = make_pruner(
        dsn.T5LayerDSnoTPruner,
        prune_n=prune_n, prune_m=prune_m, model_prefix="t5_model",
        initial_method="wanda", pow_of_var_regrowing=1.0,
        max_cycle_time=6, update_threshold=0.02,
        without_same_sign=True, without_DSnoT=False,
        forward_to_cache=lambda model, batch, lora_model=False:
            model.run_calib(batch),
    )
    with torch.no_grad():
        pruner._prune(
            shell, batches, "cpu", model_prefix="t5_model",
            module_to_process="t5_model.encoder.block",
            n_samples=NSAMP, sparsity_ratio=UniformSparsity(0.5),
            lora_model=False,
        )

    streams = capture_linear_inputs(shell, orig, batches)
    orig_mods = {(bi, n): m for bi, n, m in ref_linears(orig)}
    for bi, name, mod in ref_linears(shell):
        ref_keep = mod.mask.numpy()
        W0 = jnp.asarray(orig_mods[(bi, name)].weight.data.numpy())
        st = our_stats(streams[(bi, name)])
        res = dsnot_refine_mask(
            W0, st.scaler_row, st.sum_metric_row, st.var, 0.5,
            prune_n=prune_n, prune_m=prune_m, max_cycle_time=6,
            update_threshold=0.02, pow_of_var_regrowing=1.0,
            without_same_sign=True, initial_method="wanda",
        )
        np.testing.assert_array_equal(
            np.asarray(res.keep_mask), ref_keep,
            err_msg=f"dsnot mask mismatch at block {bi} linear {name}")
