"""PyTorch checkpoint → JAX parameter-tree converters.

Counterpart of the reference's checkpoint loading path
(``train.py:369-400`` reloads per-tower .pth with prefix rewriting;
``blip2.py:94`` loads the pretrained InstructBLIP url; ``eva_vit.py:474``
downloads ``eva_vit_g.pth``) — converted to the flax trees this framework
uses.  All converters take a flat ``{name: np.ndarray}`` state dict (use
``load_torch_state_dict`` for .pth files) and return nested param dicts.

Layout notes:
  * torch nn.Linear stores (out, in); flax kernels are (in, out) → .T
  * torch Conv2d stores (out, in, kh, kw); flax (kh, kw, in, out)
  * T5 relative_attention_bias lives on block 0 only → stack-level rel_bias
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and isinstance(
            sd["model"], dict):
        sd = sd["model"]
    return {k: v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def _lin(sd, name, dtype=None):
    w = np.asarray(sd[name + ".weight"]).T
    out = {"kernel": w if dtype is None else w.astype(dtype)}
    if name + ".bias" in sd:
        out["bias"] = np.asarray(sd[name + ".bias"])
    return out


def _ln(sd, name):
    out = {"scale": np.asarray(sd[name + ".weight"])}
    if name + ".bias" in sd:
        out["bias"] = np.asarray(sd[name + ".bias"])
    return out


# ---------------------------------------------------------------------------
# T5 (HF modeling_t5 layout)
# ---------------------------------------------------------------------------


def convert_t5(sd: Dict[str, np.ndarray], num_layers: int,
               num_decoder_layers: int, tie_word_embeddings: bool = False
               ) -> Dict:
    """HF T5ForConditionalGeneration state dict → our tree."""
    p: Dict = {"shared": {"embedding": np.asarray(sd["shared.weight"])}}
    if not tie_word_embeddings and "lm_head.weight" in sd:
        p["lm_head"] = {"kernel": np.asarray(sd["lm_head.weight"]).T}

    for stack, n, is_dec in (("encoder", num_layers, False),
                             ("decoder", num_decoder_layers, True)):
        out = {"final_norm": {
            "scale": np.asarray(sd[f"{stack}.final_layer_norm.weight"])}}
        rel = f"{stack}.block.0.layer.0.SelfAttention." \
              "relative_attention_bias.weight"
        out["rel_bias"] = {"rel_embedding": np.asarray(sd[rel])}
        for i in range(n):
            b = f"{stack}.block.{i}."
            blk = {
                "self_attn": {k: _lin(sd, b + f"layer.0.SelfAttention.{k}")
                              for k in ("q", "k", "v", "o")},
                "ln_self": {"scale": np.asarray(
                    sd[b + "layer.0.layer_norm.weight"])},
            }
            ffn_j = 2 if is_dec else 1
            blk["ffn"] = {
                k: _lin(sd, b + f"layer.{ffn_j}.DenseReluDense.{k}")
                for k in ("wi_0", "wi_1", "wo")}
            blk["ln_ffn"] = {"scale": np.asarray(
                sd[b + f"layer.{ffn_j}.layer_norm.weight"])}
            if is_dec:
                blk["cross_attn"] = {
                    k: _lin(sd, b + f"layer.1.EncDecAttention.{k}")
                    for k in ("q", "k", "v", "o")}
                blk["ln_cross"] = {"scale": np.asarray(
                    sd[b + "layer.1.layer_norm.weight"])}
            out[f"blocks_{i}"] = blk
        p[stack] = out
    return p


# ---------------------------------------------------------------------------
# EVA ViT-g (reference eva_vit.py layout)
# ---------------------------------------------------------------------------


def convert_eva_vit(sd: Dict[str, np.ndarray], depth: int) -> Dict:
    conv_w = np.asarray(sd["patch_embed.proj.weight"])
    p: Dict = {
        "cls_token": np.asarray(sd["cls_token"]),
        "pos_embed": np.asarray(sd["pos_embed"]),
        "patch_embed": {
            "kernel": np.transpose(conv_w, (2, 3, 1, 0)),
            "bias": np.asarray(sd["patch_embed.proj.bias"]),
        },
    }
    for i in range(depth):
        b = f"blocks.{i}."
        p[f"blocks_{i}"] = {
            "norm1": _ln(sd, b + "norm1"),
            "norm2": _ln(sd, b + "norm2"),
            "attn": {
                "qkv": {"kernel": np.asarray(sd[b + "attn.qkv.weight"]).T},
                "q_bias": np.asarray(sd[b + "attn.q_bias"]),
                "v_bias": np.asarray(sd[b + "attn.v_bias"]),
                "proj": _lin(sd, b + "attn.proj"),
            },
            "mlp": {"fc1": _lin(sd, b + "mlp.fc1"),
                    "fc2": _lin(sd, b + "mlp.fc2")},
        }
    return p


# ---------------------------------------------------------------------------
# Q-Former (BERT layout, reference Qformer.py; prefix "bert." stripped)
# ---------------------------------------------------------------------------


def convert_qformer(sd: Dict[str, np.ndarray], num_layers: int,
                    cross_attention_freq: int = 2,
                    query_tokens: np.ndarray = None) -> Dict:
    def strip(d, prefix):
        return {k[len(prefix):]: v for k, v in d.items()
                if k.startswith(prefix)}

    if any(k.startswith("bert.") for k in sd):
        sd = {**strip(sd, "bert."),
              **{k: v for k, v in sd.items() if not k.startswith("bert.")}}

    p: Dict = {
        "word_embeddings": {"embedding": np.asarray(
            sd["embeddings.word_embeddings.weight"])},
        "position_embeddings": {"embedding": np.asarray(
            sd["embeddings.position_embeddings.weight"])},
        "emb_ln": _ln(sd, "embeddings.LayerNorm"),
    }
    if query_tokens is not None:
        p["query_tokens"] = np.asarray(query_tokens).reshape(
            1, *np.asarray(query_tokens).shape[-2:])

    def attention(prefix):
        return {
            "self": {k: _lin(sd, prefix + f".self.{k}")
                     for k in ("query", "key", "value")},
            "output_dense": _lin(sd, prefix + ".output.dense"),
            "output_ln": _ln(sd, prefix + ".output.LayerNorm"),
        }

    def ffn(inter, out):
        return {
            "intermediate_dense": _lin(sd, inter),
            "output_dense": _lin(sd, out + ".dense"),
            "output_ln": _ln(sd, out + ".LayerNorm"),
        }

    for i in range(num_layers):
        b = f"encoder.layer.{i}"
        layer = {"attention": attention(b + ".attention")}
        if i % cross_attention_freq == 0:
            layer["crossattention"] = attention(b + ".crossattention")
        # query ffn (always); text ffn when the text branch exists
        layer["ffn_query"] = ffn(b + ".intermediate_query.dense",
                                 b + ".output_query")
        if b + ".intermediate.dense.weight" in sd:
            layer["ffn"] = ffn(b + ".intermediate.dense", b + ".output")
        p[f"layers_{i}"] = layer
    return p


# ---------------------------------------------------------------------------
# LLaMA / Vicuna (HF layout)
# ---------------------------------------------------------------------------


def convert_llama(sd: Dict[str, np.ndarray], num_layers: int) -> Dict:
    def strip(k):
        return k[len("model."):] if k.startswith("model.") else k

    sd = {strip(k): v for k, v in sd.items()}
    p: Dict = {
        "embed_tokens": {"embedding": np.asarray(sd["embed_tokens.weight"])},
        "final_norm": {"scale": np.asarray(sd["norm.weight"])},
        "lm_head": {"kernel": np.asarray(sd["lm_head.weight"]).T},
    }
    for i in range(num_layers):
        b = f"layers.{i}."
        p[f"blocks_{i}"] = {
            "input_ln": {"scale": np.asarray(
                sd[b + "input_layernorm.weight"])},
            "post_attn_ln": {"scale": np.asarray(
                sd[b + "post_attention_layernorm.weight"])},
            "self_attn": {k: _lin(sd, b + f"self_attn.{k}")
                          for k in ("q_proj", "k_proj", "v_proj", "o_proj")},
            "mlp": {k: _lin(sd, b + f"mlp.{k}")
                    for k in ("gate_proj", "up_proj", "down_proj")},
        }
    return p


# ---------------------------------------------------------------------------
# InstructBLIP composite (reference trimmed checkpoints)
# ---------------------------------------------------------------------------


def convert_instructblip(sd: Dict[str, np.ndarray], model_cfg) -> Dict:
    """Composite .pth (visual_encoder.* / Qformer.* / query_tokens /
    t5_proj|llm_proj / t5_model|llm_model.*) → full params tree."""
    def sub(prefix):
        return {k[len(prefix):]: v for k, v in sd.items()
                if k.startswith(prefix)}

    params: Dict = {}
    vit_sd = sub("visual_encoder.")
    if vit_sd:
        params["visual_encoder"] = convert_eva_vit(
            vit_sd, depth=model_cfg.vit.depth)
    if "ln_vision.weight" in sd:
        params["ln_vision"] = _ln(sd, "ln_vision")
    q_sd = sub("Qformer.")
    if q_sd:
        params["qformer"] = convert_qformer(
            q_sd, num_layers=model_cfg.qformer.num_layers,
            cross_attention_freq=model_cfg.qformer.cross_attention_freq,
            query_tokens=sd.get("query_tokens"))
    if "t5_proj.weight" in sd:
        params["t5_proj"] = _lin(sd, "t5_proj")
    if "llm_proj.weight" in sd:
        params["llm_proj"] = _lin(sd, "llm_proj")
    t5_sd = sub("t5_model.")
    if t5_sd:
        params["t5_model"] = convert_t5(
            t5_sd, model_cfg.t5.num_layers, model_cfg.t5.num_decoder_layers,
            model_cfg.t5.tie_word_embeddings)
    llm_sd = sub("llm_model.")
    if llm_sd:
        params["llm_model"] = convert_llama(
            llm_sd, num_layers=model_cfg.llm.num_layers)
    return params


def cast_tree(tree, dtype_for=None):
    """Cast converted float leaves to each tower's param dtype."""
    import jax.numpy as jnp

    def walk(node, path=()):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        arr = jnp.asarray(node)
        if dtype_for is not None and jnp.issubdtype(arr.dtype, jnp.floating):
            dt = dtype_for(path)
            if dt is not None:
                arr = arr.astype(dt)
        return arr

    return walk(tree)
