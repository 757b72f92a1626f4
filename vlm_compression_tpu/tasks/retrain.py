"""RESSA retraining: SparseLoRA + cross-modality knowledge distillation.

Counterpart of ``lavis/tasks/image_text_retrain.py:94-210``.  Per step the
reference runs the *same* model twice — once with ``vit_dense=True,
llm_dense=True`` under ``no_grad`` (the un-pruned weights act as the
teacher at zero extra parameter memory) and once sparse — then optimizes

    loss = (1 − w)·CE_student + w·KL(log_softmax(z_S/T) ‖ log_softmax(z_D/T))

with ``KLDivLoss(reduction="batchmean", log_target=True)``
(reference :141,160-176).

TPU-native design: teacher + student + grad + optimizer update are ONE
jitted SPMD program.  The teacher forward is a ``mode="dense"`` apply whose
output is wrapped in ``stop_gradient`` — no separate no-grad context, no
DDP object; gradient reduction is the implicit psum of the pjit'd step.
Only the ``lora`` collection is trainable (reference train.py:595-598
freezes everything but LoRA params); masks and base params ride along as
frozen state, so XLA keeps them device-resident across steps.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from vlm_compression_tpu.common.registry import registry
from vlm_compression_tpu.tasks.base import BaseTask


def kl_div_batchmean(student_logits, teacher_logits, T: float = 1.0):
    """torch.nn.KLDivLoss(reduction='batchmean', log_target=True) parity:
    sum over all elements of p_t·(log p_t − log p_s), divided by the
    leading (batch) dimension."""
    ls = jax.nn.log_softmax(student_logits.astype(jnp.float32) / T, axis=-1)
    lt = jax.nn.log_softmax(teacher_logits.astype(jnp.float32) / T, axis=-1)
    pt = jnp.exp(lt)
    return jnp.sum(pt * (lt - ls)) / student_logits.shape[0]


def kd_loss(ce_loss, student_logits, teacher_logits,
            kl_weight: float = 0.01, T: float = 2.0):
    """(1−w)·CE + w·KL (image_text_retrain.py:170-176)."""
    kl = kl_div_batchmean(student_logits, teacher_logits, T)
    return (1.0 - kl_weight) * ce_loss + kl_weight * kl, kl


class RessaTrainState(flax.struct.PyTreeNode):
    """Trainable lora + frozen {params, masks} + optimizer state."""

    step: jnp.ndarray
    lora: Any
    params: Any = flax.struct.field(pytree_node=True)
    masks: Any = flax.struct.field(pytree_node=True)
    opt_state: Any = flax.struct.field(pytree_node=True)

    @classmethod
    def create(cls, variables: dict, tx: optax.GradientTransformation):
        lora = variables.get("lora", {})
        return cls(
            step=jnp.zeros((), jnp.int32),
            lora=lora,
            params=variables["params"],
            masks=variables["masks"],
            opt_state=tx.init(lora),
        )

    def variables(self) -> dict:
        return {"params": self.params, "masks": self.masks, "lora": self.lora}


def make_kd_train_step(
    model,
    tx: optax.GradientTransformation,
    kl_weight: float = 0.01,
    T: float = 2.0,
    student_mode: str = "sparse_lora",
    apply_kwargs: Optional[Dict[str, Any]] = None,
    accum_grad_iters: int = 1,
) -> Callable:
    """Build the fused teacher+student+update step.

    Returns ``step(state, batch, lr) -> (state, metrics)`` — jit/pjit it
    with the caller's shardings.  ``batch`` is the model's kwargs dict
    (image, input_ids, attention_mask, labels, …).

    ``accum_grad_iters > 1`` reproduces the reference's gradient
    accumulation (``base_task.py:262-353``: per-micro-batch loss divided
    by k, optimizer stepped every k iters) TPU-natively: the incoming
    batch's leading dim is split into k equal micro-batches and a
    ``lax.scan`` runs teacher+student+grad per micro-batch, averaging
    gradients — ONE compiled program, one optimizer update, identical
    update to the reference's k-iteration loop (and to a single
    full-batch step, since mean-of-means == full mean at equal micro
    sizes).
    """
    extra = dict(apply_kwargs or {})
    accum = int(accum_grad_iters)

    def forward_and_grad(state, batch):
        teacher = model.apply(
            {"params": state.params}, **batch,
            vit_mode="dense", llm_mode="dense", qformer_mode="dense", **extra)
        t_logits = jax.lax.stop_gradient(teacher["logits"])

        def loss_fn(lora):
            out = model.apply(
                {"params": state.params, "masks": state.masks, "lora": lora},
                **batch, vit_mode=student_mode, llm_mode=student_mode,
                qformer_mode=student_mode, **extra)
            loss, kl = kd_loss(out["loss"], out["logits"], t_logits,
                               kl_weight, T)
            return loss, (out["loss"], kl)

        return jax.value_and_grad(loss_fn, has_aux=True)(state.lora)

    def step(state: RessaTrainState, batch: dict, lr):
        if accum == 1:
            (loss, (ce, kl)), grads = forward_and_grad(state, batch)
        else:
            micro = jax.tree.map(
                lambda x: x.reshape((accum, x.shape[0] // accum)
                                    + x.shape[1:]), batch)

            def body(carry, mb):
                g_acc, l_acc, c_acc, k_acc = carry
                (loss_i, (ce_i, kl_i)), g_i = forward_and_grad(state, mb)
                g_acc = jax.tree.map(jnp.add, g_acc, g_i)
                return (g_acc, l_acc + loss_i, c_acc + ce_i,
                        k_acc + kl_i), None

            zeros = jax.tree.map(
                lambda x: jnp.zeros_like(x, jnp.float32), state.lora)
            (grads, loss, ce, kl), _ = jax.lax.scan(
                body, (zeros, 0.0, 0.0, 0.0), micro)
            inv = 1.0 / accum
            grads = jax.tree.map(lambda g: g * inv, grads)
            loss, ce, kl = loss * inv, ce * inv, kl * inv

        opt_state = state.opt_state
        if hasattr(opt_state, "hyperparams"):
            opt_state.hyperparams["lr"] = jnp.asarray(
                lr, opt_state.hyperparams["lr"].dtype)
        updates, opt_state = tx.update(grads, opt_state, state.lora)
        lora = optax.apply_updates(state.lora, updates)
        new_state = state.replace(step=state.step + 1, lora=lora,
                                  opt_state=opt_state)
        metrics = {"loss": loss, "ce": ce, "kl": kl}
        return new_state, metrics

    return step


def merge_lora_into_params(params, masks, lora, cfgs_by_path=None,
                           sparse: bool = True, alpha: float = 16.0):
    """Post-training merge (reference train.py:626-637 + lora.py:384-394):
    ``W += (A·B·α/r)⊙M`` per LoRA'd linear; sparse=False densifies (the
    ablation).  Operates on the whole variable tree functionally."""
    from vlm_compression_tpu.ops.masked_linear import merge_sparse_lora

    def walk(p_node, m_node, l_node):
        if not isinstance(l_node, dict):
            return p_node
        out = dict(p_node)
        if "lora_a" in l_node:
            a, b = l_node["lora_a"], l_node["lora_b"]
            scale = alpha / a.shape[-1]
            mask = m_node["mask"] if (m_node and "mask" in m_node) else None
            if mask is None:
                mask = jnp.ones(p_node["kernel"].shape, bool)
            out["kernel"] = merge_sparse_lora(
                p_node["kernel"], mask, a, b, scale, sparse=sparse)
            return out
        for k, v in l_node.items():
            if k in p_node:
                out[k] = walk(p_node[k], (m_node or {}).get(k), v)
        return out

    return walk(params, masks, lora)


def apply_masks_to_params(params, masks):
    """Re-assert sparsity on the raw weights (reference train.py:634-637:
    ``W[~mask] = 0`` after the sparse merge)."""
    if not isinstance(masks, dict):
        return params
    out = dict(params)
    for k, v in masks.items():
        if k not in out:
            continue
        if isinstance(v, dict) and "mask" in v and isinstance(out[k], dict) \
                and "kernel" in out[k]:
            leaf = dict(out[k])
            leaf["kernel"] = jnp.where(
                v["mask"], leaf["kernel"],
                jnp.zeros((), leaf["kernel"].dtype))
            out[k] = leaf
        elif isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = apply_masks_to_params(out[k], v)
    return out


@registry.register_task("image_text_retrain")
class ImageTextRetrainTask(BaseTask):
    """Host-side orchestration of the KD retrain epoch
    (reference image_text_retrain.py:94-210)."""

    def __init__(self, kl_weight: float = 0.01, T: float = 2.0):
        super().__init__()
        self.kl_weight = kl_weight
        self.T = T

    @classmethod
    def setup_task(cls, cfg=None, **kwargs):
        run = getattr(cfg, "run_cfg", None) if cfg is not None else None
        get = ((run.get if hasattr(run, "get")
                else lambda k, d=None: getattr(run, k, d))
               if run is not None else (lambda k, d=None: d))
        return cls(kl_weight=float(get("kl_weight", 0.01)),
                   T=float(get("T", 2.0)))

    def make_train_step(self, model, tx, student_mode="sparse_lora",
                        accum_grad_iters: int = 1):
        return make_kd_train_step(model, tx, self.kl_weight, self.T,
                                  student_mode,
                                  accum_grad_iters=accum_grad_iters)
