"""Stage-2 image-text pretraining task (plain CE, no KD).

Counterpart of ``lavis/tasks/image_text_pretrain.py`` — the task named by
``prune_stage2_t5_instruct.yaml`` for calibration-data loading and by
stage-2 training runs.  The train step is the student-only half of the
RESSA step."""

from __future__ import annotations

from typing import Callable

import jax
import optax

from vlm_compression_tpu.common.registry import registry
from vlm_compression_tpu.tasks.base import BaseTask
from vlm_compression_tpu.tasks.retrain import RessaTrainState


@registry.register_task("image_text_pretrain")
class ImageTextPretrainTask(BaseTask):
    @classmethod
    def setup_task(cls, cfg=None, **kw):
        return cls()

    def make_train_step(self, model, tx: optax.GradientTransformation,
                        student_mode: str = "sparse_lora") -> Callable:
        def step(state: RessaTrainState, batch: dict, lr):
            def loss_fn(lora):
                out = model.apply(
                    {"params": state.params, "masks": state.masks,
                     "lora": lora},
                    **batch, vit_mode=student_mode, llm_mode=student_mode,
                    qformer_mode=student_mode)
                return out["loss"]

            loss, grads = jax.value_and_grad(loss_fn)(state.lora)
            opt_state = state.opt_state
            if hasattr(opt_state, "hyperparams"):
                import jax.numpy as jnp

                opt_state.hyperparams["lr"] = jnp.asarray(
                    lr, opt_state.hyperparams["lr"].dtype)
            updates, opt_state = tx.update(grads, opt_state, state.lora)
            lora = optax.apply_updates(state.lora, updates)
            return state.replace(step=state.step + 1, lora=lora,
                                 opt_state=opt_state), {"loss": loss}

        return step
