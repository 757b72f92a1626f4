"""Tasks — train/eval logic bound to a model + datasets.

Counterpart of ``lavis/tasks/`` (SURVEY.md §2.4).  ``setup_task`` resolves
the registered task named in ``run_cfg.task``
(reference lavis/tasks/__init__.py:23).
"""

from vlm_compression_tpu.common.registry import registry
from vlm_compression_tpu.tasks import classification  # noqa: F401
from vlm_compression_tpu.tasks import dialogue_rc  # noqa: F401
from vlm_compression_tpu.tasks import pretrain  # noqa: F401
from vlm_compression_tpu.tasks import retrieval  # noqa: F401
from vlm_compression_tpu.tasks.base import BaseTask  # noqa: F401
from vlm_compression_tpu.tasks.captioning import CaptionTask  # noqa: F401
from vlm_compression_tpu.tasks.vqa import GQATask, VQATask  # noqa: F401
from vlm_compression_tpu.tasks.retrain import (  # noqa: F401
    ImageTextRetrainTask,
    RessaTrainState,
    kd_loss,
    kl_div_batchmean,
    make_kd_train_step,
)


def setup_task(cfg):
    run = cfg.run_cfg if hasattr(cfg, "run_cfg") else cfg
    name = run.get("task") if hasattr(run, "get") else getattr(run, "task")
    return registry.get_task_class(name).setup_task(cfg=cfg)
