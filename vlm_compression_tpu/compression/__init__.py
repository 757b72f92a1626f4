"""Compression subsystem: calibration engine, pruners, sparsity allocator.

Counterpart of ``lavis/compression/`` (SURVEY.md §2.1).  ``load_pruner``
resolves a registered pruner by name and instantiates it with config kwargs
(reference lavis/compression/__init__.py:29-46).
"""

from vlm_compression_tpu.common.registry import registry


def load_pruner(name: str, model, data_loader, cfg=None, **kwargs):
    cls = registry.get_pruner_class(name)
    cfg = dict(cfg or {})
    cfg.update(kwargs)
    return cls(model=model, data_loader=data_loader, **cfg)


# register pruners on import
from vlm_compression_tpu.compression import pruners  # noqa: E402,F401
