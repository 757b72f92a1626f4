"""Small shared utilities.

Counterpart of ``lavis/common/utils.py`` (440 LoC): job ids, URL checks,
cache-path helpers, the ``local_paths`` map of model snapshot directories
(reference :36-48 hard-codes HF snapshot dirs; here it is a registry-backed
mapping the CLI can extend via config)."""

from __future__ import annotations

import datetime
import os
import re
import urllib.parse
from typing import Dict, Optional

from vlm_compression_tpu.common.registry import registry


def now() -> str:
    """Job-id timestamp (reference utils.now())."""
    return datetime.datetime.now().strftime("%Y%m%d%H%M")[:-1]


def is_url(path: str) -> bool:
    return urllib.parse.urlparse(path).scheme in ("http", "https")


# local snapshot directories for pretrained weights/tokenizers — the
# offline equivalent of the reference's hard-coded `local_paths`
LOCAL_PATHS: Dict[str, str] = {}


def register_local_path(name: str, path: str) -> None:
    LOCAL_PATHS[name] = path


def get_local_path(name: str, default: Optional[str] = None
                   ) -> Optional[str]:
    return LOCAL_PATHS.get(name, default)


def get_cache_path(rel_path: str = "") -> str:
    root = registry.get_path("cache_root") if _has_path("cache_root") else \
        os.path.expanduser("~/.cache/vlm_compression_tpu")
    return os.path.join(root, rel_path)


def _has_path(name: str) -> bool:
    try:
        return registry.get_path(name) is not None
    except Exception:  # noqa: BLE001
        return False


def get_abs_path(rel_path: str) -> str:
    lib_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(lib_root, rel_path)


def cleanup_dir(path: str) -> None:
    import shutil

    if os.path.isdir(path):
        shutil.rmtree(path)


_CAMEL = re.compile(r"(?<!^)(?=[A-Z])")


def camel_to_snake(name: str) -> str:
    return _CAMEL.sub("_", name).lower()
