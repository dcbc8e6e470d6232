"""Optional-dependency seams — one place that decides, per capability,
whether the real library path or the deterministic stub runs.

The container ships no parser/model libraries (unstructured, PIL,
torch/sentence-transformers), so every model-shaped operator runs a
deterministic stand-in with the REAL Spark plumbing (schema,
partitioning, Arrow batch shape). The day a library appears, the
matching seam lights up without code changes: resolution happens at
call time via ``optional_import``, on the executor that runs the batch.

Reference integration points:
- S1/S2 parse   → unstructured.partition.auto
  (document_processor.py:310-468)
- multimodal decode → PIL / ffmpeg (document_processor.py:239-308)
- M1 dense embed → sentence_transformers
  (dense_embedder.py:27-78)
"""

from __future__ import annotations

import importlib
import sys
from typing import Any

# absent-module probe results; importlib caches successes in
# sys.modules, this caches the (cheaper to skip) failures
_MISSING: set[str] = set()


def optional_import(name: str) -> Any | None:
    """Import ``name`` if available, else None — never raises on a
    missing dependency, so stub fallbacks stay decidable at call time
    on whatever machine (driver or executor) runs the code."""
    if name in sys.modules:  # already loaded (or injected) wins over
        return sys.modules[name]  # any earlier negative probe
    if name in _MISSING:
        return None
    try:
        return importlib.import_module(name)
    except ImportError:
        _MISSING.add(name)
        return None


def have(name: str) -> bool:
    return optional_import(name) is not None
