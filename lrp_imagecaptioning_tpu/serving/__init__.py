"""Production serving layer — dynamic request batching into the repo's
fixed-shape compiled TPU programs.

The reference has no serving story (its entry points are offline scripts,
``test.py:12``, ``gridTDmodel.py:1141``); this subsystem is the
deployment-facing surface the TPU build adds: a request queue that coalesces
concurrent caption / explanation requests into one dispatch of the cached
fixed-shape batched program (``explain/explainer.py:batched_core``), padding
partial batches so a single compiled executable serves every load level.

Components:

- :class:`BatchingEngine` — generic dynamic batcher (futures, max-delay
  window, latency/batch-occupancy stats),
- :class:`CaptionService` / :class:`ExplainService` — model-facing services
  wrapping the jitted decode / caption+explanation programs,
- :func:`make_http_server` — stdlib JSON-over-HTTP front end
  (``/caption``, ``/explain``, ``/healthz``, ``/stats``),
- root ``serve.py`` — the CLI entry point.
"""

from .engine import BatchingEngine, EngineStats
from .service import CaptionService, ExplainService, explanation_payload
from .http_api import make_http_server

__all__ = [
    "BatchingEngine",
    "EngineStats",
    "CaptionService",
    "ExplainService",
    "explanation_payload",
    "make_http_server",
]
