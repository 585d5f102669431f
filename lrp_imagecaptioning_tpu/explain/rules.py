"""Relevance-rule primitives — re-exported from :mod:`..ops.relevance`
(kept importable from both the models package and the explainers without an
import cycle)."""

from ..ops.relevance import (  # noqa: F401
    EPSILON,
    RELEVANCE_RECT,
    Z_EPSILON,
    lrp_elem_eps,
    lrp_linear_eps,
    lrp_linear_eps_onehot,
    normalize_relevance,
    safe_divide,
    stabilize,
)
