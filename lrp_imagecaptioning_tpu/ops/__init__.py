from .relevance import (
    EPSILON,
    RELEVANCE_RECT,
    Z_EPSILON,
    lrp_elem_eps,
    lrp_linear_eps,
    normalize_relevance,
    safe_divide,
    stabilize,
)
