from .rules import (
    EPSILON,
    lrp_elem_eps,
    lrp_linear_eps,
    normalize_relevance,
    stabilize,
)
