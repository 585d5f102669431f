from .rules import (
    EPSILON,
    lrp_elem_eps,
    lrp_linear_eps,
    normalize_relevance,
    stabilize,
)
from .explainer import (
    CaptionExplanation,
    GridTDExplainerBase,
    GridTDGradCamExplainer,
    GridTDGradientExplainer,
    GridTDGuidedGradCamExplainer,
    GridTDGuidedGradientExplainer,
    GridTDLrpExplainer,
)

EXPLAINER_REGISTRY = {
    "lrp": GridTDLrpExplainer,
    "gradient": GridTDGradientExplainer,
    "guided_gradient": GridTDGuidedGradientExplainer,
    "grad_cam": GridTDGradCamExplainer,
    "guided_grad_cam": GridTDGuidedGradCamExplainer,
}
