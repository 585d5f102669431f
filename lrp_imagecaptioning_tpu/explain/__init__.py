from .rules import (
    EPSILON,
    lrp_elem_eps,
    lrp_linear_eps,
    normalize_relevance,
    stabilize,
)
from .explainer import (
    AdaptiveGradCamExplainer,
    AdaptiveGuidedGradCamExplainer,
    AOAGuidedGradCamExplainer,
    AdaptiveGradientExplainer,
    AdaptiveGuidedGradientExplainer,
    AdaptiveLrpExplainer,
    AOAGradCamExplainer,
    AOAGradientExplainer,
    AOAGuidedGradientExplainer,
    AOAAllHeadsLrpExplainer,
    AOALrpExplainer,
    CaptionExplanation,
    GridTDExplainerBase,
    GridTDGradCamExplainer,
    GridTDGradientExplainer,
    GridTDGuidedGradCamExplainer,
    GridTDGuidedGradientExplainer,
    GridTDLrpExplainer,
)

EXPLAINER_REGISTRY = {
    "gridtd": {
        "lrp": GridTDLrpExplainer,
        "gradient": GridTDGradientExplainer,
        "guided_gradient": GridTDGuidedGradientExplainer,
        "grad_cam": GridTDGradCamExplainer,
        "guided_grad_cam": GridTDGuidedGradCamExplainer,
    },
    "aoa": {
        "lrp": AOALrpExplainer,
        "lrp_all_heads": AOAAllHeadsLrpExplainer,
        "gradient": AOAGradientExplainer,
        "guided_gradient": AOAGuidedGradientExplainer,
        "grad_cam": AOAGradCamExplainer,
        "guided_grad_cam": AOAGuidedGradCamExplainer,
    },
    "adaptive": {
        "lrp": AdaptiveLrpExplainer,
        "gradient": AdaptiveGradientExplainer,
        "guided_gradient": AdaptiveGuidedGradientExplainer,
        "grad_cam": AdaptiveGradCamExplainer,
        "guided_grad_cam": AdaptiveGuidedGradCamExplainer,
    },
}


def build_explainer(explainer_type: str, captioner, params, word_map, **kw):
    """Factory keyed by (model family, explainer type)."""
    family = captioner.cfg.model_type.replace("_bu", "")
    try:
        cls = EXPLAINER_REGISTRY[family][explainer_type]
    except KeyError:
        raise KeyError(
            f"no {explainer_type!r} explainer for model family {family!r}; "
            f"have {sorted(EXPLAINER_REGISTRY.get(family, {}))}"
        ) from None
    return cls(captioner, params, word_map, **kw)
