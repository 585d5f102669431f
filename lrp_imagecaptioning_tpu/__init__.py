"""TPU-native image captioning with per-word LRP explanations.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of
SunJiamei/LRP-imagecaptioning-pytorch (mounted read-only at /root/reference):

- grid CNN encoders (VGG16 / ResNet-50/101) and bottom-up region features
- gridTD adaptive-attention two-LSTM decoder, AoA multi-head decoder, and the
  single-layer adaptive-attention decoder
- greedy / beam / diverse-beam / stochastic decoding as jitted ``lax.scan`` loops
- per-word LRP, Gradient, GuidedBackprop, Grad-CAM, Guided Grad-CAM explanations
  compiled as single XLA programs (reverse ``lax.scan`` relevance walks + explicit
  epsilon / alpha-beta relevance rules instead of autograd hooks)
- XE / SCST(CIDEr) / LRP / LRP-SCST fine-tuning modes
- caption metrics (BLEU, CIDEr, ROUGE-L, METEOR-lite) with no JVM dependency
- explanation-quality evaluation (ablation, bbox correctness, TP/FP AUC,
  hallucination mAP)
- data-parallel scaling via ``jax.sharding.Mesh`` + ``pjit`` collectives over ICI

Design stance: not a port.  The reference's per-token Python loops, autograd-hook
LRP and stash-everything explainer objects become pure functional models, scans
over time, explicit activation-stash pytrees and vectorized relevance rules.
"""

__version__ = "0.1.0"
