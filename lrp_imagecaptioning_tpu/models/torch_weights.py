"""Convert reference PyTorch checkpoints to this framework's params.

Maps the reference models' ``state_dict`` layouts (GridTDModel / AOAModel /
AdaptiveAttentionCaptioningModel + their BU variants, and the VGG16/ResNet
encoders) onto our param structs so a user of the reference can load trained
weights directly (``checkpoint['state_dict']``, test.py:44-50).

Torch layouts are kept verbatim where we share conventions (Linear (out, in),
LSTM (4H, in) with i,f,g,o gate order); only conv kernels transpose
OIHW -> HWIO and 1x1 convs squeeze to Linear."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import ModelConfig
from .core import (
    AdaptiveAttentionParams,
    AdaptiveLSTMCellParams,
    LinearParams,
    LSTMCellParams,
)


def _np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _linear(sd, prefix, *, conv1x1=False) -> LinearParams:
    w = _np(sd[f"{prefix}.weight"])
    if conv1x1:  # (out, in, 1, 1) -> (out, in)
        w = w[:, :, 0, 0]
    b = sd.get(f"{prefix}.bias")
    return LinearParams(jnp.asarray(w), None if b is None else jnp.asarray(_np(b)))


def _lstm(sd, prefix) -> LSTMCellParams:
    return LSTMCellParams(
        w_ih=jnp.asarray(_np(sd[f"{prefix}.weight_ih"])),
        w_hh=jnp.asarray(_np(sd[f"{prefix}.weight_hh"])),
        b_ih=jnp.asarray(_np(sd[f"{prefix}.bias_ih"])),
        b_hh=jnp.asarray(_np(sd[f"{prefix}.bias_hh"])),
    )


def _embedding(sd, key, padded_vocab) -> jnp.ndarray:
    e = _np(sd[key])
    if e.shape[0] < padded_vocab:
        e = np.concatenate(
            [e, np.zeros((padded_vocab - e.shape[0], e.shape[1]), e.dtype)]
        )
    return jnp.asarray(e)


def _fc(sd, prefix, padded_vocab) -> LinearParams:
    w = _np(sd[f"{prefix}.weight"])
    b = _np(sd[f"{prefix}.bias"])
    if w.shape[0] < padded_vocab:
        pad = padded_vocab - w.shape[0]
        w = np.concatenate([w, np.zeros((pad, w.shape[1]), w.dtype)])
        b = np.concatenate([b, np.zeros(pad, b.dtype)])
    return LinearParams(jnp.asarray(w), jnp.asarray(b))


def _ada_attention(sd, prefix) -> AdaptiveAttentionParams:
    return AdaptiveAttentionParams(
        w_v_proj=_linear(sd, f"{prefix}.W_v_proj"),
        w_s_proj=_linear(sd, f"{prefix}.W_s_proj"),
        w_g_proj=_linear(sd, f"{prefix}.W_g_proj"),
        w_h=_linear(sd, f"{prefix}.w_h"),
    )


def convert_gridtd(sd: dict, cfg: ModelConfig):
    from .gridtd import GridTDParams

    return GridTDParams(
        embedding=_embedding(sd, "embedding.weight", cfg.padded_vocab),
        img_projector=_linear(sd, "img_projector", conv1x1=not cfg.is_bu),
        global_img_feature_proj=_linear(sd, "global_img_feature_proj"),
        ada_lstm=AdaptiveLSTMCellParams(
            lstm=_lstm(sd, "AdaLSTM.lstm_cell"),
            x_gate=_linear(sd, "AdaLSTM.x_gate"),
            h_gate=_linear(sd, "AdaLSTM.h_gate"),
        ),
        language_lstm=_lstm(sd, "LanguageLSTM"),
        ada_attention=_ada_attention(sd, "AdaAttention"),
        fc=_fc(sd, "fc", cfg.padded_vocab),
    )


def convert_aoa(sd: dict, cfg: ModelConfig):
    from .aoa import AOAParams

    return AOAParams(
        embedding=_embedding(sd, "embedding.weight", cfg.padded_vocab),
        img_projector=_linear(sd, "img_projector", conv1x1=not cfg.is_bu),
        language_lstm=_lstm(sd, "LanguageLSTM"),
        decoder_k_proj=_linear(sd, "decoder_k_proj"),
        decoder_v_proj=_linear(sd, "decoder_v_proj"),
        q_proj=_linear(sd, "decoder_multihead_attention.q_proj"),
        aoa_linear_gate=_linear(sd, "decoder_aoa_linear_gate"),
        aoa_linear=_linear(sd, "decoder_aoa_linear"),
        fc=_fc(sd, "fc", cfg.padded_vocab),
    )


def convert_adaptive(sd: dict, cfg: ModelConfig):
    from .adaptive import AdaptiveParams

    return AdaptiveParams(
        embedding=_embedding(sd, "embedding.weight", cfg.padded_vocab),
        img_projector=_linear(sd, "img_projector", conv1x1=True),
        global_img_feature_proj=_linear(sd, "global_img_feature_proj"),
        ada_lstm=AdaptiveLSTMCellParams(
            lstm=_lstm(sd, "AdaLSTM.lstm_cell"),
            x_gate=_linear(sd, "AdaLSTM.x_gate"),
            h_gate=_linear(sd, "AdaLSTM.h_gate"),
        ),
        ada_attention=_ada_attention(sd, "AdaAttention"),
        fc=_fc(sd, "fc", cfg.padded_vocab),
    )


def convert_encoder(sd: dict, cfg: ModelConfig):
    """Encoder sub-state (keys prefixed img_encoder.encoder.*)."""
    enc_sd = {k[len("img_encoder.encoder."):]: v for k, v in sd.items()
              if k.startswith("img_encoder.encoder.")}
    if not enc_sd:
        return None
    if cfg.encoder == "vgg16":
        from .encoders import load_torch_vgg16_state

        return load_torch_vgg16_state(
            {k: _np(v) for k, v in enc_sd.items()}
        )
    if cfg.encoder.startswith("resnet"):
        from .resnet import load_torch_resnet_state

        return load_torch_resnet_state(
            {k: _np(v) for k, v in enc_sd.items()}, cfg.encoder
        )
    return None


_CONVERTERS = {"gridtd": convert_gridtd, "aoa": convert_aoa,
               "adaptive": convert_adaptive}


def convert_state_dict(sd: dict, cfg: ModelConfig):
    """Full reference state_dict -> CaptionerParams."""
    from .captioner import CaptionerParams

    decoder = _CONVERTERS[cfg.model_type.replace("_bu", "")](sd, cfg)
    encoder = None if cfg.is_bu else convert_encoder(sd, cfg)
    return CaptionerParams(encoder, decoder)


def load_reference_checkpoint(path: str, cfg: ModelConfig):
    """Load a reference ``checkpoint_*.pth`` (torch.save dict with
    'state_dict', modelutils.py:131-138)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return convert_state_dict(sd, cfg)
