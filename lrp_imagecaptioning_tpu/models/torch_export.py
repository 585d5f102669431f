"""Export this framework's params to the reference's checkpoint schema.

Inverse of :mod:`.torch_weights`: a model trained here can be written as a
``checkpoint_*.pth`` the reference loads verbatim
(``model.load_state_dict(checkpoint['state_dict'])``, test.py:44-50;
writer schema ``modelutils.py:115-144``), closing the interop loop — the
reference's own harness can validate a TPU-trained model.

Key-set parity is exact per family (verified against the living reference's
``state_dict()`` in tests/test_torch_export.py, strict ``load_state_dict``).
Two reference-module artifacts the framework deliberately has no params for
are emitted as placeholders:

- ResNet's unused classifier head ``fc`` (present in the module tree but
  commented out of the forward, reference resnet.py:232-236) — zeros;
- BatchNorm ``num_batches_tracked`` buffers — zeros (torch also tolerates
  their absence, but emitting them keeps ``torch.load`` diffs clean).
"""

from __future__ import annotations

import numpy as np

from ..config import ModelConfig


def _t(a, transpose=None):
    import torch

    a = np.asarray(a, dtype=np.float32)
    if transpose is not None:
        a = a.transpose(transpose)
    # copy: jax arrays expose read-only buffers torch would warn about
    return torch.from_numpy(np.array(a, dtype=np.float32, copy=True))


def _put_linear(out, prefix, p, *, conv1x1=False):
    w = np.asarray(p.weight)
    if conv1x1:  # (out, in) -> (out, in, 1, 1)
        w = w[:, :, None, None]
    out[f"{prefix}.weight"] = _t(w)
    if p.bias is not None:
        out[f"{prefix}.bias"] = _t(p.bias)


def _put_lstm(out, prefix, p):
    out[f"{prefix}.weight_ih"] = _t(p.w_ih)
    out[f"{prefix}.weight_hh"] = _t(p.w_hh)
    out[f"{prefix}.bias_ih"] = _t(p.b_ih)
    out[f"{prefix}.bias_hh"] = _t(p.b_hh)


def _put_ada_attention(out, prefix, p):
    _put_linear(out, f"{prefix}.W_v_proj", p.w_v_proj)
    _put_linear(out, f"{prefix}.W_s_proj", p.w_s_proj)
    _put_linear(out, f"{prefix}.W_g_proj", p.w_g_proj)
    _put_linear(out, f"{prefix}.w_h", p.w_h)


def _unpad_embedding(e, vocab):
    return _t(np.asarray(e)[:vocab])


def _unpad_fc(out, p, vocab):
    out["fc.weight"] = _t(np.asarray(p.weight)[:vocab])
    out["fc.bias"] = _t(np.asarray(p.bias)[:vocab])


def export_gridtd(d, cfg: ModelConfig) -> dict:
    out: dict = {}
    _put_linear(out, "img_projector", d.img_projector, conv1x1=not cfg.is_bu)
    _put_linear(out, "global_img_feature_proj", d.global_img_feature_proj)
    _put_lstm(out, "LanguageLSTM", d.language_lstm)
    _put_lstm(out, "AdaLSTM.lstm_cell", d.ada_lstm.lstm)
    _put_linear(out, "AdaLSTM.x_gate", d.ada_lstm.x_gate)
    _put_linear(out, "AdaLSTM.h_gate", d.ada_lstm.h_gate)
    _put_ada_attention(out, "AdaAttention", d.ada_attention)
    out["embedding.weight"] = _unpad_embedding(d.embedding, cfg.vocab_size)
    _unpad_fc(out, d.fc, cfg.vocab_size)
    return out


def export_adaptive(d, cfg: ModelConfig) -> dict:
    out: dict = {}
    _put_linear(out, "img_projector", d.img_projector, conv1x1=True)
    _put_linear(out, "global_img_feature_proj", d.global_img_feature_proj)
    _put_lstm(out, "AdaLSTM.lstm_cell", d.ada_lstm.lstm)
    _put_linear(out, "AdaLSTM.x_gate", d.ada_lstm.x_gate)
    _put_linear(out, "AdaLSTM.h_gate", d.ada_lstm.h_gate)
    _put_ada_attention(out, "AdaAttention", d.ada_attention)
    out["embedding.weight"] = _unpad_embedding(d.embedding, cfg.vocab_size)
    _unpad_fc(out, d.fc, cfg.vocab_size)
    return out


def export_aoa(d, cfg: ModelConfig) -> dict:
    out: dict = {}
    _put_linear(out, "img_projector", d.img_projector, conv1x1=not cfg.is_bu)
    out["embedding.weight"] = _unpad_embedding(d.embedding, cfg.vocab_size)
    _put_lstm(out, "LanguageLSTM", d.language_lstm)
    _put_linear(out, "decoder_k_proj", d.decoder_k_proj)
    _put_linear(out, "decoder_v_proj", d.decoder_v_proj)
    _put_linear(out, "decoder_multihead_attention.q_proj", d.q_proj)
    _put_linear(out, "decoder_aoa_linear_gate", d.aoa_linear_gate)
    _put_linear(out, "decoder_aoa_linear", d.aoa_linear)
    _unpad_fc(out, d.fc, cfg.vocab_size)
    return out


def export_vgg16_encoder(enc) -> dict:
    """VGGParams -> ``img_encoder.encoder.{seq_idx}.{weight,bias}`` (the
    reference wraps ``vgg16().features[0:-1]``, gridTDmodel.py:33-35; conv
    positions follow torchvision's cfg-D Sequential numbering)."""
    from .encoders import VGG16_CFG

    out: dict = {}
    pos = 0
    ci = 0
    for v in VGG16_CFG:
        if v == "M":
            pos += 1
            continue
        p = enc.convs[ci]
        out[f"img_encoder.encoder.{pos}.weight"] = _t(
            p.weight, transpose=(3, 2, 0, 1))  # HWIO -> OIHW
        out[f"img_encoder.encoder.{pos}.bias"] = _t(p.bias)
        ci += 1
        pos += 2  # conv + relu
    return out


def export_resnet_encoder(enc, arch: str) -> dict:
    """ResNetParams -> reference resnet state_dict (raw BN params + running
    stats; requires params converted/trained with raw BN retained)."""
    import torch

    out: dict = {}

    def put_cbn(prefix_conv, prefix_bn, p):
        if not p.has_raw_bn:
            raise ValueError(
                "ResNet export needs raw BN params (gamma/beta/mean/var); "
                "this ConvBN only has the folded affine form")
        out[f"{prefix_conv}.weight"] = _t(p.weight, transpose=(3, 2, 0, 1))
        out[f"{prefix_bn}.weight"] = _t(p.gamma)
        out[f"{prefix_bn}.bias"] = _t(p.beta)
        out[f"{prefix_bn}.running_mean"] = _t(p.mean)
        out[f"{prefix_bn}.running_var"] = _t(p.var)
        out[f"{prefix_bn}.num_batches_tracked"] = torch.zeros((), dtype=torch.long)

    put_cbn("conv1", "bn1", enc.stem)
    for stage_idx, stage in enumerate(enc.layers):
        for b, blk in enumerate(stage):
            pre = f"layer{stage_idx + 1}.{b}"
            put_cbn(f"{pre}.conv1", f"{pre}.bn1", blk.conv1)
            put_cbn(f"{pre}.conv2", f"{pre}.bn2", blk.conv2)
            put_cbn(f"{pre}.conv3", f"{pre}.bn3", blk.conv3)
            if blk.downsample is not None:
                put_cbn(f"{pre}.downsample.0", f"{pre}.downsample.1",
                        blk.downsample)
    # unused classifier head kept in the reference module tree
    # (resnet.py:176-177, forward commented out :232-234) — zeros
    feat = np.asarray(enc.layers[-1][-1].conv3.gamma).shape[0]
    out["fc.weight"] = _t(np.zeros((1000, feat), np.float32))
    out["fc.bias"] = _t(np.zeros((1000,), np.float32))
    return {f"img_encoder.encoder.{k}": v for k, v in out.items()}


_EXPORTERS = {"gridtd": export_gridtd, "aoa": export_aoa,
              "adaptive": export_adaptive}


def export_state_dict(params, cfg: ModelConfig) -> dict:
    """CaptionerParams -> reference model ``state_dict`` (torch tensors)."""
    family = cfg.model_type.replace("_bu", "")
    out = _EXPORTERS[family](params.decoder, cfg)
    if not cfg.is_bu and params.encoder is not None:
        if cfg.encoder == "vgg16":
            out.update(export_vgg16_encoder(params.encoder))
        elif cfg.encoder.startswith("resnet"):
            out.update(export_resnet_encoder(params.encoder, cfg.encoder))
    return out


def export_reference_checkpoint(
    path: str, params, cfg: ModelConfig, *, epoch: int = 0,
    epochs_since_improvement: int = 0, bleu4: float = 0.0, cider: float = 0.0,
) -> str:
    """Write a reference-schema ``.pth`` (modelutils.py:131-138: {'epoch',
    'epochs_since_improvement', 'bleu-4', 'cider', 'state_dict',
    'optimizer'}).  The optimizer slot is None — the reference's eval/resume
    paths read it only when continuing its own Adam run."""
    import torch

    state = {
        "epoch": epoch,
        "epochs_since_improvement": epochs_since_improvement,
        "bleu-4": bleu4,
        "cider": cider,
        "state_dict": export_state_dict(params, cfg),
        "optimizer": None,
    }
    torch.save(state, path)
    return path
