"""Weight conversion: a random reference-layout state_dict converted to our
params must produce the same decoder step as torch computing the reference
formulas (predict_next_word, gridTDmodel.py:137-144)."""

import jax.numpy as jnp
import numpy as np
import torch

from lrp_imagecaptioning_tpu.config import ModelConfig
from lrp_imagecaptioning_tpu.models import gridtd
from lrp_imagecaptioning_tpu.models.torch_weights import (
    convert_aoa,
    convert_gridtd,
)

E, H, V, P, RAW = 8, 12, 20, 5, 6


def _lin_sd(sd, prefix, out, inn, rng, bias=True):
    sd[f"{prefix}.weight"] = torch.tensor(
        rng.normal(size=(out, inn)).astype(np.float32))
    if bias:
        sd[f"{prefix}.bias"] = torch.tensor(
            rng.normal(size=out).astype(np.float32))


def _lstm_sd(sd, prefix, inn, hid, rng):
    for name, shape in [("weight_ih", (4 * hid, inn)), ("weight_hh", (4 * hid, hid)),
                        ("bias_ih", (4 * hid,)), ("bias_hh", (4 * hid,))]:
        sd[f"{prefix}.{name}"] = torch.tensor(
            rng.normal(size=shape).astype(np.float32) * 0.3)


def make_gridtd_sd(rng):
    sd = {}
    sd["embedding.weight"] = torch.tensor(
        rng.normal(size=(V, E)).astype(np.float32))
    sd["img_projector.weight"] = torch.tensor(
        rng.normal(size=(H, RAW, 1, 1)).astype(np.float32))
    sd["img_projector.bias"] = torch.tensor(
        rng.normal(size=H).astype(np.float32))
    _lin_sd(sd, "global_img_feature_proj", E, RAW, rng)
    _lstm_sd(sd, "AdaLSTM.lstm_cell", 2 * E + H, H, rng)
    _lin_sd(sd, "AdaLSTM.x_gate", H, 2 * E + H, rng)
    _lin_sd(sd, "AdaLSTM.h_gate", H, H, rng)
    _lstm_sd(sd, "LanguageLSTM", 2 * H, H, rng)
    _lin_sd(sd, "AdaAttention.W_v_proj", P, H, rng)
    _lin_sd(sd, "AdaAttention.W_s_proj", P, H, rng)
    _lin_sd(sd, "AdaAttention.W_g_proj", P, H, rng, bias=False)
    _lin_sd(sd, "AdaAttention.w_h", 1, P, rng, bias=False)
    _lin_sd(sd, "fc", V, H, rng)
    return sd


def torch_gridtd_step(sd, raw, avg, token, state):
    """Reference predict_next_word computed with torch primitives."""
    def lin(prefix, x, bias=True):
        w = sd[f"{prefix}.weight"]
        if w.dim() == 4:
            w = w[:, :, 0, 0]
        y = x @ w.t()
        if bias and f"{prefix}.bias" in sd:
            y = y + sd[f"{prefix}.bias"]
        return y

    v_proj = torch.relu(lin("img_projector", raw))  # (1, P, H)
    glob = torch.relu(lin("global_img_feature_proj", avg))  # (1, E)
    h1, c1, h2, c2 = state
    emb = sd["embedding.weight"][token][None]
    x1 = torch.cat([h2, glob, emb], -1)
    z = (x1 @ sd["AdaLSTM.lstm_cell.weight_ih"].t()
         + h1 @ sd["AdaLSTM.lstm_cell.weight_hh"].t()
         + sd["AdaLSTM.lstm_cell.bias_ih"] + sd["AdaLSTM.lstm_cell.bias_hh"])
    zi, zf, zg, zo = z.chunk(4, -1)
    i, f, o = torch.sigmoid(zi), torch.sigmoid(zf), torch.sigmoid(zo)
    c1n = f * c1 + i * torch.tanh(zg)
    h1n = o * torch.tanh(c1n)
    sen = torch.sigmoid(lin("AdaLSTM.x_gate", x1) + lin("AdaLSTM.h_gate", h1))
    s = sen * torch.tanh(c1n)
    # adaptive attention (gridTDmodel.py:71-103)
    img_proj = lin("AdaAttention.W_v_proj", v_proj)  # (1, P, P)
    ht_proj = lin("AdaAttention.W_g_proj", h1n, bias=False)  # (1, P)
    zt = lin("AdaAttention.w_h",
             torch.tanh(img_proj + ht_proj.unsqueeze(-1)), bias=False)  # (1,P,1)
    alpha = torch.softmax(zt, 1)
    ctx = (v_proj * alpha).sum(1)
    vs = lin("AdaAttention.w_h",
             torch.tanh(lin("AdaAttention.W_s_proj", s) + ht_proj), bias=False)
    cat = torch.cat([zt.squeeze(-1), vs], -1)
    beta = torch.softmax(cat, -1)[:, -1:]
    c_hat = beta * s + (1 - beta) * ctx
    x2 = torch.cat([c_hat, h1n], -1)
    z2 = (x2 @ sd["LanguageLSTM.weight_ih"].t()
          + h2 @ sd["LanguageLSTM.weight_hh"].t()
          + sd["LanguageLSTM.bias_ih"] + sd["LanguageLSTM.bias_hh"])
    zi2, zf2, zg2, zo2 = z2.chunk(4, -1)
    c2n = torch.sigmoid(zf2) * c2 + torch.sigmoid(zi2) * torch.tanh(zg2)
    h2n = torch.sigmoid(zo2) * torch.tanh(c2n)
    logits = lin("fc", c_hat + h2n)
    return logits


def test_gridtd_conversion_matches_torch():
    rng = np.random.default_rng(0)
    sd = make_gridtd_sd(rng)
    cfg = ModelConfig(model_type="gridtd", embed_dim=E, hidden_dim=H,
                      vocab_size=V, num_pixels=P)
    params = convert_gridtd(sd, cfg)

    raw = rng.normal(size=(1, P, RAW)).astype(np.float32)
    avg = raw.mean(1)
    feats = gridtd.encode_features(params, jnp.asarray(raw), jnp.asarray(avg))
    state = gridtd.init_state(1, H)
    token = 5
    logits, _, _ = gridtd.step(params, feats, state,
                               jnp.asarray([token], jnp.int32))

    want = torch_gridtd_step(
        sd, torch.tensor(raw), torch.tensor(avg), token,
        tuple(torch.zeros(1, H) for _ in range(4)),
    )
    np.testing.assert_allclose(np.asarray(logits), want.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_vocab_padding_in_conversion():
    rng = np.random.default_rng(1)
    sd = make_gridtd_sd(rng)
    cfg = ModelConfig(model_type="gridtd", embed_dim=E, hidden_dim=H,
                      vocab_size=V, num_pixels=P, vocab_pad_multiple=16)
    params = convert_gridtd(sd, cfg)
    assert params.embedding.shape[0] == cfg.padded_vocab
    assert params.fc.weight.shape[0] == cfg.padded_vocab
    # original rows preserved
    np.testing.assert_allclose(np.asarray(params.embedding[:V]),
                               sd["embedding.weight"].numpy())


def test_load_reference_checkpoint_roundtrip(tmp_path):
    """torch.save'd reference checkpoint (modelutils.py:131-138 format) loads
    through load_reference_checkpoint."""
    from lrp_imagecaptioning_tpu.models.torch_weights import (
        load_reference_checkpoint,
    )

    rng = np.random.default_rng(7)
    sd = make_gridtd_sd(rng)
    path = tmp_path / "checkpoint_toy_epoch3_cider_0.5.pth"
    torch.save({"epoch": 3, "cider": 0.5, "state_dict": sd}, str(path))
    cfg = ModelConfig(model_type="gridtd", encoder="vgg16", embed_dim=E,
                      hidden_dim=H, vocab_size=V, num_pixels=P)
    params = load_reference_checkpoint(str(path), cfg)
    np.testing.assert_allclose(np.asarray(params.decoder.embedding),
                               sd["embedding.weight"].numpy())
    assert params.decoder.img_projector.weight.shape == (H, RAW)  # conv1x1->Linear
    assert params.encoder is None  # no img_encoder.* keys in this sd


def test_aoa_conversion_shapes():
    rng = np.random.default_rng(2)
    sd = {}
    sd["embedding.weight"] = torch.tensor(rng.normal(size=(V, E)).astype(np.float32))
    sd["img_projector.weight"] = torch.tensor(
        rng.normal(size=(H, RAW, 1, 1)).astype(np.float32))
    sd["img_projector.bias"] = torch.tensor(rng.normal(size=H).astype(np.float32))
    _lstm_sd(sd, "LanguageLSTM", E + H, H, rng)
    for name in ["decoder_k_proj", "decoder_v_proj",
                 "decoder_multihead_attention.q_proj",
                 "decoder_aoa_linear_gate", "decoder_aoa_linear"]:
        _lin_sd(sd, name, H, H, rng)
    _lin_sd(sd, "fc", V, H, rng)
    cfg = ModelConfig(model_type="aoa", embed_dim=E, hidden_dim=H,
                      vocab_size=V, num_pixels=P, num_head=4)
    params = convert_aoa(sd, cfg)
    assert params.q_proj.weight.shape == (H, H)
    assert params.img_projector.weight.shape == (H, RAW)
