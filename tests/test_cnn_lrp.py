"""CNN LRP rules vs a torch-autograd oracle implementing the reference's
clamped-weight gradient formulation (lrp_modules.py:56-170) on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from lrp_imagecaptioning_tpu.explain.cnn_lrp import (
    conv_alpha_beta,
    maxpool_winner,
    vgg_lrp,
)
from lrp_imagecaptioning_tpu.models.encoders import (
    ConvParams,
    VGGParams,
    vgg_spec,
)

Z_EPS = 1e-7


def torch_safe_divide(a, b):
    return a / (b + Z_EPS * (b == 0).float())


def torch_conv_alpha_beta(w_oihw, x_nchw, r_nchw):
    """Reference-semantics oracle: PosNetConv + lrp_backward via autograd."""
    w = torch.tensor(w_oihw)
    x = torch.tensor(x_nchw, requires_grad=True)
    r = torch.tensor(r_nchw)
    wp, wn = w.clamp(min=0), w.clamp(max=0)
    z = F.conv2d(x.clamp(min=0), wp, padding=1) + F.conv2d(
        x.clamp(max=0), wn, padding=1
    )
    s = torch_safe_divide(r, z)
    z.backward(s)
    return (x.detach() * x.grad).numpy()


def torch_maxpool_rule(x_nchw, r_nchw):
    x = torch.tensor(x_nchw, requires_grad=True)
    z = F.max_pool2d(x, 2, 2)
    s = torch_safe_divide(torch.tensor(r_nchw), z)
    z.backward(s)
    return (x.detach() * x.grad).numpy()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_conv_alpha_beta_matches_torch(seed):
    rng = np.random.default_rng(seed)
    cin, cout, hw = 3, 5, 8
    w_oihw = rng.normal(size=(cout, cin, 3, 3)).astype(np.float32)
    x_nchw = rng.normal(size=(1, cin, hw, hw)).astype(np.float32)
    r_nchw = rng.normal(size=(1, cout, hw, hw)).astype(np.float32)
    want = torch_conv_alpha_beta(w_oihw, x_nchw, r_nchw)

    p = ConvParams(jnp.asarray(w_oihw.transpose(2, 3, 1, 0)), None)
    x = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    r = jnp.asarray(r_nchw.transpose(0, 2, 3, 1))
    got = np.asarray(conv_alpha_beta(p, x, r)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_maxpool_rule_matches_torch(seed):
    rng = np.random.default_rng(seed)
    # relu'd input (realistic: pools always follow relu in VGG)
    x_nchw = np.maximum(rng.normal(size=(1, 4, 8, 8)), 0).astype(np.float32)
    r_nchw = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
    want = torch_maxpool_rule(x_nchw, r_nchw)
    got = np.asarray(
        maxpool_winner(
            jnp.asarray(x_nchw.transpose(0, 2, 3, 1)),
            jnp.asarray(r_nchw.transpose(0, 2, 3, 1)),
        )
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_small_vgg_stack_matches_torch_chain():
    """Two convs + relu + maxpool end-to-end against the torch oracle chain
    with identity-relu rule."""
    rng = np.random.default_rng(3)
    cfg = [4, "M", 6]
    spec = vgg_spec(cfg)
    w1 = rng.normal(size=(4, 3, 3, 3)).astype(np.float32)
    w2 = rng.normal(size=(6, 4, 3, 3)).astype(np.float32)
    params = VGGParams((
        ConvParams(jnp.asarray(w1.transpose(2, 3, 1, 0)), jnp.zeros(4)),
        ConvParams(jnp.asarray(w2.transpose(2, 3, 1, 0)), jnp.zeros(6)),
    ))
    img = rng.normal(size=(1, 3, 8, 8)).astype(np.float32)
    r_seed = rng.normal(size=(1, 6, 4, 4)).astype(np.float32)

    got = np.asarray(
        vgg_lrp(
            params,
            jnp.asarray(img.transpose(0, 2, 3, 1)),
            jnp.asarray(r_seed.transpose(0, 2, 3, 1)),
            spec=spec,
        )
    ).transpose(0, 3, 1, 2)

    # torch chain: forward stash
    x0 = img
    z1 = F.conv2d(torch.tensor(x0), torch.tensor(w1), padding=1).numpy()
    a1 = np.maximum(z1, 0)
    p1 = F.max_pool2d(torch.tensor(a1), 2, 2).numpy()
    # backward: conv2 <- relu(identity) <- ... seed at conv2 output
    r = torch_conv_alpha_beta(w2, p1, r_seed)  # input of conv2 is pooled map
    r = torch_maxpool_rule(a1, r)  # pool input is relu output
    r = r  # relu identity
    r = torch_conv_alpha_beta(w1, x0, r)
    np.testing.assert_allclose(got, r, rtol=1e-3, atol=1e-5)


def test_full_vgg16_lrp_runs_and_finite():
    params_vgg = __import__(
        "lrp_imagecaptioning_tpu.models.encoders", fromlist=["init_vgg16"]
    ).init_vgg16(jax.random.PRNGKey(0))
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    r_feat = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 512))
    rel = jax.jit(lambda: vgg_lrp(params_vgg, img, r_feat))()
    rel = np.asarray(rel)
    assert rel.shape == (1, 64, 64, 3)
    assert np.isfinite(rel).all()
    assert np.abs(rel).sum() > 0


@pytest.mark.parametrize("seed", [0, 1])
def test_fast_pool_backward_matches_vjp(seed):
    """pool_mode='fast' (precomputed boolean winner map, the production
    default) must equal the reference-faithful vjp gradient trick on float
    activations (ties are measure-zero; all-zero windows covered below)."""
    from lrp_imagecaptioning_tpu.explain.cnn_lrp import make_vgg_lrp_backward
    from lrp_imagecaptioning_tpu.models.encoders import init_vgg16

    params = init_vgg16(jax.random.PRNGKey(seed))
    img = jax.random.normal(jax.random.PRNGKey(seed + 10), (1, 32, 32, 3))
    seeds = jax.random.normal(jax.random.PRNGKey(seed + 20), (3, 2, 2, 512))

    out = {}
    for mode in ("vjp", "fast"):
        backward, _ = make_vgg_lrp_backward(params, img, pool_mode=mode)
        out[mode] = np.asarray(jax.vmap(lambda r: backward(r[None])[0])(seeds))
    np.testing.assert_allclose(out["fast"], out["vjp"], rtol=1e-5, atol=1e-7)


def test_first_winner_mask_matches_torch_on_ties():
    """Exact positive ties (constant image regions) must route relevance to
    the single first winner per window like torch's max_pool2d backward —
    the round-2 advisor found the old mask credited EVERY tied winner,
    duplicating relevance up to 4x per pool level."""
    import torch
    import torch.nn.functional as F

    from lrp_imagecaptioning_tpu.explain.cnn_lrp import first_winner_mask

    rng = np.random.default_rng(0)
    # quantized values -> plenty of exact ties, including all-tied windows
    x = rng.integers(0, 3, (2, 8, 8, 4)).astype(np.float32)
    got = np.asarray(first_winner_mask(jnp.asarray(x))).astype(np.float32)

    xt = torch.tensor(x.transpose(0, 3, 1, 2), requires_grad=True)
    z = F.max_pool2d(xt, 2)
    z.backward(torch.ones_like(z))
    want = xt.grad.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(got, want)


def test_fast_pool_matches_vjp_on_tied_image():
    """End-to-end fast-vs-vjp equality on an image engineered to produce
    exact ties in the conv activations (piecewise-constant input)."""
    from lrp_imagecaptioning_tpu.explain.cnn_lrp import make_vgg_lrp_backward
    from lrp_imagecaptioning_tpu.models.encoders import init_vgg16

    params = init_vgg16(jax.random.PRNGKey(7))
    rng = np.random.default_rng(7)
    # 8x8 constant blocks -> identical activations across interior windows
    blocks = rng.normal(size=(1, 4, 4, 3)).astype(np.float32)
    img = jnp.asarray(np.repeat(np.repeat(blocks, 8, axis=1), 8, axis=2))
    seed = jax.random.normal(jax.random.PRNGKey(8), (1, 2, 2, 512))

    out = {}
    for mode in ("vjp", "fast"):
        backward, _ = make_vgg_lrp_backward(params, img, pool_mode=mode)
        out[mode] = np.asarray(backward(seed))
    np.testing.assert_allclose(out["fast"], out["vjp"], rtol=1e-5, atol=1e-7)


def test_fast_pool_zero_windows_give_zero_relevance():
    """All-zero pool windows (ubiquitous post-ReLU) must produce zero input
    relevance in the fast path, exactly like x * scatter(safe_divide(r, 0~))
    in the vjp form (lrp_modules.py:182-195)."""
    from lrp_imagecaptioning_tpu.explain.cnn_lrp import (
        _upsample2x,
        make_vgg_lrp_backward,
    )
    from lrp_imagecaptioning_tpu.models.encoders import init_vgg16

    params = init_vgg16(jax.random.PRNGKey(0))
    img = jnp.zeros((1, 32, 32, 3), jnp.float32)  # all activations zero after
    # subtracting biasless convs of zeros -> relu(0) = 0 everywhere
    backward, _ = make_vgg_lrp_backward(params, img, pool_mode="fast")
    r = backward(jnp.ones((1, 2, 2, 512), jnp.float32))
    assert np.asarray(jnp.abs(r)).sum() == 0.0


def test_guided_fast_pool_matches_true_vjp():
    """Guided-backprop with winner-mask pools equals the true maxpool vjp
    formulation (the relu gate below each pool kills zero-window ties)."""
    from lrp_imagecaptioning_tpu.explain.cnn_gradient import (
        make_vgg_guided_backward,
    )
    from lrp_imagecaptioning_tpu.models.encoders import (
        conv2d,
        init_vgg16,
        maxpool2x2,
        vgg_spec,
    )

    params = init_vgg16(jax.random.PRNGKey(3))
    img = jax.random.normal(jax.random.PRNGKey(4), (1, 32, 32, 3))
    seed = jax.random.normal(jax.random.PRNGKey(5), (1, 2, 2, 512))

    got = np.asarray(make_vgg_guided_backward(params, img)(seed))

    # oracle: same walk but pools via true jax.vjp (the pre-optimization
    # formulation)
    x = img.astype(jnp.float32)
    records = []
    for layer in vgg_spec():
        if layer.kind == "conv":
            p = params.convs[layer.param_idx]
            _, vjp = jax.vjp(lambda xx, p=p: conv2d(p, xx), x)
            records.append(("conv", None, vjp))
            x = conv2d(p, x)
        elif layer.kind == "relu":
            x = jax.nn.relu(x)
            records.append(("relu", x, None))
        elif layer.kind == "maxpool":
            _, vjp = jax.vjp(maxpool2x2, x)
            records.append(("maxpool", None, vjp))
            x = maxpool2x2(x)
    g = seed.astype(jnp.float32)
    for kind, out_act, vjp in reversed(records):
        if kind == "relu":
            g = jnp.maximum(g, 0.0) * (out_act > 0)
        else:
            (g,) = vjp(g)
    np.testing.assert_allclose(got, np.asarray(g), rtol=1e-5, atol=1e-7)


def test_r_dtype_bf16_storage_close_to_f32():
    """bfloat16 relevance STORAGE between walk layers (the TPU default —
    halves the dominant HBM traffic) must track the f32 walk to bf16
    rounding scale; arithmetic stays f32 so the error does not compound
    catastrophically over the 18 records."""
    from lrp_imagecaptioning_tpu.explain.cnn_lrp import make_vgg_lrp_backward
    from lrp_imagecaptioning_tpu.models.encoders import init_vgg16

    params = init_vgg16(jax.random.PRNGKey(0))
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    seed = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 2, 512))
    f32_out = np.asarray(
        make_vgg_lrp_backward(params, img)[0](seed))
    bf16_out = np.asarray(
        make_vgg_lrp_backward(params, img, r_dtype=jnp.bfloat16)[0](seed))
    assert bf16_out.dtype == np.float32  # upcast on return
    scale = np.abs(f32_out).max()
    rel = np.abs(bf16_out - f32_out).max() / scale
    assert 0 < rel < 3e-2, rel  # bf16 rounding scale, and not exact


def test_w_dtype_explicit_transpose_is_exact_at_full_precision():
    """The compact-weight path swaps the jax.vjp closure for an explicit
    conv-transpose (flip + I/O swap); at full precision the two must be the
    SAME linear map bit-for-bit (the dtype cast is the only difference the
    option introduces).

    Relies on float64 silently truncating to float32 when x64 is disabled
    (the suite's normal state) to exercise the compact path at full
    precision; under JAX_ENABLE_X64 the kernels would really be f64 and the
    bit-for-bit compare against the f32 vjp walk is meaningless — skip."""
    if jax.config.jax_enable_x64:
        pytest.skip("x64 enabled: float64 no longer truncates to f32, the "
                    "bitwise compare against the f32 vjp walk does not apply")
    from lrp_imagecaptioning_tpu.explain.cnn_lrp import make_vgg_lrp_backward
    from lrp_imagecaptioning_tpu.models.encoders import init_vgg16

    params = init_vgg16(jax.random.PRNGKey(0))
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    seed = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 2, 512))
    via_vjp = np.asarray(make_vgg_lrp_backward(params, img)[0](seed))
    # float64 truncates back to f32 on CPU: full-precision compact path
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        via_explicit = np.asarray(
            make_vgg_lrp_backward(params, img, w_dtype=jnp.float64)[0](seed))
    np.testing.assert_array_equal(via_explicit, via_vjp)


def test_w_dtype_bf16_weight_storage_close_to_f32():
    """bfloat16 STORAGE of the clamped conv-transpose kernels (the TPU
    default via stash_dtype — halves the weight-read traffic dominating
    blocks 4-5) must track the f32 walk at bf16 rounding scale."""
    from lrp_imagecaptioning_tpu.explain.cnn_lrp import make_vgg_lrp_backward
    from lrp_imagecaptioning_tpu.models.encoders import init_vgg16

    params = init_vgg16(jax.random.PRNGKey(0))
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    seed = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 2, 512))
    f32_out = np.asarray(make_vgg_lrp_backward(params, img)[0](seed))
    bf16_out = np.asarray(
        make_vgg_lrp_backward(params, img, w_dtype=jnp.bfloat16)[0](seed))
    scale = np.abs(f32_out).max()
    rel = np.abs(bf16_out - f32_out).max() / scale
    assert 0 < rel < 3e-2, rel  # bf16 rounding scale, and not exact


def test_cnn_r_dtype_resolution_cpu_default_is_f32():
    """Off-TPU the auto default must stay float32 so the reference-parity
    suite keeps its exact guarantees."""
    from lrp_imagecaptioning_tpu.config import ModelConfig
    from lrp_imagecaptioning_tpu.data.vocab import build_word_map
    from lrp_imagecaptioning_tpu.explain import build_explainer
    from lrp_imagecaptioning_tpu.models.captioner import Captioner

    wm = build_word_map([["a"], ["b"]], min_word_freq=1)
    cfg = __import__("dataclasses").replace(
        ModelConfig(), model_type="gridtd", encoder="vgg16",
        embed_dim=8, hidden_dim=8, vocab_size=len(wm), num_pixels=4)
    cap = Captioner(cfg)
    ex = build_explainer("lrp", cap, cap.init(jax.random.PRNGKey(0)), wm,
                         max_words=2)
    assert ex._resolved_r_dtype() == jnp.float32
    ex2 = build_explainer("lrp", cap, cap.init(jax.random.PRNGKey(0)), wm,
                          max_words=2, cnn_r_dtype="bfloat16")
    assert ex2._resolved_r_dtype() == jnp.bfloat16


def test_guided_g_dtype_bf16_close_to_f32():
    from lrp_imagecaptioning_tpu.explain.cnn_gradient import (
        make_vgg_guided_backward,
    )
    from lrp_imagecaptioning_tpu.models.encoders import init_vgg16

    params = init_vgg16(jax.random.PRNGKey(0))
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    seed = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 2, 512))
    f32_out = np.asarray(make_vgg_guided_backward(params, img)(seed))
    bf_out = np.asarray(make_vgg_guided_backward(
        params, img, g_dtype=jnp.bfloat16)(seed))
    scale = max(np.abs(f32_out).max(), 1e-12)
    rel = np.abs(bf_out - f32_out).max() / scale
    assert 0 <= rel < 3e-2, rel


def test_guided_w_dtype_bf16_close_to_f32():
    """bf16 STORAGE of the guided walk's conv-transpose kernels (the TPU
    auto-default via the explainer's shared w_dtype resolution)."""
    from lrp_imagecaptioning_tpu.explain.cnn_gradient import (
        make_vgg_guided_backward,
    )
    from lrp_imagecaptioning_tpu.models.encoders import init_vgg16

    params = init_vgg16(jax.random.PRNGKey(0))
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    seed = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 2, 512))
    f32_out = np.asarray(make_vgg_guided_backward(params, img)(seed))
    bf_out = np.asarray(make_vgg_guided_backward(
        params, img, w_dtype=jnp.bfloat16)(seed))
    scale = max(np.abs(f32_out).max(), 1e-12)
    rel = np.abs(bf_out - f32_out).max() / scale
    assert 0 < rel < 3e-2, rel


def test_backward_two_level_split_equals_full_walk():
    """backward(r, down_to=k) then backward(., up_from=k) must compose to
    the full walk exactly at f32 (the two-level word chunking in the
    explainer stores only r_dtype between the halves, same as between any
    two records)."""
    from lrp_imagecaptioning_tpu.explain.cnn_lrp import make_vgg_lrp_backward
    from lrp_imagecaptioning_tpu.models.encoders import VGG16_SPEC, init_vgg16

    params = init_vgg16(jax.random.PRNGKey(0))
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    seed = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 2, 512))
    backward, _ = make_vgg_lrp_backward(params, img)
    pools = [i for i, l in enumerate(VGG16_SPEC) if l.kind == "maxpool"]
    split = pools[2] + 1
    full = np.asarray(backward(seed))
    two = np.asarray(backward(backward(seed, down_to=split), up_from=split))
    np.testing.assert_array_equal(two, full)


def test_conv1_tap_gemm_matches_vjp_form():
    """Opt-in tap-unrolled GEMM conv1_1 backward (a recorded in-situ
    NEGATIVE result, default OFF) must stay numerically equal to the vjp
    form — exact to f32 rounding."""
    from lrp_imagecaptioning_tpu.explain.cnn_lrp import make_vgg_lrp_backward
    from lrp_imagecaptioning_tpu.models.encoders import init_vgg16

    params = init_vgg16(jax.random.PRNGKey(0))
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    seed = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 2, 512))
    b_vjp, _ = make_vgg_lrp_backward(params, img, conv1_tap=False)
    b_tap, _ = make_vgg_lrp_backward(params, img, conv1_tap=True)
    r_vjp = np.asarray(b_vjp(seed))
    r_tap = np.asarray(b_tap(seed))
    scale = max(np.abs(r_vjp).max(), 1e-12)
    assert np.abs(r_tap - r_vjp).max() / scale < 1e-5
    # down_to truncation above conv1_1 is untouched by the flag
    np.testing.assert_array_equal(
        np.asarray(b_tap(seed, down_to=5)), np.asarray(b_vjp(seed, down_to=5)))


def test_conv1_merge_bitexact_vs_two_conv_form():
    """The merged single-conv clamped-input backward for conv1_1 (the TPU
    compact-path default, a measured +8.2% headline win) concatenates the
    flipped w+/w- kernels on the output-channel axis; per-output-channel
    contractions are independent, so it must be BIT-IDENTICAL to the
    two-conv form — and to itself under the auto default (None resolves to
    merged on the compact path)."""
    from lrp_imagecaptioning_tpu.explain.cnn_lrp import make_vgg_lrp_backward
    from lrp_imagecaptioning_tpu.models.encoders import init_vgg16

    params = init_vgg16(jax.random.PRNGKey(0))
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    seed = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 2, 512))
    kw = dict(w_dtype=jnp.bfloat16)  # compact path (the TPU default)
    r_two = np.asarray(
        make_vgg_lrp_backward(params, img, conv1_merge=False, **kw)[0](seed))
    r_merged = np.asarray(
        make_vgg_lrp_backward(params, img, conv1_merge=True, **kw)[0](seed))
    r_auto = np.asarray(make_vgg_lrp_backward(params, img, **kw)[0](seed))
    np.testing.assert_array_equal(r_merged, r_two)
    np.testing.assert_array_equal(r_auto, r_merged)
    # the f32 (CPU-parity) path uses the jax.vjp backward either way
    r_f32_a = np.asarray(
        make_vgg_lrp_backward(params, img, conv1_merge=False)[0](seed))
    r_f32_b = np.asarray(make_vgg_lrp_backward(params, img)[0](seed))
    np.testing.assert_array_equal(r_f32_a, r_f32_b)
