"""Weight-resident fused block-5 LRP kernel (ops/pallas_block5.py) —
interpret-mode equality against the literal jnp transcription of the
production walk, custom_vmap batching, and end-to-end explainer parity
kernel-on vs kernel-off."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lrp_imagecaptioning_tpu.ops.pallas_block5 import (
    block5_lrp_backward,
    block5_lrp_backward_ref,
    prep_weight,
)

S, C, T = 6, 256, 4  # small spatial grid, full-lane channels


def _inputs(seed=0, dtype=jnp.bfloat16):
    rng = np.random.default_rng(seed)

    def arr(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32))

    seeds = arr(T, S, S, C)
    maps = {k: jnp.abs(arr(S, S, C)).astype(dtype)
            for k in ("x3", "x2", "x1")}
    # reciprocals: positive, O(1)
    maps.update({k: (1.0 / (1.0 + jnp.abs(arr(S, S, C)))).astype(dtype)
                 for k in ("zi3", "zi2", "zi1")})
    ws = [arr(3, 3, C, C) * 0.05 for _ in range(3)]
    return seeds, maps, ws


@pytest.mark.parametrize("w_dtype,dot_mode", [
    (jnp.bfloat16, "bf16"),   # production TPU config
    (jnp.float32, "f32"),     # CPU parity config
])
def test_kernel_matches_walk_transcription(w_dtype, dot_mode):
    r_dtype = w_dtype
    seeds, m, (w3, w2, w1) = _inputs(0, dtype=w_dtype)
    out = block5_lrp_backward(
        seeds, m["x3"], m["zi3"], m["x2"], m["zi2"], m["x1"], m["zi1"],
        prep_weight(w3, w_dtype), prep_weight(w2, w_dtype),
        prep_weight(w1, w_dtype),
        out_dtype=jnp.float32, r_dtype=r_dtype, dot_mode=dot_mode,
        interpret=True)
    ref = block5_lrp_backward_ref(
        seeds, m["x3"], m["zi3"], m["x2"], m["zi2"], m["x1"], m["zi1"],
        w3, w2, w1, w_dtype=w_dtype, r_dtype=r_dtype)
    assert out.shape == (T, S, S, C)
    # same bf16 operand rounding; only f32 accumulation order differs
    # between the im2col matmul and the conv_transpose.  In bf16 mode the
    # inter-layer bf16 requantization can flip a handful of elements by one
    # bf16 ulp when the reassociated f32 sum crosses a rounding boundary.
    o = np.asarray(out)
    r = np.asarray(ref, np.float32)
    close = np.isclose(o, r, rtol=2e-5, atol=2e-5)
    assert close.mean() > 0.999, close.mean()
    np.testing.assert_allclose(o, r, rtol=1e-2, atol=1e-4)  # <= 1 bf16 ulp


def test_custom_vmap_matches_per_image_calls():
    w_dtype = jnp.bfloat16
    ins = [_inputs(s, dtype=w_dtype) for s in range(3)]
    wf = [prep_weight(w, w_dtype) for w in ins[0][2]]

    def one(seeds, m):
        return block5_lrp_backward(
            seeds, m["x3"], m["zi3"], m["x2"], m["zi2"], m["x1"], m["zi1"],
            *wf, out_dtype=jnp.float32, r_dtype=jnp.bfloat16,
            dot_mode="bf16", interpret=True)

    singles = [one(s, m) for s, m, _ in ins]
    batched_args = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[(s, m) for s, m, _ in ins])
    batched = jax.vmap(lambda s, m: one(s, m))(*batched_args)
    for i, single in enumerate(singles):
        np.testing.assert_array_equal(np.asarray(batched[i]),
                                      np.asarray(single))


def test_explainer_block5_kernel_parity():
    """Kernel-on vs kernel-off full explainer outputs on a toy VGG model
    (CPU: f32 weights, f32 relevance, f32 dot — the exact production
    chain on this backend)."""
    from lrp_imagecaptioning_tpu.config import ModelConfig
    from lrp_imagecaptioning_tpu.data.vocab import build_word_map
    from lrp_imagecaptioning_tpu.explain import build_explainer
    from lrp_imagecaptioning_tpu.models.captioner import Captioner

    wm = build_word_map([[f"w{i}" for i in range(12)]], min_word_freq=1)
    cfg = ModelConfig(model_type="gridtd", encoder="vgg16", embed_dim=16,
                      hidden_dim=24, vocab_size=len(wm), num_pixels=16)
    cap = Captioner(cfg)
    params = cap.init(jax.random.PRNGKey(1))
    image = np.random.default_rng(0).normal(
        size=(1, 64, 64, 3)).astype(np.float32)

    base = build_explainer("lrp", cap, params, wm, max_words=6)
    fast = build_explainer("lrp", cap, params, wm, max_words=6,
                           pallas_block5=True)
    out0 = base.explain_caption_arrays(image)
    out1 = fast.explain_caption_arrays(image)
    assert out0.caption == out1.caption
    np.testing.assert_allclose(out1.relevance_images, out0.relevance_images,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(out1.relevance_words, out0.relevance_words)


def test_block5_kernel_under_sharded_core(eight_devices):
    """shard_map (batched_core_sharded) composes with the custom_vmap'd
    kernel: the per-shard vmap lowers the image axis onto the kernel grid
    inside each shard; outputs match the plain sharded walk."""
    from lrp_imagecaptioning_tpu.config import MeshConfig, ModelConfig
    from lrp_imagecaptioning_tpu.data.vocab import build_word_map
    from lrp_imagecaptioning_tpu.explain import build_explainer
    from lrp_imagecaptioning_tpu.models.captioner import Captioner
    from lrp_imagecaptioning_tpu.parallel import build_mesh

    wm = build_word_map([[f"w{i}" for i in range(12)]], min_word_freq=1)
    cfg = ModelConfig(model_type="gridtd", encoder="vgg16", embed_dim=16,
                      hidden_dim=24, vocab_size=len(wm), num_pixels=16)
    cap = Captioner(cfg)
    params = cap.init(jax.random.PRNGKey(1))
    img = np.random.default_rng(0).normal(
        size=(8, 64, 64, 3)).astype(np.float32)
    mesh = build_mesh(MeshConfig(data_parallel=8, model_parallel=1),
                      eight_devices)
    fast = build_explainer("lrp", cap, params, wm, max_words=6,
                           pallas_block5=True)
    out = fast.batched_core_sharded(mesh)(params, img)
    base = build_explainer("lrp", cap, params, wm, max_words=6)
    out0 = base.batched_core_sharded(mesh)(params, img)
    np.testing.assert_allclose(
        np.asarray(out[2], np.float32), np.asarray(out0[2], np.float32),
        rtol=1e-4, atol=1e-6)


def test_block5_flag_conflicts():
    from lrp_imagecaptioning_tpu.config import ModelConfig
    from lrp_imagecaptioning_tpu.data.vocab import build_word_map
    from lrp_imagecaptioning_tpu.explain import build_explainer
    from lrp_imagecaptioning_tpu.models.captioner import Captioner

    wm = build_word_map([[f"w{i}" for i in range(6)]], min_word_freq=1)
    cfg = ModelConfig(model_type="gridtd", encoder="vgg16", embed_dim=8,
                      hidden_dim=12, vocab_size=len(wm), num_pixels=16)
    cap = Captioner(cfg)
    params = cap.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="pallas_block5"):
        build_explainer("lrp", cap, params, wm, pallas_block5=True,
                        pallas_block1=True)
