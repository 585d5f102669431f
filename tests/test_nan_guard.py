"""The debug-config numeric sanitizer (utils/profiling.nan_guard) — the TPU
equivalent of the reference's per-rule isnan/isinf asserts
(LRPtools/lrp_modules.py:26-27) — must actually CATCH a NaN in a relevance
walk, with a source location, and cost nothing when disabled."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lrp_imagecaptioning_tpu.utils.profiling import nan_guard


def test_nan_guard_catches_injected_nan():
    def fn(x):
        return jnp.sqrt(x).sum()  # sqrt(-1) -> NaN

    guarded = nan_guard(fn)
    assert float(guarded(jnp.asarray([4.0, 9.0]))) == 5.0
    with pytest.raises(Exception, match="nan"):
        guarded(jnp.asarray([-1.0, 4.0]))


def test_nan_guard_disabled_is_passthrough():
    def fn(x):
        return x * 2

    assert nan_guard(fn, enabled=False) is fn


def test_nan_guard_catches_nan_in_relevance_walk():
    """Inject a NaN into the relevance seed of a real CNN LRP walk under
    the guard: checkify must surface it (with a traceback into the walk)
    instead of silently propagating NaN heatmaps."""
    from lrp_imagecaptioning_tpu.explain.cnn_lrp import make_vgg_lrp_backward
    from lrp_imagecaptioning_tpu.models.encoders import init_vgg16

    params = init_vgg16(jax.random.PRNGKey(0))
    image = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 32, 32, 3)).astype(np.float32))
    backward, feats = make_vgg_lrp_backward(params, image)

    def walk(seed):
        return backward(seed)

    guarded = nan_guard(jax.jit(nan_guard(walk)), enabled=False)  # id wrap
    guarded = nan_guard(walk)
    seed = jnp.ones((1, 2, 2, 512), jnp.float32)
    out = guarded(seed)
    assert np.isfinite(np.asarray(out)).all()
    bad = seed.at[0, 0, 0, 0].set(jnp.nan)
    with pytest.raises(Exception, match="nan"):
        guarded(bad)


def test_nan_guard_reports_location():
    def inner(x):
        y = x / x.sum()  # 0/0 when x sums to 0 with zero entries
        return y * 3.0

    guarded = nan_guard(inner)
    try:
        guarded(jnp.zeros((4,)))
    except Exception as e:  # noqa: BLE001
        msg = str(e).lower()
        # checkify flags the 0/0 at the division itself ("division by
        # zero") before the nan check sees it — either way the sanitizer
        # fires and names the producing operation
        assert "nan" in msg or "division by zero" in msg, msg
    else:
        pytest.fail("nan_guard missed a 0/0 NaN")
