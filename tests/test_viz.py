"""Heatmap-rendering parity vs the reference's LRPtools/utils.py functions
(project, heatmap, gamma — the post-processing behind every saved
explanation JPG, gridTDmodel.py:1158-1211)."""

import sys

import numpy as np
import pytest

from test_reference_parity import _install_stubs

from lrp_imagecaptioning_tpu.utils.viz import (
    gamma_correction,
    heatmap_rgb,
    project_range,
)


@pytest.fixture(scope="module")
def ref_utils():
    _install_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from LRPtools import utils as LRPutil

    return LRPutil


def _batch(seed=0, shape=(1, 7, 7, 3)):
    # batch 1: the reference's `X[mask] /= absmax[mask]` only broadcasts for
    # a single sample (its real usage — explanations are rendered per image)
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


def test_project_parity(ref_utils):
    x = _batch(1)
    want = ref_utils.project(x.copy(), output_range=(0, 255))
    got = project_range(x.copy(), output_range=(0, 255))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # positive-only variant
    want = ref_utils.project(np.abs(x), output_range=(0, 1),
                             input_is_postive_only=True)
    got = project_range(np.abs(x), output_range=(0, 1),
                        input_is_positive_only=True)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gamma_parity(ref_utils):
    x = _batch(2, (5, 5))
    want = ref_utils.gamma(x.copy(), gamma=0.7)
    got = gamma_correction(x.copy(), gamma=0.7)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # all-zero input passes through
    z = np.zeros((3, 3), np.float32)
    np.testing.assert_array_equal(gamma_correction(z), ref_utils.gamma(z))


def test_heatmap_parity(ref_utils):
    x = _batch(3, (1, 7, 7, 1))
    want = ref_utils.heatmap(x.copy(), cmap_type="seismic", reduce_op="sum")
    got = heatmap_rgb(x.copy(), cmap_type="seismic", reduce_op="sum")
    np.testing.assert_allclose(got, want, atol=1e-5)
    want = ref_utils.heatmap(x.copy(), reduce_op="absmax")
    got = heatmap_rgb(x.copy(), reduce_op="absmax")
    np.testing.assert_allclose(got, want, atol=1e-5)
