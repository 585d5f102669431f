"""Heatmap rendering utilities (host-side, NumPy).

Re-implements the reference's visualization helpers
(``LRPtools/utils.py:34-184``): max-abs projection, seismic colormap heatmaps,
gamma correction with sign preservation, and attention-map blending.
matplotlib / PIL / skimage are imported lazily so the compute path never
depends on them.
"""

from __future__ import annotations

import numpy as np


def project_range(x: np.ndarray, output_range=(0, 1), absmax=None,
                  input_is_positive_only=False) -> np.ndarray:
    """Normalize per-sample by max-abs then map to output_range
    (LRPtools/utils.py:34-52)."""
    x = np.array(x, dtype=np.float64)
    if absmax is None:
        absmax = np.max(np.abs(x), axis=tuple(range(1, x.ndim)))
    absmax = np.asarray(absmax)
    mask = absmax != 0
    if mask.sum() > 0:
        x[mask] /= absmax[mask][(...,) + (None,) * (x.ndim - 1)]
    if not input_is_positive_only:
        x = (x + 1) / 2
    x = x.clip(0, 1)
    return output_range[0] + x * (output_range[1] - output_range[0])


def gamma_correction(x: np.ndarray, gamma: float = 0.7, minamp: float = 0.0,
                     maxamp: float | None = None) -> np.ndarray:
    """Sign-preserving gamma scaling (LRPtools/utils.py:98-145)."""
    if maxamp is None:
        maxamp = np.abs(x).max()
    if maxamp == 0:
        return x
    y = np.zeros_like(x, dtype=np.float64)
    xs = (x - minamp) / maxamp
    pos = xs >= 0
    y[pos] = xs[pos] ** gamma
    y[~pos] = -((-xs[~pos]) ** gamma)
    return y * maxamp + minamp


def heatmap_rgb(x: np.ndarray, cmap_type: str = "seismic",
                reduce_op: str = "sum", reduce_axis: int = -1) -> np.ndarray:
    """Relevance (N, H, W, C) -> RGB (N, H, W, 3) via colormap
    (LRPtools/utils.py:67-91)."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    cmap = plt.get_cmap(cmap_type)
    if reduce_op == "sum":
        tmp = x.sum(axis=reduce_axis)
    elif reduce_op == "absmax":
        pos = x.max(axis=reduce_axis)
        neg = x.min(axis=reduce_axis)
        tmp = np.where(pos >= -neg, pos, neg)
    else:
        raise NotImplementedError(reduce_op)
    proj = project_range(tmp, output_range=(0, 255)).astype(np.int64)
    rgb = cmap(proj.flatten())[:, :3]
    shape = list(x.shape)
    shape[reduce_axis] = 3
    return rgb.reshape(shape).astype(np.float32)


def _pyramid_expand(image: np.ndarray, upscale: int, sigma: float) -> np.ndarray:
    """skimage.transform.pyramid_expand equivalent (upsample via spline
    interpolation then gaussian smooth) built on scipy — skimage is not a
    dependency of this image."""
    from scipy import ndimage

    up = ndimage.zoom(image, upscale, order=1)
    return ndimage.gaussian_filter(up, sigma=sigma, mode="reflect")


def upscale_attention(attention: np.ndarray, reshape_size, upscale: int,
                      sigma: float = 20.0) -> np.ndarray:
    """Pyramid-expand an attention grid to image size
    (LRPtools/utils.py:150-171)."""
    att = np.asarray(attention, dtype=np.float64).reshape(reshape_size)
    absmax = np.max(np.abs(att))
    if absmax != 0:
        att = att / absmax
        if np.sum(att < 0):
            att = (att + 1) / 2
    try:
        import skimage.transform

        try:
            return skimage.transform.pyramid_expand(
                att, upscale=upscale, sigma=sigma, channel_axis=None
            )
        except TypeError:  # older skimage
            return skimage.transform.pyramid_expand(
                att, upscale=upscale, sigma=sigma, multichannel=False
            )
    except ImportError:
        return _pyramid_expand(att, upscale, sigma)
