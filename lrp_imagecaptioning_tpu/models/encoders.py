"""CNN grid-feature encoders (VGG16 / ResNet) as functional layer stacks.

Replaces the reference's torchvision copies (``models/vgg.py``,
``models/resnet.py``) with a TPU-first design:

- NHWC feature maps with HWIO kernels (TPU-native layout; the reference is NCHW),
- an explicit layer IR (``VGG_SPEC``) consumed by both the forward pass and the
  LRP relevance interpreter — instead of the reference's forward/backward hooks
  (``LRPtools/lrp_wrapper.py:37-56``),
- ResNet keeps residual adds as explicit IR nodes so relevance can split them,
  mirroring the reference's explicit ``Add`` module (``models/resnet.py:33-38``).

The captioners use VGG16 ``features[0:-1]`` — all conv/relu/pool layers except
the final maxpool, giving a 14x14x512 grid for 224x224 inputs
(gridTDmodel.py:33-35).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

# VGG16 configuration 'D' (models/vgg.py:84 cfgs['D']); 'M' = 2x2 maxpool.
# The final 'M' is dropped per features[0:-1].
VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
             512, 512, 512]


@struct.dataclass
class ConvParams:
    weight: jax.Array  # (Kh, Kw, Cin, Cout) HWIO
    bias: jax.Array | None


def conv2d(p: ConvParams, x: jax.Array, *, stride: int = 1, padding="SAME") -> jax.Array:
    y = jax.lax.conv_general_dilated(
        x, p.weight,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if p.bias is not None:
        y = y + p.bias
    return y


def maxpool2x2(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


class VGGLayer(NamedTuple):
    """Static IR node: kind in {'conv', 'relu', 'maxpool'}; param_idx indexes
    into VGGParams.convs for 'conv' nodes."""

    kind: str
    param_idx: int = -1


def vgg_spec(cfg=None) -> tuple[VGGLayer, ...]:
    cfg = VGG16_CFG if cfg is None else cfg
    spec: list[VGGLayer] = []
    ci = 0
    for v in cfg:
        if v == "M":
            spec.append(VGGLayer("maxpool"))
        else:
            spec.append(VGGLayer("conv", ci))
            spec.append(VGGLayer("relu"))
            ci += 1
    return tuple(spec)


VGG16_SPEC = vgg_spec()


@struct.dataclass
class VGGParams:
    convs: tuple[ConvParams, ...]


def init_vgg16(rng: jax.Array, dtype=jnp.float32) -> VGGParams:
    """Kaiming-normal fan-out init like the reference (models/vgg.py:71-75)."""
    convs = []
    in_c = 3
    keys = jax.random.split(rng, sum(1 for v in VGG16_CFG if v != "M"))
    ki = 0
    for v in VGG16_CFG:
        if v == "M":
            continue
        fan_out = 3 * 3 * v
        std = jnp.sqrt(2.0 / fan_out)
        w = jax.random.normal(keys[ki], (3, 3, in_c, v), dtype) * std
        convs.append(ConvParams(w, jnp.zeros((v,), dtype)))
        in_c = v
        ki += 1
    return VGGParams(tuple(convs))


def vgg_forward(
    params: VGGParams,
    x: jax.Array,
    *,
    spec: tuple[VGGLayer, ...] = VGG16_SPEC,
    save_inputs: bool = False,
) -> jax.Array | tuple[jax.Array, list[jax.Array]]:
    """Run the conv stack.  With ``save_inputs`` also return each layer's input
    activation (the stash the LRP interpreter consumes — replacing the
    reference's ``save_input_hook``, lrp_wrapper.py:24-25)."""
    stash: list[jax.Array] = []
    for layer in spec:
        if save_inputs:
            stash.append(x)
        if layer.kind == "conv":
            x = conv2d(params.convs[layer.param_idx], x)
        elif layer.kind == "relu":
            x = jax.nn.relu(x)
        elif layer.kind == "maxpool":
            x = maxpool2x2(x)
        else:
            raise ValueError(layer.kind)
    if save_inputs:
        return x, stash
    return x


def encode_image_grid(
    params: VGGParams, images: jax.Array, *, dtype=None
) -> tuple[jax.Array, jax.Array]:
    """images (B, H, W, 3) -> (grid (B, P, C), avg (B, C)).

    Mirrors reference Encoder.forward (gridTDmodel.py:40-43): conv stack then
    adaptive average pool to the global feature.  Pixel order matches the
    reference's ``view(B, C, H*W)`` row-major flattening.

    ``dtype`` (ModelConfig.compute_dtype) runs the conv stack in a lower
    precision — bfloat16 keeps the MXU at full rate for the training forward;
    outputs are returned in float32 either way.  Relevance/LRP paths never
    use this (they build their own float32 stash, SURVEY.md §7)."""
    x = images
    if dtype is not None and jnp.dtype(dtype) != x.dtype:
        x = x.astype(dtype)
        params = jax.tree_util.tree_map(lambda p: p.astype(dtype), params)
    fm = vgg_forward(params, x)  # (B, h, w, C)
    b, h, w, c = fm.shape
    grid = fm.reshape(b, h * w, c).astype(jnp.float32)
    avg = grid.mean(axis=1)
    return grid, avg


def load_torch_vgg16_state(state_dict: dict) -> VGGParams:
    """Convert a torchvision vgg16 ``features`` state_dict (OIHW) to VGGParams
    (HWIO).  Keys look like 'features.0.weight' / '0.weight'."""
    import numpy as np

    idx_by_pos = {}
    pos = 0
    for v in VGG16_CFG:
        if v == "M":
            pos += 1
        else:
            idx_by_pos[pos] = len(idx_by_pos)
            pos += 2  # conv + relu
    convs: dict[int, ConvParams] = {}
    for key, val in state_dict.items():
        k = key.replace("features.", "")
        parts = k.split(".")
        if len(parts) != 2 or parts[0].isdigit() is False:
            continue
        pos, kind = int(parts[0]), parts[1]
        if pos not in idx_by_pos:
            continue
        ci = idx_by_pos[pos]
        arr = np.asarray(val)
        prev = convs.get(ci, ConvParams(None, None))
        if kind == "weight":
            convs[ci] = ConvParams(jnp.asarray(arr.transpose(2, 3, 1, 0)), prev.bias)
        elif kind == "bias":
            convs[ci] = ConvParams(prev.weight, jnp.asarray(arr))
    return VGGParams(tuple(convs[i] for i in range(len(convs))))
