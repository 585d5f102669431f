"""ResNet-50/101 grid encoders with LRP-splittable residual adds.

Rebuild of the reference's modified torchvision ResNet (``models/resnet.py``):
the classifier head is removed (resnet.py:232-236) and every residual add is
an explicit node (``Add``, resnet.py:33-38) so relevance can be split across
the skip connection.  Here the network is a functional stack of typed param
structs; BatchNorm runs in inference mode as per-channel scale/shift
(``w = gamma / sqrt(var + eps)``, ``b = beta - mean * w``) — exactly the
affine form the reference's BN LRP rule consumes (lrp_modules.py:210-215).

Output: 2048-channel grid (7x7 for 224 inputs), ``feat_dim = 2048``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ConvBN:
    weight: jax.Array  # (Kh, Kw, Cin, Cout) HWIO, no bias (resnet convs)
    bn_scale: jax.Array  # (Cout,) gamma / sqrt(var + eps)
    bn_shift: jax.Array  # (Cout,) beta - mean * scale
    stride: int = struct.field(pytree_node=False, default=1)


@struct.dataclass
class BottleneckParams:
    conv1: ConvBN  # 1x1
    conv2: ConvBN  # 3x3 (stride here, ResNet v1.5)
    conv3: ConvBN  # 1x1 expansion
    downsample: ConvBN | None  # 1x1 stride on the identity path


@struct.dataclass
class ResNetParams:
    stem: ConvBN  # 7x7 stride 2
    layers: tuple  # tuple[tuple[BottleneckParams, ...], ...]


RESNET_LAYERS = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}


def conv(p: ConvBN, x: jax.Array) -> jax.Array:
    kh = p.weight.shape[0]
    pad = (kh - 1) // 2
    return jax.lax.conv_general_dilated(
        x, p.weight, (p.stride, p.stride),
        [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def bn(p: ConvBN, x: jax.Array) -> jax.Array:
    return x * p.bn_scale + p.bn_shift


def maxpool3x3s2(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )


def bottleneck_forward(p: BottleneckParams, x: jax.Array) -> jax.Array:
    out = jax.nn.relu(bn(p.conv1, conv(p.conv1, x)))
    out = jax.nn.relu(bn(p.conv2, conv(p.conv2, out)))
    out = bn(p.conv3, conv(p.conv3, out))
    identity = x if p.downsample is None else bn(p.downsample, conv(p.downsample, x))
    return jax.nn.relu(out + identity)


def resnet_forward(params: ResNetParams, x: jax.Array) -> jax.Array:
    x = jax.nn.relu(bn(params.stem, conv(params.stem, x)))
    x = maxpool3x3s2(x)
    for stage in params.layers:
        for block in stage:
            x = bottleneck_forward(block, x)
    return x


def encode_image_grid_resnet(
    params: ResNetParams, images: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """images (B, H, W, 3) -> (grid (B, P, 2048), avg (B, 2048))."""
    fm = resnet_forward(params, images)
    b, h, w, c = fm.shape
    grid = fm.reshape(b, h * w, c)
    return grid, grid.mean(axis=1)


# -- init / conversion ------------------------------------------------------

def _init_convbn(rng, kh, cin, cout, stride=1, dtype=jnp.float32) -> ConvBN:
    fan_out = kh * kh * cout
    w = jax.random.normal(rng, (kh, kh, cin, cout), dtype) * jnp.sqrt(2.0 / fan_out)
    return ConvBN(w, jnp.ones((cout,), dtype), jnp.zeros((cout,), dtype), stride)


def init_resnet(rng: jax.Array, arch: str = "resnet101",
                dtype=jnp.float32) -> ResNetParams:
    blocks = RESNET_LAYERS[arch]
    keys = iter(jax.random.split(rng, 4 + sum(blocks) * 4))
    stem = _init_convbn(next(keys), 7, 3, 64, stride=2, dtype=dtype)
    layers = []
    inplanes = 64
    for stage_idx, (planes, n) in enumerate(zip((64, 128, 256, 512), blocks)):
        stage = []
        for b in range(n):
            stride = 2 if (stage_idx > 0 and b == 0) else 1
            out = planes * 4
            down = None
            if stride != 1 or inplanes != out:
                down = _init_convbn(next(keys), 1, inplanes, out, stride, dtype)
            stage.append(BottleneckParams(
                conv1=_init_convbn(next(keys), 1, inplanes, planes, 1, dtype),
                conv2=_init_convbn(next(keys), 3, planes, planes, stride, dtype),
                conv3=_init_convbn(next(keys), 1, planes, out, 1, dtype),
                downsample=down,
            ))
            inplanes = out
        layers.append(tuple(stage))
    return ResNetParams(stem, tuple(layers))


def convbn_from_torch(conv_w_oihw, gamma, beta, mean, var, *, stride=1,
                      eps=1e-5) -> ConvBN:
    """torchvision (conv.weight, bn.{weight,bias,running_mean,running_var})
    -> inference-mode ConvBN."""
    import numpy as np

    scale = np.asarray(gamma) / np.sqrt(np.asarray(var) + eps)
    shift = np.asarray(beta) - np.asarray(mean) * scale
    return ConvBN(
        jnp.asarray(np.asarray(conv_w_oihw).transpose(2, 3, 1, 0)),
        jnp.asarray(scale.astype(np.float32)),
        jnp.asarray(shift.astype(np.float32)),
        stride,
    )


def load_torch_resnet_state(state_dict: dict, arch: str = "resnet101") -> ResNetParams:
    """Convert a torchvision resnet state_dict to ResNetParams."""
    def cbn(prefix_conv, prefix_bn, stride=1):
        return convbn_from_torch(
            state_dict[f"{prefix_conv}.weight"],
            state_dict[f"{prefix_bn}.weight"], state_dict[f"{prefix_bn}.bias"],
            state_dict[f"{prefix_bn}.running_mean"],
            state_dict[f"{prefix_bn}.running_var"], stride=stride,
        )

    blocks = RESNET_LAYERS[arch]
    stem = cbn("conv1", "bn1", stride=2)
    layers = []
    inplanes = 64
    for stage_idx, (planes, n) in enumerate(zip((64, 128, 256, 512), blocks)):
        stage = []
        for b in range(n):
            stride = 2 if (stage_idx > 0 and b == 0) else 1
            pre = f"layer{stage_idx + 1}.{b}"
            down = None
            out = planes * 4
            if stride != 1 or inplanes != out:
                down = cbn(f"{pre}.downsample.0", f"{pre}.downsample.1", stride)
            stage.append(BottleneckParams(
                conv1=cbn(f"{pre}.conv1", f"{pre}.bn1"),
                conv2=cbn(f"{pre}.conv2", f"{pre}.bn2", stride),
                conv3=cbn(f"{pre}.conv3", f"{pre}.bn3"),
                downsample=down,
            ))
            inplanes = out
        layers.append(tuple(stage))
    return ResNetParams(stem, tuple(layers))
