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
    """Conv + BatchNorm.

    Inference/LRP always consume the folded affine form (bn_scale/bn_shift) —
    the layout the reference's BN LRP rule needs (lrp_modules.py:210-215).
    The raw BN parameters (gamma/beta) and running stats (mean/var) are kept
    so ``finetune_encoder`` can train BN the way the reference does
    (train.py:95-109 puts the whole encoder incl. BatchNorm into train mode):
    batch-stat normalization + running-stat updates via
    ``resnet_forward_train``, refolded into bn_scale/bn_shift by ``fold_bn``.
    ``gamma`` is None for params converted before this field existed.
    """

    weight: jax.Array  # (Kh, Kw, Cin, Cout) HWIO, no bias (resnet convs)
    bn_scale: jax.Array  # (Cout,) gamma / sqrt(var + eps)
    bn_shift: jax.Array  # (Cout,) beta - mean * scale
    stride: int = struct.field(pytree_node=False, default=1)
    gamma: jax.Array | None = None  # (Cout,) trainable BN weight
    beta: jax.Array | None = None  # (Cout,) trainable BN bias
    mean: jax.Array | None = None  # (Cout,) running mean (not trained)
    var: jax.Array | None = None  # (Cout,) running var (not trained)

    @property
    def has_raw_bn(self) -> bool:
        return self.gamma is not None


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


BN_EPS = 1e-5  # torch BatchNorm2d default
BN_MOMENTUM = 0.1  # torch BatchNorm2d default


def bn_train(p: ConvBN, x: jax.Array, momentum: float = BN_MOMENTUM
             ) -> tuple[jax.Array, ConvBN]:
    """Train-mode BatchNorm (torch semantics): normalize with BIASED batch
    stats, update running stats with the UNBIASED variance; returns the
    normalized output and the ConvBN with refreshed mean/var."""
    assert p.has_raw_bn, "ConvBN lacks raw BN params; reconvert/reinit"
    axes = (0, 1, 2)
    bm = jnp.mean(x, axes)
    bv = jnp.mean(jnp.square(x - bm), axes)
    n = x.shape[0] * x.shape[1] * x.shape[2]
    unbiased = bv * (n / max(n - 1, 1))
    y = p.gamma * (x - bm) * jax.lax.rsqrt(bv + BN_EPS) + p.beta
    new_mean = (1.0 - momentum) * p.mean + momentum * bm
    new_var = (1.0 - momentum) * p.var + momentum * unbiased
    return y, p.replace(
        mean=jax.lax.stop_gradient(new_mean),
        var=jax.lax.stop_gradient(new_var),
    )


def fold_convbn(p: ConvBN) -> ConvBN:
    """Recompute the folded affine from raw gamma/beta + running stats (no-op
    for params without raw BN)."""
    if not p.has_raw_bn:
        return p
    scale = p.gamma * jax.lax.rsqrt(p.var + BN_EPS)
    return p.replace(bn_scale=scale, bn_shift=p.beta - p.mean * scale)


def map_convbn(f, params: "ResNetParams") -> "ResNetParams":
    """Apply ``f: ConvBN -> ConvBN`` to every ConvBN in the network."""
    def block(b: BottleneckParams) -> BottleneckParams:
        return BottleneckParams(
            conv1=f(b.conv1), conv2=f(b.conv2), conv3=f(b.conv3),
            downsample=None if b.downsample is None else f(b.downsample),
        )

    return ResNetParams(
        f(params.stem),
        tuple(tuple(block(b) for b in stage) for stage in params.layers),
    )


def fold_bn(params: "ResNetParams") -> "ResNetParams":
    """Refold every BN's scale/shift from its raw params — call after a train
    step so inference/LRP (which read bn_scale/bn_shift) see the tuned BN."""
    return map_convbn(fold_convbn, params)


def merge_bn_stats(params: "ResNetParams",
                   stats_src: "ResNetParams") -> "ResNetParams":
    """Copy running mean/var from ``stats_src`` (the tree returned by
    ``resnet_forward_train``) into ``params`` (whose weights the optimizer may
    have just updated), then refold scale/shift so eval/LRP stay consistent."""
    def m(p: ConvBN, s: ConvBN) -> ConvBN:
        if not p.has_raw_bn:
            return p
        return fold_convbn(p.replace(mean=s.mean, var=s.var))

    return jax.tree_util.tree_map(
        m, params, stats_src, is_leaf=lambda x: isinstance(x, ConvBN))


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


def bottleneck_forward_train(
    p: BottleneckParams, x: jax.Array
) -> tuple[jax.Array, BottleneckParams]:
    out, c1 = bn_train(p.conv1, conv(p.conv1, x))
    out = jax.nn.relu(out)
    out, c2 = bn_train(p.conv2, conv(p.conv2, out))
    out = jax.nn.relu(out)
    out, c3 = bn_train(p.conv3, conv(p.conv3, out))
    if p.downsample is None:
        identity, down = x, None
    else:
        identity, down = bn_train(p.downsample, conv(p.downsample, x))
    return jax.nn.relu(out + identity), BottleneckParams(c1, c2, c3, down)


def resnet_forward_train(
    params: ResNetParams, x: jax.Array
) -> tuple[jax.Array, ResNetParams]:
    """Train-mode forward (batch-stat BN): returns features and the params
    with refreshed running stats (weights untouched)."""
    x, stem = bn_train(params.stem, conv(params.stem, x))
    x = jax.nn.relu(x)
    x = maxpool3x3s2(x)
    new_layers = []
    for stage in params.layers:
        new_stage = []
        for block in stage:
            x, nb = bottleneck_forward_train(block, x)
            new_stage.append(nb)
        new_layers.append(tuple(new_stage))
    return x, ResNetParams(stem, tuple(new_layers))


def encode_image_grid_resnet(
    params: ResNetParams, images: jax.Array, *, dtype=None
) -> tuple[jax.Array, jax.Array]:
    """images (B, H, W, 3) -> (grid (B, P, 2048), avg (B, 2048)).

    ``dtype`` (ModelConfig.compute_dtype) lowers the conv-stack precision
    (bfloat16 for the MXU-rate training forward); outputs return float32.
    LRP/relevance paths build their own float32 stash and ignore this."""
    x = images
    if dtype is not None and jnp.dtype(dtype) != x.dtype:
        x = x.astype(dtype)
        params = jax.tree_util.tree_map(lambda p: p.astype(dtype), params)
    fm = resnet_forward(params, x)
    b, h, w, c = fm.shape
    grid = fm.reshape(b, h * w, c).astype(jnp.float32)
    return grid, grid.mean(axis=1)


def encode_image_grid_resnet_train(
    params: ResNetParams, images: jax.Array
) -> tuple[jax.Array, jax.Array, ResNetParams]:
    """Train-mode variant: also returns params with updated running stats."""
    fm, new_params = resnet_forward_train(params, images)
    b, h, w, c = fm.shape
    grid = fm.reshape(b, h * w, c)
    return grid, grid.mean(axis=1), new_params


# -- init / conversion ------------------------------------------------------

def _init_convbn(rng, kh, cin, cout, stride=1, dtype=jnp.float32) -> ConvBN:
    fan_out = kh * kh * cout
    w = jax.random.normal(rng, (kh, kh, cin, cout), dtype) * jnp.sqrt(2.0 / fan_out)
    # distinct buffers per field — shared arrays break donation under jit
    def ones():
        return jnp.ones((cout,), dtype)

    def zeros():
        return jnp.zeros((cout,), dtype)

    return ConvBN(w, ones(), zeros(), stride,
                  gamma=ones(), beta=zeros(), mean=zeros(), var=ones())


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
                      eps=BN_EPS, dtype=None) -> ConvBN:
    """torchvision (conv.weight, bn.{weight,bias,running_mean,running_var})
    -> ConvBN carrying both the folded affine and the raw BN params.
    ``dtype`` defaults to float32; float64 is used by the parity tests."""
    import numpy as np

    dtype = np.float32 if dtype is None else np.dtype(dtype)
    # explicit copies: inputs often alias live torch buffers (tensor.numpy()
    # shares memory, and CPU jnp.asarray can be zero-copy) which BN updates
    # mutate in place
    g = np.array(gamma, dtype)
    b = np.array(beta, dtype)
    m = np.array(mean, dtype)
    v = np.array(var, dtype)
    scale = g / np.sqrt(v + eps)
    shift = b - m * scale
    return ConvBN(
        jnp.asarray(np.asarray(conv_w_oihw).transpose(2, 3, 1, 0), dtype),
        jnp.asarray(scale), jnp.asarray(shift), stride,
        gamma=jnp.asarray(g), beta=jnp.asarray(b),
        mean=jnp.asarray(m), var=jnp.asarray(v),
    )


def load_torch_resnet_state(state_dict: dict, arch: str = "resnet101",
                            dtype=None) -> ResNetParams:
    """Convert a torchvision resnet state_dict to ResNetParams."""
    def cbn(prefix_conv, prefix_bn, stride=1):
        return convbn_from_torch(
            state_dict[f"{prefix_conv}.weight"],
            state_dict[f"{prefix_bn}.weight"], state_dict[f"{prefix_bn}.bias"],
            state_dict[f"{prefix_bn}.running_mean"],
            state_dict[f"{prefix_bn}.running_var"], stride=stride, dtype=dtype,
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
