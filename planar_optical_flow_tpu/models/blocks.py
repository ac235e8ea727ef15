"""Shared building blocks.

All modules are channels-last ``(B, L, C)`` — the natural layout for XLA/TPU
convolutions. Initialization mirrors the reference's Kaiming-normal for
leaky-relu (``a=0.1``) convolutions and unit-gamma/zero-beta batch norms
(e.g. reference ``prototype.py:50-55``, ``dr_spaam.py:72-77``).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

# torch kaiming_normal_(a=0.1, nonlinearity="leaky_relu"):
#   std = sqrt(2 / (1 + a^2)) / sqrt(fan_in)
KAIMING_LEAKY = nn.initializers.variance_scaling(
    scale=2.0 / (1.0 + 0.1**2), mode="fan_in", distribution="normal"
)

# Process-wide default conv implementation for ConvBlock (resolved at
# TRACE time; changing it between jit traces retraces):
#   "conv" — lax convolution via nn.Conv (XLA's conv lowering),
#   "taps" — tap-concat matmul: y[l] = [x[l-h..l+h]] @ Wcat + b, one
#            (B*L, k*C) x (k*C, F) dot. Differentiable plain XLA (the
#            backward is matmul transposes + shifted adds), same param
#            tree as nn.Conv, so checkpoints are interchangeable. The
#            serving kernels proved this form beats the conv lowering for
#            the skinny K<=768 DR-SPAAM shapes; `conv_impl: taps` in the
#            Trainer config A/Bs it for training (measured NEGATIVE on
#            the full train step: the (B, L, 3C) concat materializes fwd
#            and bwd — see STATUS.md / probe_train_conv.py),
#   "mm3" — per-tap matmuls: y = shift(x,-1) @ W0 + x @ W1 + shift(x,1)
#            @ W2 + b. No concat ever materializes; the backward is per-
#            tap matmul transposes + counter-shifts. Same param tree.
_DEFAULT_CONV_IMPL = ["conv"]


def set_default_conv_impl(impl: str):
    if impl not in ("conv", "taps", "mm3"):
        raise ValueError(f"unknown conv impl {impl!r}")
    _DEFAULT_CONV_IMPL[0] = impl


class _TapsConv(nn.Module):
    """kernel>1, stride-1 SAME conv as ONE tap-concat matmul. Param names
    and shapes match ``nn.Conv`` (kernel ``(k, C, F)``, bias ``(F,)``)."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        b, l, c = x.shape
        kernel = self.param("kernel", KAIMING_LEAKY, (k, c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # match flax nn.Conv's SAME padding split (low=(k-1)//2,
        # high=k//2) so even kernel sizes stay checkpoint-interchangeable
        # with impl="conv" instead of silently shifting by one tap
        lo = (k - 1) // 2
        xp = jnp.pad(x, ((0, 0), (lo, k // 2), (0, 0)))
        xcat = jnp.concatenate(
            [xp[:, j:j + l, :] for j in range(k)], axis=-1)
        y = jnp.einsum(
            "blc,cf->blf", xcat,
            kernel.reshape(k * c, self.features),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        return y + bias


class _Mm3Conv(nn.Module):
    """kernel-k, stride-1 SAME conv as k per-tap matmuls on shifted
    views. Param names and shapes match ``nn.Conv``. Unlike
    :class:`_TapsConv` nothing (B, L, kC)-sized ever materializes — each
    tap is a zero-padded shift (pad+slice, no gather) followed by a
    (B*L, C) x (C, F) dot; autodiff gives per-tap matmul transposes and
    counter-shifts."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        b, l, c = x.shape
        kernel = self.param("kernel", KAIMING_LEAKY, (k, c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        lo = (k - 1) // 2  # nn.Conv SAME padding split
        y = None
        for j in range(k):
            o = j - lo  # tap j reads x[l + o]
            if o == 0:
                xj = x
            elif o > 0:
                xj = jnp.pad(x[:, o:, :], ((0, 0), (0, o), (0, 0)))
            else:
                xj = jnp.pad(x[:, :o, :], ((0, 0), (-o, 0), (0, 0)))
            t = jnp.einsum("blc,cf->blf", xj, kernel[j],
                           preferred_element_type=jnp.float32)
            y = t if y is None else y + t
        return y.astype(x.dtype) + bias


class ConvBlock(nn.Module):
    """Conv1D + BatchNorm + LeakyReLU.

    ``impl``: None resolves to the process default (see
    :func:`set_default_conv_impl`); "taps"/"mm3" apply only to kernel>1
    stride-1 blocks (others always use the lax convolution)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    negative_slope: float = 0.1
    use_bn: bool = True
    impl: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        impl = self.impl or _DEFAULT_CONV_IMPL[0]
        if impl == "taps" and self.kernel_size > 1 and self.stride == 1:
            x = _TapsConv(self.features, self.kernel_size,
                          name="Conv_0")(x)
        elif impl == "mm3" and self.kernel_size > 1 and self.stride == 1:
            x = _Mm3Conv(self.features, self.kernel_size,
                         name="Conv_0")(x)
        else:
            # Explicit torch-style padding (lo, hi) = ((k-1)//2, k//2): for
            # stride 1 this is exactly flax "SAME"; for stride 2 on an EVEN
            # length flax "SAME" pads (0, 1) while torch's padding=1 pads
            # (1, 1) — a one-beam alignment shift. The reference models use
            # torch padding=1 (e.g. ``prototype.py:40-42`` stride-2
            # encoders), so the explicit split keeps stride-2 outputs
            # numerically identical to the reference
            # (tests/test_reference_parity.py::test_flow_unet_matches_prototype).
            k = self.kernel_size
            x = nn.Conv(
                self.features,
                kernel_size=(k,),
                strides=(self.stride,),
                padding=[((k - 1) // 2, k // 2)] if k > 1 else "VALID",
                kernel_init=KAIMING_LEAKY,
            )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5
            )(x)
        return nn.leaky_relu(x, negative_slope=self.negative_slope)


class DenseBlock(nn.Module):
    """Linear + optional BatchNorm + optional LeakyReLU (reference ``_fc``)."""

    features: int
    use_bn: bool = True
    use_act: bool = True
    negative_slope: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Dense(self.features, kernel_init=KAIMING_LEAKY)(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5
            )(x)
        if self.use_act:
            x = nn.leaky_relu(x, negative_slope=self.negative_slope)
        return x


def conv_block(features, kernel_size=3, stride=1, negative_slope=0.1):
    return ConvBlock(features, kernel_size, stride, negative_slope)


def dense_block(features, use_bn=True, use_act=True):
    return DenseBlock(features, use_bn, use_act)


class ConvStack(nn.Module):
    """A sequence of same-kernel ConvBlocks (reference ``nn.Sequential`` of
    ``_conv3x3``)."""

    features: Sequence[int]
    kernel_size: int = 3
    negative_slope: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = True):
        for f in self.features:
            x = ConvBlock(
                f, self.kernel_size, negative_slope=self.negative_slope
            )(x, train=train)
        return x


def max_pool1d(x, window: int = 2):
    """Non-overlapping max pool over the length axis of ``(B, L, C)``.

    Deliberately ``reduce_window``: although its backward lowers to XLA's
    ``select_and_scatter`` (which looks expensive in traces), it beats both
    reshape+``jnp.max`` (tie-splitting backward needs broadcasts + tie
    counts) and ``jnp.maximum(even, odd)`` (strided lane slices) by 2-4x
    fwd+bwd at the DR-SPAAM backbone shape — see
    ``experiments/probe_pool.py`` (TPU v5e: 6.9 vs 20.8 vs 17.6 ms bf16).
    """
    return nn.max_pool(x, window_shape=(window,), strides=(window,))


def avg_pool_full(x):
    """Average over the entire length axis: ``(B, L, C) -> (B, C)``."""
    return jnp.mean(x, axis=-2)


def upsample_nearest(x, new_len: int):
    """Nearest-neighbor resize along the length axis of ``(B, L, C)``
    (matches ``F.interpolate(mode='nearest')``)."""
    b, l, c = x.shape
    idx = (jnp.arange(new_len) * l) // new_len
    return x[:, idx, :]
