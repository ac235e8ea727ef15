"""Planar-flow U-Net with a banded correlation cost volume.

Rebuild of the reference ``Prototype`` model
(``/root/reference/src/depracted/model/prototype.py:34-156``): a shared 1-D
conv encoder over both scans of a pair, a correlation fusion layer that
matches 3-point feature patches between the scans within a ±max_displacement
band, and a skip-connected decoder regressing per-point 2-D flow.

TPU notes: the full P×P correlation at the bottleneck (P=57 after 3 stride-2
stages) is a tiny dense matmul — MXU-friendly — so the band is *selected*
after one einsum rather than assembled with gathers (same values as the
reference's index_select at ``prototype.py:137-152``).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from planar_optical_flow_tpu.models.blocks import ConvBlock, upsample_nearest


def _patch_features(feat, kernel_size: int = 3):
    """Concat each point's ±half-kernel neighborhood (edge-clamped):
    ``(B, P, C) -> (B, P, K*C)`` (reference ``prototype.py:123-135``)."""
    b, p, c = feat.shape
    hk = kernel_size // 2
    ids = jnp.clip(
        jnp.arange(p)[:, None] + jnp.arange(-hk, hk + 1)[None, :], 0, p - 1
    )  # (P, K)
    patches = feat[:, ids, :]  # (B, P, K, C)
    return patches.reshape(b, p, kernel_size * c)


def correlation_cost_volume(feat1, feat2, max_displacement: int = 5,
                            kernel_size: int = 3):
    """Banded patch correlation: ``(B, P, C) x2 -> (B, P, 2*d+1)``.

    Full correlation matrix via one MXU matmul, then a static banded gather
    with edge-clamped indices (exactly the reference's displacement indexing,
    ``prototype.py:140-152``).
    """
    p = feat1.shape[1]
    patch1 = _patch_features(feat1, kernel_size)
    patch2 = _patch_features(feat2, kernel_size)
    corr = jnp.einsum("bpc,bqc->bpq", patch1, patch2)  # (B, P, P)
    band = jnp.clip(
        jnp.arange(p)[:, None]
        + jnp.arange(-max_displacement, max_displacement + 1)[None, :],
        0,
        p - 1,
    )  # (P, 2d+1)
    return jnp.take_along_axis(corr, band[None], axis=2)


class FlowUNet(nn.Module):
    """Encoder/correlation/decoder flow net over ``(B, P, C_in)`` scan pairs.

    Returns per-point flow ``(B, P, 2)``. Like the reference, the head is a
    pointwise conv *block* (conv + BN + LeakyReLU, ``prototype.py:46``);
    set ``linear_head=True`` for an unconstrained regression output.
    """

    in_channels: int = 2
    max_displacement: int = 5
    negative_slope: float = 0.01
    linear_head: bool = False

    def setup(self):
        # explicit names keep the parameter tree identical to the original
        # nn.compact layout (checkpoints and the reference-parity mapping
        # are unaffected by the encode/decode split)
        self.enc0 = ConvBlock(64, 3, 2, self.negative_slope,
                              name="encoder_0")
        self.enc1 = ConvBlock(128, 3, 2, self.negative_slope,
                              name="encoder_1")
        self.enc2 = ConvBlock(256, 3, 2, self.negative_slope,
                              name="encoder_2")
        self.dec1 = ConvBlock(128, 3, 1, self.negative_slope,
                              name="decoder_1")
        self.dec0 = ConvBlock(128, 3, 1, self.negative_slope,
                              name="decoder_0")
        if self.linear_head:
            self.head = nn.Dense(2, name="flow_reg_linear")
        else:
            self.head = ConvBlock(2, 1, 1, self.negative_slope,
                                  name="flow_reg")

    def encode(self, scan1, scan2, train: bool = True):
        """Shared encoder + correlation; returns the decoder's inputs
        (cost volume + the scan-1 skip features) — the natural first
        pipeline stage (``parallel.flow_unet_pipeline_stages``)."""
        f1_0 = self.enc0(scan1, train=train)  # (B, 225, 64)
        f2_0 = self.enc0(scan2, train=train)
        f1_1 = self.enc1(f1_0, train=train)  # (B, 113, 128)
        f2_1 = self.enc1(f2_0, train=train)
        f1_2 = self.enc2(f1_1, train=train)  # (B, 57, 256)
        f2_2 = self.enc2(f2_1, train=train)
        cost = correlation_cost_volume(f1_2, f2_2, self.max_displacement)
        return cost, f1_1, f1_0, scan1

    def decode(self, cost, f1_1, f1_0, scan1, train: bool = True):
        """Skip-connected decoder + flow head (second pipeline stage)."""
        up1 = upsample_nearest(cost, f1_1.shape[1])
        up1 = jnp.concatenate([f1_1, up1], axis=-1)
        up1 = self.dec1(up1, train=train)

        up0 = upsample_nearest(up1, f1_0.shape[1])
        up0 = jnp.concatenate([f1_0, up0], axis=-1)
        up0 = self.dec0(up0, train=train)

        out = upsample_nearest(up0, scan1.shape[1])
        out = jnp.concatenate([scan1, out], axis=-1)
        if self.linear_head:
            return self.head(out)
        return self.head(out, train=train)

    def __call__(self, scan1, scan2=None, train: bool = True):
        if scan2 is None:
            scan2 = scan1
        return self.decode(*self.encode(scan1, scan2, train=train),
                           train=train)


class FlowUNetAdditive(nn.Module):
    """Additive-fusion debug variant (reference ``PrototypeTest``,
    ``prototype.py:158-200``): shared 2-conv encoder, concat fusion, conv
    decoder, pointwise flow head."""

    in_channels: int = 2
    negative_slope: float = 0.01

    @nn.compact
    def __call__(self, scan1, scan2=None, train: bool = True):
        if scan2 is None:
            scan2 = scan1
        c1 = ConvBlock(32, 3, 1, self.negative_slope, name="conv1")
        c2 = ConvBlock(64, 3, 1, self.negative_slope, name="conv2")
        f1 = c2(c1(scan1, train=train), train=train)
        f2 = c2(c1(scan2, train=train), train=train)
        f = jnp.concatenate([f1, f2], axis=-1)
        f = ConvBlock(64, 3, 1, self.negative_slope, name="conv3")(f, train=train)
        f = ConvBlock(32, 3, 1, self.negative_slope, name="conv4")(f, train=train)
        return ConvBlock(2, 1, 1, self.negative_slope, name="flow_reg")(
            f, train=train
        )
