"""DROW person detector on 2-D lidar cutouts.

Rebuild of the reference ``DROW`` (``src/depracted/model/dr_spaam.py:41-121``):
a conv backbone over each cutout, temporal fusion by summation over the scan
axis, then a post-fusion conv stack with average pooling feeding per-cutout
classification logits and a 2-D center vote.

Layout: channels-last; the per-cutout convs run as one batched call over
``B * n_cutout * n_scan`` rows — the whole temporal stack is encoded in a
single MXU-friendly convolution instead of per-scan loops.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from planar_optical_flow_tpu.models.blocks import (
    ConvStack,
    max_pool1d,
    avg_pool_full,
)


class DrowBackbone(nn.Module):
    """Per-cutout feature extractor (reference conv blocks 1-2)."""

    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = True):
        # x: (N, n_pts, 1)
        x = ConvStack((64, 64, 128), name="block1")(x, train=train)
        x = max_pool1d(x)
        x = self._maybe_dropout(x, train)
        x = ConvStack((128, 128, 256), name="block2")(x, train=train)
        x = max_pool1d(x)
        x = self._maybe_dropout(x, train)
        return x  # (N, n_pts // 4, 256)

    def _maybe_dropout(self, x, train):
        if self.dropout > 0:
            x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        return x


class DrowHead(nn.Module):
    """Post-fusion conv stack + cls/reg heads (reference conv blocks 3-4 and
    the 1x1 head convs, ``dr_spaam.py:102-114``)."""

    num_classes: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = True):
        # x: (N, n_pts // 4, 256)
        x = ConvStack((256, 256, 512), name="block3")(x, train=train)
        x = max_pool1d(x)
        if self.dropout > 0:
            x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        x = ConvStack((512, 256, 128)[1:], name="block4")(x, train=train)
        x = avg_pool_full(x)  # (N, 128)
        pred_cls = nn.Dense(self.num_classes, name="cls")(x)
        pred_reg = nn.Dense(2, name="reg")(x)
        return pred_cls, pred_reg


class Drow(nn.Module):
    """Full DROW: backbone per (cutout, scan), sum-fuse over scans, head.

    Input ``(B, n_cutout, n_scan, n_pts)`` cutouts; returns
    (cls ``(B, n_cutout, C)``, reg ``(B, n_cutout, 2)``).
    ``pedestrian_only`` selects a single-logit head (binary).
    """

    dropout: float = 0.0
    pedestrian_only: bool = False
    remat: bool = False  # rematerialize backbone activations in backward

    def setup(self):
        backbone_cls = (
            nn.remat(DrowBackbone, static_argnums=(2,))
            if self.remat else DrowBackbone
        )
        self.backbone = backbone_cls(dropout=self.dropout)
        self.head = DrowHead(
            num_classes=1 if self.pedestrian_only else 4, dropout=self.dropout
        )

    def encode_cutouts(self, x, train: bool = True):
        """(B, n_cutout, n_scan, n_pts) -> (B, n_cutout, n_scan, L, C)."""
        b, ct, s, p = x.shape
        f = self.backbone(x.reshape(b * ct * s, p, 1), train)
        return f.reshape(b, ct, s, f.shape[-2], f.shape[-1])

    def fused_head(self, fused, train: bool = True):
        """(B, n_cutout, L, C) -> per-cutout (cls, reg)."""
        b, ct = fused.shape[:2]
        cls, reg = self.head(
            fused.reshape(b * ct, fused.shape[-2], fused.shape[-1]), train=train
        )
        return cls.reshape(b, ct, -1), reg.reshape(b, ct, 2)

    def __call__(self, x, train: bool = True):
        feats = self.encode_cutouts(x, train=train)
        fused = jnp.sum(feats, axis=2)  # temporal fusion (dr_spaam.py:99-100)
        return self.fused_head(fused, train=train)
