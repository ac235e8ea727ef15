"""Detector over fully-connected per-beam encodings (fc1d / fc1d_fea /
fc2d).

The reference's ``DROWDataset2`` can emit three non-cutout input encodings
(``/root/reference/src/utils/dataset_dr_spaam.py:437-460``): raw ranges
(``fc1d``), transposed cutouts (``fc1d_fea``) and a TSDF polar grid
(``fc2d``, op at ``utils.py:492-531``) — all meant for a network that
processes each beam's full feature column. The reference never ships that
network (model type ``"dr-spaam"`` is NotImplemented in its registry);
this module provides the TPU-native counterpart.

Design (TPU-first, not a conv2d translation): every encoding is normalized
to ``(B, S, R, P)`` — S temporal channels x R per-beam features x P beams.
Each beam's (S*R) column is embedded with ONE dense matmul (the "fully
connected" of fc*, MXU-shaped: P rows x S*R contraction), followed by k=3
conv blocks along the beam axis for local context, and DROW-style per-beam
cls/reg heads — so the fc detectors drop into the same DetectionTask
losses, NMS and AP evaluation as the cutout models.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from planar_optical_flow_tpu.models.blocks import ConvBlock, KAIMING_LEAKY


class PolarGridDetector(nn.Module):
    """fc-family detector: ``(B, S, R, P)`` -> per-beam (cls, reg)."""

    num_classes: int = 4
    hidden: int = 256
    dropout: float = 0.0

    @nn.compact
    def __call__(self, grid, train: bool = True):
        b, s, r, p = grid.shape
        # (B, P, S*R): one embedding matmul per beam column
        x = grid.transpose(0, 3, 1, 2).reshape(b, p, s * r)
        x = nn.Dense(self.hidden, kernel_init=KAIMING_LEAKY,
                     name="embed")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="embed_bn")(x)
        x = nn.leaky_relu(x, negative_slope=0.1)
        if self.dropout > 0:
            x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        # local beam context (k=3 convs along P)
        x = ConvBlock(self.hidden, 3, name="ctx1")(x, train=train)
        x = ConvBlock(self.hidden // 2, 3, name="ctx2")(x, train=train)
        pred_cls = nn.Dense(self.num_classes, name="cls")(x)
        pred_reg = nn.Dense(2, name="reg")(x)
        return pred_cls, pred_reg
