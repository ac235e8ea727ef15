"""Joint detection + per-point flow from a frozen DR-SPAAM backbone.

Rebuild of the reference ``FlowDROW_pretrained``
(``src/depracted/model/dr_spaam.py:279-322``): the spatial-attention
similarity features of a (pre-trained, frozen) SpatialDROW, concatenated with
the current ranges, feed a small conv stack regressing per-point flow.

Freezing is functional: the detector sub-tree runs with ``train=False``
(frozen batch stats) and its outputs pass through ``stop_gradient``, so no
gradient reaches detector parameters regardless of the optimizer
configuration. (The reference instead sets ``requires_grad=False`` on the
loaded torch module, ``dr_spaam.py:294-298``.)

Note: the reference's flow head declares ``window_size`` input channels but
is fed ``window_size + 1`` features after the range concat (a latent crash in
the bit-rotted original, ``dr_spaam.py:300,315``); here the head takes the
``window + 1`` channels it actually receives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from planar_optical_flow_tpu.models.blocks import ConvBlock
from planar_optical_flow_tpu.models.spatial_drow import SpatialDrow


class FlowDrow(nn.Module):
    dropout: float = 0.0
    alpha: float = 0.5
    window_size: int = 7
    pedestrian_only: bool = False
    freeze_detector: bool = True
    remat: bool = False
    banded_chunk: int = 0

    def setup(self):
        self.dr_spaam = SpatialDrow(
            dropout=self.dropout,
            alpha=self.alpha,
            window_size=self.window_size,
            pedestrian_only=self.pedestrian_only,
            remat=self.remat,
            banded_chunk=self.banded_chunk,
        )
        self.conv1 = ConvBlock(128, 3, name="flow_conv1")
        self.conv2 = ConvBlock(64, 3, name="flow_conv2")
        self.conv3 = ConvBlock(32, 3, name="flow_conv3")
        # like the reference (`_conv(32, 2, kernel_size=1)`), the output layer
        # is a pointwise conv *block* (conv + BN + LeakyReLU)
        self.flow_out = ConvBlock(2, 1, name="flow_out")

    def _flow_head(self, sim_band, cur_scan, train):
        feat = jnp.concatenate([sim_band, cur_scan[..., None]], axis=-1)
        out = self.conv1(feat, train=train)
        out = self.conv2(out, train=train)
        out = self.conv3(out, train=train)
        return self.flow_out(out, train=train)  # (B, n_cutout, 2)

    def __call__(self, x, cur_scan, train: bool = True):
        """x: ``(B, n_cutout, n_scan, n_pts)`` cutouts; cur_scan:
        ``(B, n_cutout)`` current ranges. Returns (cls, reg, flow)."""
        det_train = train and not self.freeze_detector
        pred_cls, pred_reg, sim_band = self.dr_spaam(x, train=det_train)
        if self.freeze_detector:
            pred_cls = jax.lax.stop_gradient(pred_cls)
            pred_reg = jax.lax.stop_gradient(pred_reg)
            sim_band = jax.lax.stop_gradient(sim_band)
        pred_flow = self._flow_head(sim_band, cur_scan, train)
        return pred_cls, pred_reg, pred_flow

    def stream_step(self, x, cur_scan, template=None):
        """Streaming joint inference with explicit template carry (the
        serve path of ``depracted_scripts/infer_person_flow.py:101-187``)."""
        pred_cls, pred_reg, new_template, sim_band = self.dr_spaam.stream_step(
            x, template
        )
        pred_flow = self._flow_head(sim_band, cur_scan, train=False)
        return pred_cls, pred_reg, pred_flow, new_template
