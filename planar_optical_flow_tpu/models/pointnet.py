"""PointNet bounding-box regressor for lidar segments.

Rebuild of the reference ``src/model/box_regression.py`` (the "modern" model)
and the older ``src/depracted/model/pointnet.py``: per-point MLP (pointwise
1x1 convs == Dense layers), channelwise max pooling to a global feature, and
an FC head regressing ``[l, w, ori]`` (2D) or ``[cz, l, w, h, ori]`` (3D).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from planar_optical_flow_tpu.models.blocks import DenseBlock


class PointNet(nn.Module):
    """Per-point MLP + global max pool: ``(B, N, C_in) -> (B, 1024)``
    (reference ``box_regression.py:105-123``)."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        for f in (64, 64, 128, 1024):
            x = DenseBlock(f)(x, train=train)
        return jnp.max(x, axis=-2)


class TNet(nn.Module):
    """Input-transform net predicting a ``(C, C)`` matrix per sample
    (reference ``box_regression.py:71-102``; present for API parity —
    the reference never wires it into the regressor either)."""

    input_dim: int = 3

    @nn.compact
    def __call__(self, x, train: bool = True):
        for f in (64, 128, 1024):
            x = DenseBlock(f)(x, train=train)
        x = jnp.max(x, axis=-2)
        x = DenseBlock(512)(x, train=train)
        x = DenseBlock(256)(x, train=train)
        x = DenseBlock(self.input_dim**2, use_bn=False, use_act=False)(
            x, train=train
        )
        return x.reshape(-1, self.input_dim, self.input_dim)


class BoundingBoxRegressor(nn.Module):
    """PointNet backbone + 3-layer FC head
    (reference ``box_regression.py:126-170``).

    input_dim: 2/3 point coords (+1 if an input angle channel is appended).
    target_dim: 3 for 2D boxes ``[l, w, ori]``, 5 for 3D ``[cz, l, w, h, ori]``.
    """

    input_dim: int = 4
    target_dim: int = 5
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = PointNet(name="backbone")(x, train=train)
        x = DenseBlock(512, name="fc1")(x, train=train)
        x = DenseBlock(256, name="fc2")(x, train=train)
        if self.dropout > 0:
            x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        return DenseBlock(
            self.target_dim, use_bn=False, use_act=False, name="fc3"
        )(x, train=train)
