"""DR-SPAAM: spatial-attention auto-regressive template memory.

Rebuild of the reference ``_SpatialAttention`` + ``SpatialDROW``
(``src/depracted/model/dr_spaam.py:124-277``). Semantics:

* each cutout's feature map is embedded to 128-d (the reference uses a
  full-width conv with no padding — mathematically a dense layer over the
  flattened feature map, which is how it is implemented here: one MXU matmul
  instead of 450 tiny convs),
* pairwise similarity between current-scan embeddings and template
  embeddings (``(B, 450, 450)`` matmul),
* banded masked softmax over the ±window/2 neighboring cutouts,
* template update ``out = alpha * x + (1 - alpha) * attn(template)``,
* the banded similarity values (pre-softmax) are returned as features for
  the flow head.

The temporal recursion runs as a statically unrolled loop over the scan axis
(<= 11 steps; each step is dominated by the two matmuls, so unrolling under
jit is cheaper than ``lax.scan`` loop plumbing and keeps BatchNorm stats
updates identical to the reference's per-step calls). Streaming inference is
the same cell exposed with an explicit template carry
(:meth:`SpatialDrow.stream_step`).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from planar_optical_flow_tpu.models.blocks import KAIMING_LEAKY
from planar_optical_flow_tpu.models.drow import DrowBackbone, DrowHead


def neighbor_band(n_cutout: int, window_size: int) -> np.ndarray:
    """Edge-clamped band indices ``(n_cutout, window)`` (reference
    ``_generate_neighbor_mask``, ``dr_spaam.py:145-160``)."""
    hw = window_size // 2
    ids = np.arange(n_cutout)[:, None] + np.arange(-hw, hw + 1)[None, :]
    return np.clip(ids, 0, n_cutout - 1)


def band_mask(n_cutout: int, window_size: int) -> np.ndarray:
    """Dense ``(n_cutout, n_cutout)`` 0/1 mask with 1 on the clamped band."""
    mask = np.zeros((n_cutout, n_cutout), dtype=np.float32)
    ids = neighbor_band(n_cutout, window_size)
    np.put_along_axis(mask, ids, 1.0, axis=1)
    return mask


def _chunk_plan(n_cutout: int, window_size: int, chunk: int):
    """Static index plan for the block-banded attention path.

    Rows are split into ``n_chunks`` of ``chunk``; each chunk attends to a
    ``chunk + 2*halo`` window of (zero-padded) columns. Returns
    (n_chunks, halo, mask (n_chunks, chunk, width), band_cols
    (n_chunks, chunk, window_size) local column ids reproducing the
    edge-clamped band gather of the dense path).
    """
    assert n_cutout % chunk == 0, (n_cutout, chunk)
    hw = window_size // 2
    halo = hw
    width = chunk + 2 * halo
    n_chunks = n_cutout // chunk
    mask = np.zeros((n_chunks, chunk, width), dtype=np.float32)
    band_cols = np.zeros((n_chunks, chunk, window_size), dtype=np.int64)
    for n in range(n_chunks):
        start = n * chunk - halo  # global col of local col 0 (may be < 0)
        for i in range(chunk):
            g = n * chunk + i
            for o in range(-hw, hw + 1):
                j = g + o
                if 0 <= j < n_cutout:
                    mask[n, i, j - start] = 1.0
                band_cols[n, i, o + hw] = np.clip(j, 0, n_cutout - 1) - start
    return n_chunks, halo, mask, band_cols


class SpatialAttentionGate(nn.Module):
    """One step of the auto-regressive spatial-attention template update.

    Features are handled FLAT — ``(B, n_cutout, D)`` with ``D = L * C`` —
    so no per-step layout changes are needed on the (large) template carry;
    only the detection head ever reshapes back to ``(L, C)``.
    """

    alpha: float = 0.5
    window_size: int = 7
    # block-banded attention: compute similarity/softmax/mix only on
    # chunk x (chunk + window) blocks instead of the dense cutout x cutout
    # matrices — mathematically identical (everything off-band is masked to
    # zero either way), ~7x less attention compute at 450 cutouts. 0
    # disables. NOTE measured on v5e at 450 cutouts the DENSE path is faster
    # (the windowed template copy costs more than the saved matmul FLOPs —
    # the op is template-bandwidth-bound); the banded path pays off only for
    # much larger point counts. Kept as a tested option.
    banded_chunk: int = 0

    @nn.compact
    def __call__(self, x, template, train: bool = True):
        """x, template: ``(B, n_cutout, D)`` flattened cutout features.

        Returns (new_template ``(B, n_cutout, D)``,
                 sim_band ``(B, n_cutout, window)``).
        """
        b, ct, d = x.shape

        dense = nn.Dense(128, kernel_init=KAIMING_LEAKY, name="embed")
        bn = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, name="embed_bn")

        def emb(f):
            e = dense(f.reshape(b * ct, d))
            e = bn(e)
            return nn.leaky_relu(e, negative_slope=0.1).reshape(b, ct, 128)

        emb_x = emb(x)
        emb_t = emb(template)

        if self.banded_chunk and ct % self.banded_chunk == 0:
            mixed, sim_band = self._block_banded(
                emb_x, emb_t, template, b, ct, d
            )
        else:
            mixed, sim_band = self._dense(emb_x, emb_t, template, ct)

        new_template = self.alpha * x + (1.0 - self.alpha) * mixed
        return new_template, sim_band

    def _dense(self, emb_x, emb_t, template, ct):
        sim = jnp.einsum("bic,bjc->bij", emb_x, emb_t)  # (B, ct, ct)

        band = jnp.asarray(neighbor_band(ct, self.window_size))
        sim_band = jnp.take_along_axis(sim, band[None], axis=2)

        # keep the mask in the compute dtype: a f32 constant would silently
        # promote the whole attention (and the template carry) to f32
        mask = jnp.asarray(band_mask(ct, self.window_size), dtype=sim.dtype)
        masked = sim - jnp.asarray(1e10, sim.dtype) * (1.0 - mask)
        attn = nn.softmax(masked, axis=-1)
        attn = attn * mask  # exact zeros off-band (dr_spaam.py:196-201)
        attn = attn / jnp.maximum(attn.sum(axis=-1, keepdims=True),
                                  jnp.asarray(1e-20, sim.dtype))

        mixed = jnp.einsum("bij,bjd->bid", attn, template)
        return mixed, sim_band

    def _block_banded(self, emb_x, emb_t, template, b, ct, d):
        chunk = self.banded_chunk
        n_chunks, halo, mask_np, band_cols_np = _chunk_plan(
            ct, self.window_size, chunk
        )
        width = chunk + 2 * halo
        dt = emb_x.dtype

        def window_view(a):
            """(B, ct, F) -> (B, n_chunks, width, F) overlapping windows."""
            pad = jnp.pad(a, ((0, 0), (halo, halo), (0, 0)))
            wins = [
                jax.lax.dynamic_slice_in_dim(pad, n * chunk, width, axis=1)
                for n in range(n_chunks)
            ]
            return jnp.stack(wins, axis=1)

        ex = emb_x.reshape(b, n_chunks, chunk, -1)
        et_w = window_view(emb_t)
        sim = jnp.einsum("bncE,bnwE->bncw", ex, et_w)  # (B, n, chunk, width)

        band_cols = jnp.asarray(band_cols_np)  # (n, chunk, window)
        sim_band = jnp.take_along_axis(
            sim, jnp.broadcast_to(band_cols[None],
                                  (b,) + band_cols.shape), axis=3,
        ).reshape(b, ct, -1)

        mask = jnp.asarray(mask_np, dtype=dt)  # (n, chunk, width)
        masked = sim - jnp.asarray(1e10, dt) * (1.0 - mask)
        attn = nn.softmax(masked, axis=-1)
        attn = attn * mask
        attn = attn / jnp.maximum(attn.sum(axis=-1, keepdims=True),
                                  jnp.asarray(1e-20, dt))

        t_w = window_view(template)  # (B, n, width, D)
        mixed = jnp.einsum("bncw,bnwD->bncD", attn, t_w).reshape(b, ct, d)
        return mixed, sim_band


class SpatialDrow(nn.Module):
    """DROW backbone + spatial-attention temporal memory + detection head.

    Training/eval call: ``(B, n_cutout, n_scan, n_pts)`` -> (cls, reg,
    sim_band) where the template is initialized from scan 0 and updated
    through the remaining scans (reference ``dr_spaam.py:262-277``).
    """

    dropout: float = 0.0
    alpha: float = 0.5
    window_size: int = 7
    pedestrian_only: bool = False
    remat: bool = False  # trade backbone recompute for training memory
    banded_chunk: int = 0  # block-banded attention (see SpatialAttentionGate)

    def setup(self):
        backbone_cls = (
            nn.remat(DrowBackbone, static_argnums=(2,))
            if self.remat else DrowBackbone
        )
        self.backbone = backbone_cls(dropout=self.dropout)
        self.gate = SpatialAttentionGate(
            alpha=self.alpha, window_size=self.window_size,
            banded_chunk=self.banded_chunk,
        )
        self.head = DrowHead(
            num_classes=1 if self.pedestrian_only else 4, dropout=self.dropout
        )

    # ----------------------------------------------------------- internals

    def _encode(self, x, train):
        """(B, ct, S, pts) -> (S, B, ct, L*C) flat features, one backbone
        call. The scan axis is MAJOR in the output so the temporal loop
        slices contiguous per-scan blocks — slicing the middle axis of a
        (B, ct, S, D) view forced XLA into ~10 ms/step of layout copies at
        the 8x11 working point (experiments/profile_train_det.py); the
        input-side transpose here is 128x smaller than the feature map."""
        b, ct, s, p = x.shape
        xt = x.transpose(2, 0, 1, 3)  # (S, B, ct, pts)
        f = self.backbone(xt.reshape(s * b * ct, p, 1), train)
        return f.reshape(s, b, ct, f.shape[-2] * f.shape[-1])

    def _head(self, fused_flat, train):
        b, ct, d = fused_flat.shape
        c = 256  # backbone output channels (DrowBackbone block2)
        cls, reg = self.head(fused_flat.reshape(b * ct, d // c, c),
                             train=train)
        return cls.reshape(b, ct, -1), reg.reshape(b, ct, 2)

    # ------------------------------------------------------------- training

    def __call__(self, x, train: bool = True):
        feats = self._encode(x, train)  # (S, B, ct, D)
        n_scan = feats.shape[0]
        template = feats[0]
        sim_band = None
        for i in range(1, n_scan):
            template, sim_band = self.gate(feats[i], template,
                                           train=train)
        if sim_band is None:  # single-scan input: self-attention bootstrap
            template, sim_band = self.gate(template, template, train=train)
        pred_cls, pred_reg = self._head(template, train)
        return pred_cls, pred_reg, sim_band

    # ------------------------------------------------------------ streaming

    def stream_step(self, x, template=None):
        """Stateful single-scan inference step (reference ``testing=True``
        branch, ``dr_spaam.py:239-250``).

        Args:
          x: ``(B, n_cutout, n_pts)`` cutouts of ONE scan.
          template: carried ``(B, n_cutout, L*C)`` flat feature template or
            None to bootstrap from this scan.

        Returns (cls, reg, new_template, sim_band).
        """
        feats = self._encode(x[:, :, None, :], train=False)[0]
        if template is None:
            # bootstrap: the raw features become the template; the gate only
            # supplies the similarity features (dr_spaam.py:242-245)
            new_template = feats
            _, sim_band = self.gate(feats, feats, train=False)
        else:
            new_template, sim_band = self.gate(feats, template, train=False)
        pred_cls, pred_reg = self._head(new_template, train=False)
        return pred_cls, pred_reg, new_template, sim_band
