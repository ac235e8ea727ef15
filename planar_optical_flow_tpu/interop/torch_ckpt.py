"""Import reference (PyTorch) checkpoints into this framework.

Users of the reference (`huzjkevin/planar_optical_flow`) hold trained
``.pth`` checkpoints — e.g. the ``pre_trained_ckpts/dr_spaam_e40.pth``
detector that ``FlowDROW_pretrained`` loads (reference
``src/depracted/model/dr_spaam.py:294-298``). This module converts such
checkpoints into this repo's flax variable trees so migration does not
require retraining.

Checkpoint envelope (both reference generations use the same keys):
``{"epoch", "it"|"step", "model_state", "optimizer_state"}`` —
``src/utils/train_utils.py:8-22`` and ``src/pipeline/logger.py:158-177``.
``model_state`` is a torch ``state_dict``. The torch optimizer state is NOT
imported (Adam moments are meaningless to a fresh optax state); epoch/step
counters are carried.

Weight-layout conversions (validated leaf-by-leaf and end-to-end by
``tests/test_reference_parity.py``, which round-trips every supported model
through this importer and asserts the flax forward matches the reference
torch forward to 1e-3):

* ``nn.Conv1d``  ``(out, in, k)``      -> flax ``nn.Conv`` ``(k, in, out)``
* pointwise conv ``(out, in, 1)``      -> flax ``nn.Dense`` ``(in, out)``
* full-width conv ``(out, in, L)``     -> ``nn.Dense`` over the flattened
  ``(L*C)`` feature in ``(l, c)`` row order (the DR-SPAAM gate embedding)
* ``nn.Linear`` ``(out, in)``          -> ``nn.Dense`` ``(in, out)``
* ``nn.BatchNorm1d``                   -> params ``{scale, bias}`` +
  batch_stats ``{mean, var}``

Supported model types (the ``models/registry.py`` names): ``flow_unet`` /
``prototype``, ``prototype_test``, ``drow``, ``dr-spaam`` /
``spatial_drow``, ``flow_drow``, ``box_reg``.

``flow_drow`` imports the detector subtree only: the reference's flow-head
forward is genuinely broken (its first conv takes ``window_size`` input
channels but the double-permute at ``dr_spaam.py:316-317`` feeds it the
``n_cutout`` axis; this repo's head takes the ``window_size + 1`` channels
the concatenated similarity-band + range feature actually has), so
reference flow-head weights are shape-incompatible by construction and are
skipped with a warning. A plain SpatialDROW state_dict (the pre-trained
detector case) is grafted into the ``dr_spaam`` subtree automatically.
"""

from __future__ import annotations

import warnings

import numpy as np

__all__ = [
    "load_reference_checkpoint",
    "import_state_dict",
    "import_torch_checkpoint",
]


def _to_np(value) -> np.ndarray:
    if hasattr(value, "detach"):  # torch tensor, without importing torch
        value = value.detach().cpu().numpy()
    return np.asarray(value, dtype=np.float32)


def load_reference_checkpoint(path: str):
    """Load a reference ``.pth`` file -> ``(state_dict, meta)``.

    Accepts both the checkpoint envelope (``model_state`` key) and a bare
    ``state_dict``. Strips a ``module.`` prefix (``torch.nn.DataParallel``
    wrapping, which the reference unwraps the same way at
    ``src/pipeline/logger.py:163-166``). ``meta`` carries ``epoch``/``step``
    (0 when absent; the old stack's fractional ``it`` is floored).
    """
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    meta = {"epoch": 0, "step": 0}
    if isinstance(payload, dict) and "model_state" in payload:
        meta["epoch"] = int(payload.get("epoch") or 0)
        step = payload.get("step", payload.get("it", 0))
        meta["step"] = int(step or 0)
        payload = payload["model_state"]
    if not isinstance(payload, dict):
        raise ValueError(
            f"{path}: expected a state_dict or a reference checkpoint "
            f"envelope, got {type(payload).__name__}")
    sd = {}
    for key, value in payload.items():
        if key.startswith("module."):
            key = key[len("module."):]
        sd[key] = _to_np(value)
    return sd, meta


# --------------------------------------------------------------------------
# leaf converters (torch state_dict entries -> flax leaves)
# --------------------------------------------------------------------------


def _conv_to_flax(sd, prefix):
    w = sd[f"{prefix}.weight"]  # (out, in, k)
    return {"kernel": w.transpose(2, 1, 0), "bias": sd[f"{prefix}.bias"]}


def _conv_to_dense(sd, prefix):
    """Pointwise (or full-width, applied to the flattened feature) conv as a
    Dense: ``(out, in, k) -> (in*k, out)`` with taps varying slowest —
    matching the flax ``(k, in, out).reshape(-1, out)`` row order."""
    w = sd[f"{prefix}.weight"]
    return {"kernel": w.transpose(2, 1, 0).reshape(-1, w.shape[0]),
            "bias": sd[f"{prefix}.bias"]}


def _linear_to_dense(sd, prefix):
    return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}


def _bn_to_flax(sd, prefix):
    return (
        {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]},
        {"mean": sd[f"{prefix}.running_mean"],
         "var": sd[f"{prefix}.running_var"]},
    )


def _conv_block(sd, prefix):
    """Reference ``nn.Sequential(Conv1d, BatchNorm1d, LeakyReLU)`` (conv at
    ``.0``, BN at ``.1``) -> this repo's ``ConvBlock`` subtrees."""
    bn_p, bn_s = _bn_to_flax(sd, f"{prefix}.1")
    return ({"Conv_0": _conv_to_flax(sd, f"{prefix}.0"),
             "BatchNorm_0": bn_p},
            {"BatchNorm_0": bn_s})


def _dense_block(sd, prefix):
    """Reference ``_fc`` / ``_conv1x1`` sequential -> ``DenseBlock``
    subtrees. The first child may be a Linear (2-D weight), a pointwise
    Conv1d (3-D weight), or — for the bare-Linear ``fc3`` — the module
    itself rather than a Sequential."""
    first = f"{prefix}.0" if f"{prefix}.0.weight" in sd else prefix
    w = sd[f"{first}.weight"]
    dense = (_linear_to_dense(sd, first) if w.ndim == 2
             else _conv_to_dense(sd, first))
    if f"{prefix}.1.running_mean" not in sd:
        return {"Dense_0": dense}, {}
    bn_p, bn_s = _bn_to_flax(sd, f"{prefix}.1")
    return ({"Dense_0": dense, "BatchNorm_0": bn_p}, {"BatchNorm_0": bn_s})


def _set(tree, path, leaf):
    """Replace ``tree[path...]`` with ``leaf``, asserting the existing
    subtree has identical structure and shapes (catches config mismatches —
    e.g. importing a 4-class checkpoint into a pedestrian-only model —
    with a readable error instead of a downstream apply failure)."""
    node = tree
    for key in path[:-1]:
        if key not in node:
            raise KeyError(f"model has no parameter subtree {path}")
        node = node[key]
    if path[-1] not in node:
        raise KeyError(f"model has no parameter subtree {path}")
    old = node[path[-1]]

    def check(old_node, new_node, where):
        if sorted(old_node) != sorted(new_node):
            raise ValueError(
                f"structure mismatch at {where}: model has "
                f"{sorted(old_node)}, checkpoint maps {sorted(new_node)}")
        for name, value in new_node.items():
            if isinstance(value, dict):
                check(old_node[name], value, where + (name,))
            elif tuple(old_node[name].shape) != tuple(value.shape):
                raise ValueError(
                    f"shape mismatch at {where + (name,)}: model "
                    f"{tuple(old_node[name].shape)} vs checkpoint "
                    f"{tuple(value.shape)} — wrong model config for this "
                    f"checkpoint?")

    check(old, leaf, path)
    node[path[-1]] = leaf


def _seq_len(sd, prefix):
    """Number of ``{prefix}.{i}.0.weight`` children (a Sequential of conv
    blocks) — inferred from the keys instead of hardcoding the reference's
    block counts."""
    n = 0
    while f"{prefix}.{n}.0.weight" in sd:
        n += 1
    return n


# --------------------------------------------------------------------------
# per-model mappers
# --------------------------------------------------------------------------


def _import_conv_stack(sd, sd_prefix, params, stats, path):
    n = _seq_len(sd, sd_prefix)
    if n == 0:
        raise KeyError(f"no conv blocks under '{sd_prefix}' in checkpoint")
    for i in range(n):
        p, s = _conv_block(sd, f"{sd_prefix}.{i}")
        _set(params, path + (f"ConvBlock_{i}",), p)
        _set(stats, path + (f"ConvBlock_{i}",), s)


def _import_named_conv_blocks(sd, params, stats, names):
    for name in names:
        p, s = _conv_block(sd, name)
        _set(params, (name,), p)
        _set(stats, (name,), s)


def _import_flow_unet(sd, params, stats):
    """Reference ``Prototype`` (``prototype.py:34-108``) -> ``FlowUNet``."""
    _import_named_conv_blocks(sd, params, stats,
                              ("encoder_0", "encoder_1", "encoder_2",
                               "decoder_1", "decoder_0"))
    if "flow_reg_linear" in params:
        raise ValueError(
            "FlowUNet(linear_head=True) has no reference counterpart; "
            "import into FlowUNet(linear_head=False)")
    p, s = _conv_block(sd, "flow_reg")
    _set(params, ("flow_reg",), p)
    _set(stats, ("flow_reg",), s)


def _import_flow_unet_additive(sd, params, stats):
    """Reference ``PrototypeTest`` (``prototype.py:158-200``) ->
    ``FlowUNetAdditive``."""
    _import_named_conv_blocks(sd, params, stats,
                              ("conv1", "conv2", "conv3", "conv4",
                               "flow_reg"))


def _import_drow(sd, params, stats):
    """Reference ``DROW``/``SpatialDROW`` (``dr_spaam.py:41-277``) ->
    ``Drow``/``SpatialDrow`` param trees (same structure: ``backbone`` +
    ``head``, plus ``gate`` when the checkpoint has one)."""
    _import_conv_stack(sd, "conv_block_1", params, stats,
                       ("backbone", "block1"))
    _import_conv_stack(sd, "conv_block_2", params, stats,
                       ("backbone", "block2"))
    _import_conv_stack(sd, "conv_block_3", params, stats, ("head", "block3"))
    _import_conv_stack(sd, "conv_block_4", params, stats, ("head", "block4"))
    _set(params, ("head", "cls"), _conv_to_dense(sd, "conv_cls"))
    _set(params, ("head", "reg"), _conv_to_dense(sd, "conv_reg"))

    has_gate = "gate.conv.0.weight" in sd
    if ("gate" in params) != has_gate:
        raise ValueError(
            "model/checkpoint mismatch: "
            + ("model has an attention gate but the checkpoint is a plain "
               "DROW" if "gate" in params else
               "checkpoint has an attention gate (SpatialDROW) but the "
               "model is a plain Drow"))
    if has_gate:
        # full-width conv (128, 256, n_pts) == Dense over the flat (L*C)
        # feature; _conv_to_dense's (k, in, out) row order IS (l, c)
        _set(params, ("gate", "embed"), _conv_to_dense(sd, "gate.conv.0"))
        bn_p, bn_s = _bn_to_flax(sd, "gate.conv.1")
        _set(params, ("gate", "embed_bn"), bn_p)
        _set(stats, ("gate", "embed_bn"), bn_s)


def _import_box_reg(sd, params, stats):
    """Reference ``BoundingBoxRegressor`` (``box_regression.py:126-170``)
    -> this repo's ``BoundingBoxRegressor``."""
    for i in range(4):
        p, s = _dense_block(sd, f"backbone.conv{i + 1}")
        _set(params, ("backbone", f"DenseBlock_{i}"), p)
        _set(stats, ("backbone", f"DenseBlock_{i}"), s)
    for name in ("fc1", "fc2"):
        p, s = _dense_block(sd, name)
        _set(params, (name,), p)
        _set(stats, (name,), s)
    p, _ = _dense_block(sd, "fc3")
    _set(params, ("fc3",), p)


def _subtree(tree, key):
    if key not in tree:
        raise KeyError(f"model has no '{key}' subtree")
    return tree[key]


def _import_flow_drow(sd, params, stats):
    """Reference ``FlowDROW_pretrained`` (or a plain pre-trained
    ``SpatialDROW``) -> the ``FlowDrow.dr_spaam`` detector subtree; the
    reference's flow-head weights are skipped (see module docstring)."""
    if any(key.startswith("dr_spaam.") for key in sd):
        det_sd = {key[len("dr_spaam."):]: value for key, value in sd.items()
                  if key.startswith("dr_spaam.")}
        skipped = sorted({key.split(".")[0] for key in sd
                          if not key.startswith("dr_spaam.")})
        if skipped:
            warnings.warn(
                "flow_drow import: reference flow-head weights "
                f"({', '.join(skipped)}) skipped — the reference head is "
                "shape-incompatible by construction (its forward is broken, "
                "dr_spaam.py:308-322); the flow head keeps its fresh "
                "initialization and must be (re)trained", stacklevel=3)
    else:  # a pre-trained SpatialDROW checkpoint (dr_spaam_e40.pth case)
        det_sd = sd
    _import_drow(det_sd, _subtree(params, "dr_spaam"),
                 _subtree(stats, "dr_spaam"))


_IMPORTERS = {
    "flow_unet": _import_flow_unet,
    "prototype": _import_flow_unet,
    "prototype_test": _import_flow_unet_additive,
    "flow_unet_additive": _import_flow_unet_additive,
    "drow": _import_drow,
    "dr-spaam": _import_drow,
    "spatial_drow": _import_drow,
    "flow_drow": _import_flow_drow,
    "box_reg": _import_box_reg,
}


def import_state_dict(variables, state_dict, model_type: str):
    """Fill a freshly-initialized ``variables`` tree (from ``model.init``)
    with weights from a reference torch ``state_dict``.

    Returns a new plain-dict variables tree (input is not mutated). Raises
    ``KeyError``/``ValueError`` with a readable message when the checkpoint
    does not match the model's structure or shapes.
    """
    if model_type not in _IMPORTERS:
        raise ValueError(
            f"unsupported model type {model_type!r}; supported: "
            f"{sorted(_IMPORTERS)}")
    import jax

    variables = jax.tree_util.tree_map(np.asarray, variables)
    variables = {key: dict(value) if isinstance(value, dict) else value
                 for key, value in variables.items()}

    def deep(node):
        return ({key: deep(value) for key, value in node.items()}
                if isinstance(node, dict) else node)

    variables = deep(variables)
    sd = {key: _to_np(value) for key, value in state_dict.items()}
    _IMPORTERS[model_type](sd, variables["params"],
                           variables.setdefault("batch_stats", {}))
    return variables


def import_torch_checkpoint(path: str, model, example_inputs,
                            model_type: str, init_kwargs: dict | None = None):
    """One-call import: init ``model`` for structure, load ``path``, map the
    weights. Returns ``(variables, meta)`` with ``meta = {epoch, step}``."""
    import jax

    sd, meta = load_reference_checkpoint(path)
    variables = model.init(jax.random.PRNGKey(0), *example_inputs,
                           **(init_kwargs or {"train": False}))
    import flax

    variables = flax.core.unfreeze(variables)
    return import_state_dict(variables, sd, model_type), meta
