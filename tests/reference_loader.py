"""Loader for DIRECT numerical parity tests against the reference repo.

When the upstream reference checkout is present (``/root/reference``, or
``$PLANAR_FLOW_REFERENCE``), these helpers import its numpy/torch code so
tests can use it as an *executable oracle* — the strongest parity evidence
available: instead of comparing against re-implemented scalar oracles
(``tests/oracles.py``), we map this repo's parameters into the reference's
own torch modules and assert the outputs agree.

The reference is research code with some bit-rot (SURVEY.md §2.10); loading
it needs three shims, none of which change any numerics:

* ``np.float`` — removed by numpy >= 1.24; the reference uses it once.
* ``numba`` — the reference imports ``numba.cuda`` to JIT its rotated-IoU
  CUDA kernels at module import. We never call them (no CUDA here); a
  pass-through ``jit`` decorator stub lets the module import.
* ``torch.Tensor.cuda`` — a few reference model paths call ``.cuda()``
  unconditionally (e.g. ``prototype.py:124``); patched to a no-op so the
  models run on CPU.

Everything here is read-only with respect to the reference checkout.
"""

from __future__ import annotations

import importlib
import os
import sys
import types

REF_PATH = os.environ.get("PLANAR_FLOW_REFERENCE", "/root/reference")

_cache: dict = {}


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REF_PATH, "src"))


def _install_stubs():
    import numpy as np

    # numpy >= 1.24 removed the deprecated builtin aliases the reference uses
    for name, alias in (("float", float), ("int", int), ("bool", bool),
                        ("object", object)):
        try:
            getattr(np, name)
        except AttributeError:
            setattr(np, name, alias)  # noqa: NPY001 (reference compat shim)

    if "numba" not in sys.modules:
        def _jit(*args, **kwargs):
            if len(args) == 1 and callable(args[0]) and not kwargs:
                return args[0]

            def deco(fn):
                return fn

            return deco

        cuda_mod = types.ModuleType("numba.cuda")
        cuda_mod.jit = _jit
        numba_mod = types.ModuleType("numba")
        numba_mod.cuda = cuda_mod
        numba_mod.jit = _jit
        numba_mod.njit = _jit
        sys.modules["numba"] = numba_mod
        sys.modules["numba.cuda"] = cuda_mod

    import torch

    if getattr(torch.Tensor.cuda, "__name__", "") != "_cpu_noop_cuda":
        def _cpu_noop_cuda(self, *args, **kwargs):
            return self

        torch.Tensor.cuda = _cpu_noop_cuda


def load_reference(module: str):
    """Import ``module`` (e.g. ``"src.utils.utils"``) from the reference
    checkout, installing the compat stubs first. Results are cached."""
    if module in _cache:
        return _cache[module]
    if not reference_available():
        raise RuntimeError(f"reference checkout not found at {REF_PATH}")
    _install_stubs()
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    mod = importlib.import_module(module)
    _cache[module] = mod
    return mod


# --------------------------------------------------------------------------
# torch -> flax parameter mapping helpers
# --------------------------------------------------------------------------


def t2n(t):
    import numpy as np

    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def conv1d_to_flax(conv):
    """torch ``nn.Conv1d`` weight ``(out, in, k)`` -> flax ``nn.Conv``
    kernel ``(k, in, out)``."""
    return {"kernel": t2n(conv.weight).transpose(2, 1, 0),
            "bias": t2n(conv.bias)}


def conv1d_to_dense(conv):
    """torch pointwise ``nn.Conv1d(k=1)`` (or a full-width conv applied to
    a flattened feature) -> flax ``nn.Dense`` kernel ``(in, out)``."""
    w = t2n(conv.weight)  # (out, in, k)
    out_c, in_c, k = w.shape
    return {"kernel": w.reshape(out_c, in_c * k).T, "bias": t2n(conv.bias)}


def linear_to_dense(lin):
    return {"kernel": t2n(lin.weight).T, "bias": t2n(lin.bias)}


def bn_to_flax(bn):
    """torch ``nn.BatchNorm1d`` -> (params, batch_stats) leaf dicts."""
    return (
        {"scale": t2n(bn.weight), "bias": t2n(bn.bias)},
        {"mean": t2n(bn.running_mean), "var": t2n(bn.running_var)},
    )


def conv_block_from_seq(seq):
    """Reference ``nn.Sequential(Conv1d, BatchNorm1d, LeakyReLU)`` ->
    this repo's ``ConvBlock`` {params, batch_stats} subtrees."""
    bn_p, bn_s = bn_to_flax(seq[1])
    return (
        {"Conv_0": conv1d_to_flax(seq[0]), "BatchNorm_0": bn_p},
        {"BatchNorm_0": bn_s},
    )


def dense_block_from_fc(seq, has_bn=True):
    """Reference ``_fc`` / ``_conv1x1`` sequential -> ``DenseBlock``
    subtrees. ``seq[0]`` may be Linear or pointwise Conv1d."""
    import torch.nn as tnn

    first = seq[0] if isinstance(seq, tnn.Sequential) else seq
    dense = (linear_to_dense(first) if isinstance(first, tnn.Linear)
             else conv1d_to_dense(first))
    if not has_bn:
        return {"Dense_0": dense}, {}
    bn_p, bn_s = bn_to_flax(seq[1])
    return (
        {"Dense_0": dense, "BatchNorm_0": bn_p},
        {"BatchNorm_0": bn_s},
    )


def randomize_bn_stats(model, seed=0):
    """Give every BatchNorm nontrivial running statistics so eval-mode
    parity actually exercises the stats (fresh modules have mean 0/var 1)."""
    import torch

    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            with torch.no_grad():
                m.running_mean.copy_(
                    0.3 * torch.randn(m.running_mean.shape, generator=g))
                m.running_var.copy_(
                    0.5 + torch.rand(m.running_var.shape, generator=g))
    return model


def merge_tree(base, path, leaf):
    """Set ``base[path[0]][path[1]]...`` = ``leaf`` (a possibly nested dict
    of arrays), asserting every array being replaced exists with an
    identical shape (catches mapping bugs)."""
    node = base
    for key in path[:-1]:
        node = node[key]
    old = node[path[-1]]

    def check(old_node, new_node, where):
        assert sorted(old_node) == sorted(new_node), (
            where, sorted(old_node), sorted(new_node))
        for name, value in new_node.items():
            if isinstance(value, dict):
                check(old_node[name], value, where + (name,))
            else:
                assert old_node[name].shape == value.shape, (
                    where, name, old_node[name].shape, value.shape)

    check(old, leaf, path)
    node[path[-1]] = leaf
    return base
