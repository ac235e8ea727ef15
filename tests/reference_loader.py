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

    # the reference's vendored _pypcd imports the python-lzf C module at
    # module import time; it isn't installed here. Provide this repo's
    # LZF codec under the same API — tests that read uncompressed PCD
    # modes never call it, and compressed-mode tests exercise the
    # reference's framing logic (chunk sizes, header fields) around it.
    try:
        import lzf  # noqa: F401
    except ImportError:
        from planar_optical_flow_tpu.data import pcd as _pcd

        lzf_mod = types.ModuleType("lzf")
        lzf_mod.decompress = _pcd.lzf_decompress
        lzf_mod.compress = _pcd.lzf_compress
        sys.modules["lzf"] = lzf_mod

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
# helpers shared by the parity tests (the torch->flax weight mapping
# itself lives in planar_optical_flow_tpu/interop/torch_ckpt.py)
# --------------------------------------------------------------------------


def t2n(t):
    import numpy as np

    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


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
