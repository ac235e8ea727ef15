"""AOT export of the fused serving pipeline (``jax.export``).

Deployment artifact: the compiled serving step — cutout encode, Pallas
conv/gate/head kernels (Mosaic custom calls), NMS — serialized as
StableHLO so a serving host can load and run it WITHOUT the model code,
checkpoint, calibration, or a retrace/recompile. The reference has no
serving artifact at all (its demo re-runs the torch module per frame,
``depracted_scripts/infer_person_flow.py:101-187``); this is the TPU
production-serving counterpart.

Two programs are exported, matching the :func:`make_serve_step_v3`
dispatch contract:

* ``boot.bin`` — ``scan (B, P) f32 -> (carry, outputs)`` (first scan of a
  stream; builds the template carry)
* ``step.bin`` — ``(carry, scan) -> (carry, outputs)``

plus ``engine.json`` metadata (batch list, num_pts, platform list, jax
version, the builder-provided extras). Every export is stamped with its
lowering platform and runs only on that platform family
(:func:`load_serving_engine` checks up front): TPU exports embed Mosaic
custom calls and run on compatible TPU generations; CPU
(interpret-mode) exports are plain StableHLO for CPU hosts — the test
suite exercises those. Shapes are static, but one artifact may hold
SEVERAL batch sizes: exporting a list of scan specs writes one program
pair per batch (``boot_b{B}.bin``/``step_b{B}.bin``) and the loaded
engine routes on the incoming scan's batch; a single spec keeps the
legacy ``boot.bin``/``step.bin`` layout.

Verified bit-identical to the jitted live pipeline on both TPU (int8c,
``experiments/probe_export.py``) and CPU interpret
(``tests/test_serving_export.py``).
"""

from __future__ import annotations

import json
import os
import re

import jax
import numpy as np

_META = "engine.json"
_BOOT = "boot.bin"
_STEP = "step.bin"
_MODEL_META = "model.json"

# On-disk artifact layout version. Bump when the meta keys / program-file
# naming / call contract change incompatibly; loaders refuse artifacts
# stamped with a NEWER (or unparseable) schema with a readable error
# instead of a downstream shape/deserialize failure. Artifacts written
# before versioning carry no stamp and are read as version 1 (their
# layout is version 1's).
SCHEMA_VERSION = 1


def _check_schema(path: str, meta: dict):
    ver = meta.get("schema_version", 1)
    if not isinstance(ver, int) or isinstance(ver, bool) or ver < 1:
        raise ValueError(
            f"artifact {path} has an unreadable schema_version {ver!r} "
            "(expected a positive integer) — the meta file is corrupt "
            "or hand-edited; re-export the artifact")
    if ver > SCHEMA_VERSION:
        raise ValueError(
            f"artifact {path} uses schema version {ver} but this "
            f"runtime understands up to {SCHEMA_VERSION} — upgrade "
            "planar_optical_flow_tpu on the serving host, or re-export "
            "the artifact with this version")


def _read_meta(out_dir: str, meta_name: str):
    try:
        with open(os.path.join(out_dir, meta_name)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _next_generation(out_dir: str, meta_name: str) -> int:
    """Generation counter for re-exports into an existing artifact.

    Program files carry a per-export generation suffix (``.g{N}`` for
    N > 0), so a re-export NEVER writes under a name the current meta
    references — a crash at any point leaves the old meta pointing only
    at old-generation bins (same-name in-place replacement could pair a
    stale meta with a new-generation program: wrong weights served
    silently, or an opaque deserialize mismatch on changed shapes).
    An existing-but-unreadable meta still advances the generation — past
    the highest ``.g{N}`` suffix actually present among the bin files, so
    the re-export can never collide with (and atomically overwrite) bins
    a restored/backup copy of the lost meta might reference.
    """
    meta = _read_meta(out_dir, meta_name)
    if meta is not None:
        return int(meta.get("generation", 0)) + 1
    if not os.path.exists(os.path.join(out_dir, meta_name)):
        return 0
    # meta exists but is unreadable: the true generation is unknown, so
    # scan the on-disk bins for the highest generation suffix
    max_gen = 0
    for name in os.listdir(out_dir):
        m = re.search(r"\.g(\d+)\.bin(\.tmp)?$", name)
        if m:
            max_gen = max(max_gen, int(m.group(1)))
    return max_gen + 1


def _write_atomic(path: str, blob: bytes):
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def _write_meta_atomic(path: str, info: dict):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(info, f, indent=2, sort_keys=True)
    os.replace(tmp, path)


def _prune_programs(out_dir: str, prefixes, keep):
    """Drop program files (and write residue) from previous exports that
    the just-written meta no longer references — stale programs may come
    from different weights and must not ship next to the new meta."""
    for name in os.listdir(out_dir):
        if name in keep:
            continue
        if (any(name.startswith(p) for p in prefixes)
                and (name.endswith(".bin") or name.endswith(".bin.tmp"))):
            os.remove(os.path.join(out_dir, name))


def export_serving_engine(out_dir: str, step, example_scan,
                          meta: dict | None = None) -> str:
    """Serialize a built serving step (a :func:`make_serve_step_v3`
    dispatch) for the given scan batch shape(s). Returns ``out_dir``.

    ``example_scan``: ``(B, num_pts)`` array or ``jax.ShapeDtypeStruct``
    — only shape/dtype are used; no compile or device execution happens
    at export time (tracing + lowering only). A LIST of specs exports one
    boot/step program pair per batch size into the same artifact
    (``boot_b{B}.bin``/``step_b{B}.bin``); the loaded engine routes on
    the incoming scan's batch. Shapes are otherwise static — the step is
    shape-polymorphic only at trace time, so each batch is its own
    serialized program.
    """
    from jax import export as jexport

    raw = step.raw_step
    specs = (list(example_scan) if isinstance(example_scan, (list, tuple))
             else [example_scan])
    scan_specs = [
        jax.ShapeDtypeStruct(np.shape(s), getattr(s, "dtype", np.float32))
        for s in specs
    ]
    batches = [int(s.shape[0]) for s in scan_specs]
    if len(set(batches)) != len(batches):
        raise ValueError(f"duplicate batch sizes in export: {batches}")
    if len({s.shape[1] for s in scan_specs}) != 1:
        raise ValueError("all exported batches must share num_pts")

    single = len(scan_specs) == 1
    # serialize every program BEFORE touching the output directory, so a
    # failed or interrupted re-export cannot brick a previously valid
    # artifact
    platforms = None
    blobs = {}
    for scan_spec, b in zip(scan_specs, batches):
        boot = jexport.export(jax.jit(lambda s: raw(None, s)))(scan_spec)
        boot_out = jax.tree_util.tree_unflatten(boot.out_tree,
                                                boot.out_avals)
        carry_spec = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), boot_out[0])
        # carry donation must be baked into the exported program: without
        # it every loaded-engine step copies the int8 template carry,
        # costing ~0.8 ms at B=128 (13.08 vs 12.24 ms/step measured on
        # v5e — with donation the artifact matches the live pipeline)
        stepped = jexport.export(jax.jit(raw, donate_argnums=(0,)))(
            carry_spec, scan_spec)
        platforms = list(boot.platforms)
        blobs[b] = (boot.serialize(), stepped.serialize())

    # crash-safe write order: generation-unique bin names (see
    # _next_generation) land via tmp + os.replace, the meta referencing
    # them is atomically replaced LAST, and only then are programs the
    # new meta no longer lists pruned — at every crash point the on-disk
    # meta references exactly the bins of its own generation
    os.makedirs(out_dir, exist_ok=True)
    gen = _next_generation(out_dir, _META)
    suffix = f".g{gen}" if gen else ""

    def names(b):
        if single and not gen:
            return _BOOT, _STEP
        if single:
            return f"boot{suffix}.bin", f"step{suffix}.bin"
        return f"boot_b{b}{suffix}.bin", f"step_b{b}{suffix}.bin"

    files = {}
    for b, (boot_blob, step_blob) in blobs.items():
        boot_name, step_name = names(b)
        _write_atomic(os.path.join(out_dir, boot_name), boot_blob)
        _write_atomic(os.path.join(out_dir, step_name), step_blob)
        files[str(b)] = [boot_name, step_name]

    # builder extras first, computed facts last: the batch/num_pts/
    # platform fields are what load-time safety checks key on, so they
    # must reflect the export, not a caller's labeling
    info = dict(meta or {})
    info.update({
        "batch": batches[0] if single else None,  # legacy single-batch key
        "batches": sorted(batches),
        "files": files,
        "generation": gen,
        "num_pts": int(scan_specs[0].shape[1]),
        "platforms": platforms,
        "jax_version": jax.__version__,
        "schema_version": SCHEMA_VERSION,
    })
    _write_meta_atomic(os.path.join(out_dir, _META), info)
    _prune_programs(out_dir, ("boot", "step"),
                    {n for pair in files.values() for n in pair})
    return out_dir


def export_model(out_dir: str, fn, example_inputs, meta: dict | None = None,
                 ) -> str:
    """AOT-export a STATELESS jittable ``fn(*inputs) -> outputs`` — the
    batch-inference counterpart of :func:`export_serving_engine` for the
    non-streaming workloads (flow U-Net scan pairs, box-regression
    segments, fc/polar-grid detectors). Weights must be closed over in
    ``fn``; the artifact runs without model code or checkpoint.

    ``example_inputs``: a tuple of arrays / ``jax.ShapeDtypeStruct``s
    (one program), or a LIST of such tuples (one serialized program per
    signature, ``model_b{B}.bin``, routed on the leading batch dim of the
    first input at load time). Writes ``model.json`` metadata. Returns
    ``out_dir``.
    """
    from jax import export as jexport

    sigs = (list(example_inputs) if isinstance(example_inputs, list)
            else [tuple(example_inputs)])
    spec_sigs = [
        tuple(jax.ShapeDtypeStruct(np.shape(x),
                                   getattr(x, "dtype", np.float32))
              for x in sig)
        for sig in sigs
    ]
    batches = [int(sig[0].shape[0]) for sig in spec_sigs]
    if len(set(batches)) != len(batches):
        raise ValueError(f"duplicate batch sizes in export: {batches}")

    # serialize every program BEFORE touching the output directory, so a
    # failed or interrupted re-export cannot brick a previously valid
    # artifact (stale bins removed + meta written only after all exports
    # succeeded)
    platforms = None
    input_shapes = {}
    output_shapes = {}
    blobs = {}
    for sig, b in zip(spec_sigs, batches):
        exported = jexport.export(jax.jit(fn))(*sig)
        platforms = list(exported.platforms)
        blobs[b] = exported.serialize()
        input_shapes[str(b)] = [
            {"shape": list(s.shape), "dtype": str(np.dtype(s.dtype))}
            for s in sig
        ]
        output_shapes[str(b)] = [
            {"shape": list(a.shape), "dtype": str(np.dtype(a.dtype))}
            for a in exported.out_avals
        ]

    # crash-safe write order: generation-unique bin names (see
    # _next_generation — a same-batch re-export with changed weights or
    # shapes must never overwrite a bin the current meta references),
    # atomic meta replace LAST, then prune unreferenced programs
    os.makedirs(out_dir, exist_ok=True)
    gen = _next_generation(out_dir, _MODEL_META)
    suffix = f".g{gen}" if gen else ""
    files = {}
    for b, blob in blobs.items():
        name = f"model_b{b}{suffix}.bin"
        _write_atomic(os.path.join(out_dir, name), blob)
        files[str(b)] = name

    info = dict(meta or {})
    info.update({
        "batches": sorted(batches),
        "files": files,
        "generation": gen,
        "input_shapes": input_shapes,
        "output_shapes": output_shapes,
        "platforms": platforms,
        "jax_version": jax.__version__,
        "schema_version": SCHEMA_VERSION,
    })
    _write_meta_atomic(os.path.join(out_dir, _MODEL_META), info)
    _prune_programs(out_dir, ("model_b",), set(files.values()))
    return out_dir


class ModelEngine:
    """A loaded stateless-model artifact: call it like the original
    function — ``engine(*inputs)`` — routing on the first input's batch
    when the artifact holds several signatures. ``engine.meta`` holds the
    metadata."""

    def __init__(self, programs: dict, meta: dict):
        self._programs = {b: jax.jit(p.call) for b, p in programs.items()}
        self.meta = meta

    def __call__(self, *inputs):
        b = int(np.shape(inputs[0])[0])
        if b not in self._programs:
            raise ValueError(
                f"no exported program for batch {b}; this artifact holds "
                f"batches {sorted(self._programs)} (re-export with the "
                f"batch you need, see bin/export_model.py --batch)")
        sig = self.meta.get("input_shapes", {}).get(str(b))
        if sig is not None:
            if len(inputs) != len(sig):
                raise ValueError(
                    f"this artifact's program takes {len(sig)} input(s), "
                    f"got {len(inputs)}")
            for i, (x, s) in enumerate(zip(inputs, sig)):
                if list(np.shape(x)) != list(s["shape"]):
                    raise ValueError(
                        f"input {i} has shape {list(np.shape(x))} but the "
                        f"artifact was exported for {s['shape']} "
                        f"(re-export with the shapes you need, see "
                        f"bin/export_model.py)")
                # getattr's default is ALWAYS evaluated — np.asarray on a
                # committed device array would be a blocking D2H copy per
                # call; only materialize for dtype-less python inputs
                dt = getattr(x, "dtype", None)
                got = str(np.dtype(dt if dt is not None
                                   else np.asarray(x).dtype))
                if got != s["dtype"]:
                    raise ValueError(
                        f"input {i} has dtype {got} but the artifact was "
                        f"exported for {s['dtype']}")
        return self._programs[b](*inputs)


def _check_platform(path: str, meta: dict):
    backend = jax.default_backend()
    platforms = [p.lower() for p in meta.get("platforms", [])]
    if platforms and backend.lower() not in platforms:
        raise ValueError(
            f"artifact {path} was exported for platform(s) {platforms} "
            f"but this host's jax backend is {backend!r}; re-export on "
            f"the target platform")


def load_model(path: str) -> ModelEngine:
    """Load a directory written by :func:`export_model`."""
    from jax import export as jexport

    with open(os.path.join(path, _MODEL_META)) as f:
        meta = json.load(f)
    _check_schema(path, meta)
    _check_platform(path, meta)
    files = meta.get("files") or {}
    programs = {}
    for b in meta["batches"]:
        name = files.get(str(b), f"model_b{b}.bin")
        with open(os.path.join(path, name), "rb") as f:
            programs[int(b)] = jexport.deserialize(f.read())
    return ModelEngine(programs, meta)


class ServingEngine:
    """A loaded serving artifact. Same call contract as the live dispatch:
    ``engine(carry, scan) -> (carry', outputs)`` with ``carry=None``
    bootstrapping a stream. Routes on the scan's batch when the artifact
    holds several batch sizes. ``engine.meta`` holds the metadata."""

    def __init__(self, programs: dict, meta: dict):
        # programs: {batch: (boot, step)}; jit the exported calls so
        # repeat dispatches hit the cache
        self._programs = {
            b: (jax.jit(boot.call), jax.jit(step.call, donate_argnums=(0,)))
            for b, (boot, step) in programs.items()
        }
        self.meta = meta

    def _resolve(self, scan):
        b = scan.shape[0]
        if b not in self._programs:
            raise ValueError(
                f"no exported program for batch {b}; this artifact holds "
                f"batches {sorted(self._programs)} (re-export with the "
                f"batch you need, see bin/export_serving.py --batch)")
        return self._programs[b]

    def __call__(self, carry, scan):
        boot, step = self._resolve(scan)
        if carry is None:
            return boot(scan)
        return step(carry, scan)


def load_serving_engine(path: str) -> ServingEngine:
    """Load an engine directory written by :func:`export_serving_engine`.

    Raises a readable error when the artifact was exported for a
    different platform than this host's backend (jax would otherwise
    reject it on the first call with a less obvious message).
    """
    from jax import export as jexport

    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    _check_schema(path, meta)
    _check_platform(path, meta)

    def _read(name):
        with open(os.path.join(path, name), "rb") as f:
            return jexport.deserialize(f.read())

    batches = meta.get("batches") or [meta["batch"]]
    files = meta.get("files") or {}

    def _names(b):
        if str(b) in files:
            return files[str(b)]
        if len(batches) == 1 and os.path.exists(os.path.join(path, _BOOT)):
            return _BOOT, _STEP
        return f"boot_b{b}.bin", f"step_b{b}.bin"

    programs = {}
    for b in batches:
        boot_name, step_name = _names(b)
        programs[int(b)] = (_read(boot_name), _read(step_name))
    return ServingEngine(programs, meta)
