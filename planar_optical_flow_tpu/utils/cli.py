"""Small helpers shared by the ``bin/`` CLIs."""

from __future__ import annotations


def parse_batches(parser, raw) -> list[int]:
    """Parse a ``--batch`` value (int or comma list) with instant,
    readable errors — run BEFORE any expensive model build / checkpoint
    restore so a CLI typo fails in milliseconds, not minutes (shared by
    ``bin/export_serving.py`` and ``bin/export_model.py``)."""
    try:
        batches = [int(b) for b in str(raw).split(",") if b.strip()]
    except ValueError:
        parser.error(
            f"--batch must be an int or comma list of ints, got {raw!r}")
    if not batches or any(b < 1 for b in batches):
        parser.error(f"--batch sizes must be >= 1, got {raw!r}")
    if len(set(batches)) != len(batches):
        parser.error(f"--batch has duplicate sizes: {raw!r}")
    return batches


def force_cpu_backend():
    """Pin jax to the CPU backend (``--cpu`` flags). Must run before any
    computation; works even though the axon sitecustomize pre-imports
    jax."""
    import jax

    jax.config.update("jax_platforms", "cpu")
