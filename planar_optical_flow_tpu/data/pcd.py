"""PCD (Point Cloud Data) file reader/writer.

Replaces the reference's vendored ``_pypcd.py`` (``src/data_handle/_pypcd.py``)
with a compact implementation supporting the three JRDB-relevant encodings:
``ascii``, ``binary``, and ``binary_compressed`` (LZF). The LZF codec uses
the native C++ extension when built (:mod:`planar_optical_flow_tpu.data.native`)
and falls back to a pure-python decoder.
"""

from __future__ import annotations

import numpy as np

_TYPE_MAP = {
    ("F", 4): "f4", ("F", 8): "f8",
    ("I", 1): "i1", ("I", 2): "i2", ("I", 4): "i4", ("I", 8): "i8",
    ("U", 1): "u1", ("U", 2): "u2", ("U", 4): "u4", ("U", 8): "u8",
}


def lzf_decompress(data: bytes, expected_size: int) -> bytes:
    """LZF decompression (liblzf format). Native if available."""
    try:
        from planar_optical_flow_tpu.data import native

        out = native.lzf_decompress(data, expected_size)
        if out is not None:
            return out
    except Exception:
        pass
    return _lzf_decompress_py(data, expected_size)


def _lzf_decompress_py(data: bytes, expected_size: int) -> bytes:
    out = bytearray(expected_size)
    i, o, n = 0, 0, len(data)
    while i < n:
        ctrl = data[i]
        i += 1
        if ctrl < 32:  # literal run of ctrl+1 bytes
            run = ctrl + 1
            out[o:o + run] = data[i:i + run]
            i += run
            o += run
        else:  # back reference
            length = ctrl >> 5
            if length == 7:
                length += data[i]
                i += 1
            ref = o - ((ctrl & 0x1F) << 8) - data[i] - 1
            i += 1
            for _ in range(length + 2):
                out[o] = out[ref]
                o += 1
                ref += 1
    return bytes(out[:o])


def lzf_compress(data: bytes) -> bytes | None:
    """Minimal LZF 'compression': emit literal runs only (valid LZF stream,
    no size win — used by the writer for format-roundtrip fidelity)."""
    out = bytearray()
    for i in range(0, len(data), 32):
        chunk = data[i:i + 32]
        out.append(len(chunk) - 1)
        out.extend(chunk)
    return bytes(out)


def _parse_header(f):
    meta = {}
    while True:
        raw = f.readline()
        if not raw:  # EOF before DATA line: truncated/malformed header
            raise ValueError("unexpected EOF in PCD header (no DATA line)")
        line = raw.decode("ascii", errors="ignore").strip()
        if not line or line.startswith("#"):
            continue
        key, _, rest = line.partition(" ")
        key = key.upper()
        meta[key] = rest.split()
        if key == "DATA":
            break
    return meta


def _dtype_from_meta(meta) -> np.dtype:
    fields = meta["FIELDS"]
    sizes = [int(s) for s in meta["SIZE"]]
    types = meta["TYPE"]
    counts = [int(c) for c in meta.get("COUNT", ["1"] * len(fields))]
    spec = []
    pad = 0
    for name, size, typ, cnt in zip(fields, sizes, types, counts):
        if name == "_":
            name, pad = f"_pad{pad}", pad + 1
        base = _TYPE_MAP[(typ, size)]
        spec.append((name, base, (cnt,)) if cnt > 1 else (name, base))
    return np.dtype(spec)


def read_pcd(path: str) -> np.ndarray:
    """Read a PCD file -> structured array with the declared fields."""
    with open(path, "rb") as f:
        meta = _parse_header(f)
        dtype = _dtype_from_meta(meta)
        n = int(meta["POINTS"][0])
        mode = meta["DATA"][0].lower()

        if mode == "ascii":
            body = f.read().decode("ascii")
            rows = np.loadtxt(body.splitlines(), dtype=np.float64, ndmin=2)
            out = np.zeros(n, dtype=dtype)
            col = 0
            for name in dtype.names:
                shape = dtype[name].shape
                w = int(np.prod(shape)) if shape else 1
                vals = rows[:, col:col + w]
                out[name] = vals.reshape((n,) + shape) if shape else vals[:, 0]
                col += w
            return out
        if mode == "binary":
            return np.frombuffer(f.read(n * dtype.itemsize), dtype=dtype,
                                 count=n).copy()
        if mode == "binary_compressed":
            comp_size, uncomp_size = np.frombuffer(f.read(8), dtype="u4")
            raw = lzf_decompress(f.read(int(comp_size)), int(uncomp_size))
            # binary_compressed stores data column-major (field by field)
            out = np.zeros(n, dtype=dtype)
            off = 0
            for name in dtype.names:
                sub = dtype[name]
                nbytes = sub.itemsize * n
                out[name] = np.frombuffer(
                    raw[off:off + nbytes], dtype=sub.base,
                ).reshape((n,) + sub.shape)
                off += nbytes
            return out
        raise ValueError(f"unsupported PCD DATA mode {mode!r}")


def read_pcd_xyz(path: str) -> np.ndarray:
    """Read a PCD and return ``(N, 3)`` float32 xyz."""
    pc = read_pcd(path)
    return np.stack(
        [pc["x"], pc["y"], pc["z"]], axis=1
    ).astype(np.float32)


def write_pcd(path: str, xyz: np.ndarray, mode: str = "binary"):
    """Write an xyz point cloud as PCD (ascii | binary | binary_compressed)."""
    xyz = np.ascontiguousarray(xyz, dtype=np.float32)
    n = len(xyz)
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\n"
        f"DATA {mode}\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        if mode == "ascii":
            np.savetxt(f, xyz, fmt="%.6f")
        elif mode == "binary":
            rec = np.zeros(n, dtype=[("x", "f4"), ("y", "f4"), ("z", "f4")])
            rec["x"], rec["y"], rec["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
            f.write(rec.tobytes())
        elif mode == "binary_compressed":
            # column-major field blocks
            raw = b"".join(
                np.ascontiguousarray(xyz[:, i]).tobytes() for i in range(3)
            )
            comp = lzf_compress(raw)
            f.write(np.asarray([len(comp), len(raw)], dtype="u4").tobytes())
            f.write(comp)
        else:
            raise ValueError(mode)
