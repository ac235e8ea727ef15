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
    """LZF decompression (liblzf format). Native if available; a corrupt
    stream raises ValueError from either decoder."""
    try:
        from planar_optical_flow_tpu.data import native
    except Exception:
        native = None
    if native is not None:
        out = native.lzf_decompress(data, expected_size)
        if out is not None:
            return out
    return _lzf_decompress_py(data, expected_size)


def _lzf_decompress_py(data: bytes, expected_size: int) -> bytes:
    bad = ValueError(
        "corrupt LZF stream (out-of-range back-reference, truncated "
        "run, or output overflow)")
    out = bytearray(expected_size)
    i, o, n = 0, 0, len(data)
    while i < n:
        ctrl = data[i]
        i += 1
        if ctrl < 32:  # literal run of ctrl+1 bytes
            run = ctrl + 1
            if i + run > n or o + run > expected_size:
                raise bad
            out[o:o + run] = data[i:i + run]
            i += run
            o += run
        else:  # back reference
            length = ctrl >> 5
            if length == 7:
                if i >= n:
                    raise bad
                length += data[i]
                i += 1
            if i >= n:
                raise bad
            ref = o - ((ctrl & 0x1F) << 8) - data[i] - 1
            i += 1
            if ref < 0 or o + length + 2 > expected_size:
                raise bad
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
    missing = [k for k in ("FIELDS", "SIZE", "TYPE", "POINTS")
               if k not in meta]
    if missing:
        raise ValueError(f"malformed PCD header: missing {missing}")
    return meta


def _dtype_from_meta(meta) -> np.dtype:
    fields = meta["FIELDS"]
    sizes = [int(s) for s in meta["SIZE"]]
    types = meta["TYPE"]
    counts = [int(c) for c in meta.get("COUNT", ["1"] * len(fields))]
    if not (len(fields) == len(sizes) == len(types) == len(counts)):
        raise ValueError(
            f"malformed PCD header: FIELDS/SIZE/TYPE/COUNT lengths differ "
            f"({len(fields)}/{len(sizes)}/{len(types)}/{len(counts)})")
    spec = []
    pad = 0
    for name, size, typ, cnt in zip(fields, sizes, types, counts):
        if name == "_":
            name, pad = f"_pad{pad}", pad + 1
        try:
            base = _TYPE_MAP[(typ, size)]
        except KeyError:
            raise ValueError(
                f"unsupported PCD field type TYPE={typ!r} SIZE={size} "
                f"for field {name!r}") from None
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
            width = sum(
                int(np.prod(dtype[name].shape)) if dtype[name].shape else 1
                for name in dtype.names)
            if rows.shape != (n, width):
                raise ValueError(
                    f"malformed ascii PCD body: expected ({n}, {width}) "
                    f"values for POINTS {n}, got {rows.shape}")
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
            buf = f.read(n * dtype.itemsize)
            if len(buf) < n * dtype.itemsize:
                raise ValueError(
                    f"truncated binary PCD body: expected "
                    f"{n * dtype.itemsize} bytes, got {len(buf)}")
            return np.frombuffer(buf, dtype=dtype, count=n).copy()
        if mode == "binary_compressed":
            sizes = f.read(8)
            if len(sizes) < 8:
                raise ValueError("truncated binary_compressed PCD: missing "
                                 "compressed/uncompressed size header")
            comp_size, uncomp_size = np.frombuffer(sizes, dtype="u4")
            if int(uncomp_size) != n * dtype.itemsize:
                raise ValueError(
                    f"binary_compressed PCD size mismatch: header declares "
                    f"{int(uncomp_size)} uncompressed bytes, POINTS {n} x "
                    f"itemsize {dtype.itemsize} = {n * dtype.itemsize}")
            comp = f.read(int(comp_size))
            if len(comp) < int(comp_size):
                raise ValueError(
                    f"truncated binary_compressed PCD body: expected "
                    f"{int(comp_size)} bytes, got {len(comp)}")
            raw = lzf_decompress(comp, int(uncomp_size))
            if len(raw) != int(uncomp_size):
                raise ValueError(
                    f"corrupt binary_compressed PCD: LZF stream decoded to "
                    f"{len(raw)} bytes, header declares {int(uncomp_size)}")
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
