import numpy as np
import pytest

from planar_optical_flow_tpu.data.pcd import (
    read_pcd, read_pcd_xyz, write_pcd, lzf_compress, lzf_decompress,
)
from planar_optical_flow_tpu.data.jrdb import (
    JrdbHandle,
    JrdbBoxRegressionDataset,
    write_synthetic_jrdb,
    JRDB_TRAIN_SEQUENCES,
)
from planar_optical_flow_tpu.data import jrdb_transforms as jt


def test_lzf_roundtrip(rng):
    data = rng.integers(0, 256, size=1000, dtype=np.uint8).tobytes()
    comp = lzf_compress(data)
    assert lzf_decompress(comp, len(data)) == data


def test_lzf_backreference_decode():
    """Hand-built LZF stream with a back-reference: literal 'abc' then a
    3-byte reference to offset -3 -> 'abcabc'."""
    stream = bytes([2, ord("a"), ord("b"), ord("c"), (1 << 5) | 0, 2])
    assert lzf_decompress(stream, 6) == b"abcabc"


@pytest.mark.parametrize("decoder", ["dispatch", "python"])
@pytest.mark.parametrize(
    "stream, expected",
    [
        # back-reference before the start of the output
        (bytes([2, 97, 98, 99, (1 << 5) | 0, 200]), 6),
        # literal run truncated mid-stream
        (bytes([31, 97, 98]), 32),
        # output overflow: run longer than the declared size
        (bytes([7, 97, 98, 99, 100, 101, 102, 103, 104]), 4),
        # back-reference control byte with no offset byte
        (bytes([2, 97, 98, 99, (1 << 5) | 0]), 6),
    ],
    ids=["bad-backref", "truncated-run", "overflow", "truncated-backref"],
)
def test_lzf_corrupt_stream_raises(decoder, stream, expected):
    """Corrupt LZF streams raise a readable error from BOTH decoders
    (native via the dispatch, and the pure-python fallback) instead of
    wrapping indices / silently resizing the output buffer."""
    from planar_optical_flow_tpu.data.pcd import _lzf_decompress_py

    fn = (lzf_decompress if decoder == "dispatch"
          else lambda s, n: _lzf_decompress_py(s, n))
    with pytest.raises(ValueError, match="corrupt LZF"):
        fn(stream, expected)


def test_pcd_malformed_inputs(tmp_path, rng):
    """Malformed PCD files fail with readable errors naming the defect."""
    from planar_optical_flow_tpu.data import pcd

    xyz = rng.uniform(-5, 5, (20, 3)).astype(np.float32)

    def variant(name, mutate):
        path = str(tmp_path / name)
        write_pcd(path, xyz, mode="binary")
        with open(path, "rb") as f:
            blob = f.read()
        with open(path, "wb") as f:
            f.write(mutate(blob))
        return path

    # truncated binary body
    p = variant("trunc.pcd", lambda b: b[:-8])
    with pytest.raises(ValueError, match="truncated binary"):
        pcd.read_pcd(p)

    # header missing required keys
    p2 = str(tmp_path / "nokeys.pcd")
    with open(p2, "wb") as f:
        f.write(b"VERSION 0.7\nPOINTS 4\nDATA ascii\n1 2 3\n")
    with pytest.raises(ValueError, match="missing.*FIELDS"):
        pcd.read_pcd(p2)

    # unsupported field type
    p3 = variant("badtype.pcd",
                 lambda b: b.replace(b"TYPE F F F", b"TYPE Q F F"))
    with pytest.raises(ValueError, match="unsupported PCD field type"):
        pcd.read_pcd(p3)

    # ascii body with the wrong number of values
    p4 = str(tmp_path / "short.pcd")
    write_pcd(p4, xyz, mode="ascii")
    with open(p4, "a") as f:
        f.write("1.0 2.0 3.0\n")  # one extra row vs POINTS
    with pytest.raises(ValueError, match="malformed ascii"):
        pcd.read_pcd(p4)

    # compressed: declared uncompressed size disagrees with POINTS
    p5 = str(tmp_path / "badsize.pcd")
    write_pcd(p5, xyz, mode="binary_compressed")
    with open(p5, "rb") as f:
        blob = f.read()
    header_end = blob.index(b"DATA binary_compressed\n") + len(
        b"DATA binary_compressed\n")
    sizes = np.frombuffer(blob[header_end:header_end + 8], "u4").copy()
    sizes[1] += 4
    with open(p5, "wb") as f:
        f.write(blob[:header_end] + sizes.tobytes()
                + blob[header_end + 8:])
    with pytest.raises(ValueError, match="size mismatch"):
        pcd.read_pcd(p5)


@pytest.mark.parametrize("mode", ["ascii", "binary", "binary_compressed"])
def test_pcd_roundtrip(tmp_path, rng, mode):
    xyz = rng.normal(size=(257, 3)).astype(np.float32)
    path = str(tmp_path / f"t_{mode}.pcd")
    write_pcd(path, xyz, mode=mode)
    back = read_pcd_xyz(path)
    atol = 1e-5 if mode != "ascii" else 1e-4
    np.testing.assert_allclose(back, xyz, atol=atol)
    rec = read_pcd(path)
    assert set(rec.dtype.names) == {"x", "y", "z"}


def test_jrdb_transforms_roundtrip(rng):
    pts = rng.normal(size=(3, 100)).astype(np.float32)
    up = jt.transform_pts_upper_velodyne_to_base(pts)
    np.testing.assert_allclose(
        jt.transform_pts_base_to_upper_velodyne(up), pts, atol=1e-5
    )
    lz = jt.transform_pts_laser_to_base(pts)
    np.testing.assert_allclose(
        jt.transform_pts_base_to_laser(lz), pts, atol=1e-5
    )
    # upper velodyne is raised by 0.33529
    z0 = jt.transform_pts_upper_velodyne_to_base(np.zeros((3, 1)))
    np.testing.assert_allclose(z0[2, 0], 0.33529, atol=1e-6)


def test_box3d_vertices():
    box = jt.Box3d([1.0, 2.0, 0.5], [2.0, 1.0, 3.0], 0.0)
    v = box.to_vertices()
    assert v.shape == (3, 8)
    np.testing.assert_allclose(v.mean(axis=1), [1.0, 2.0, 0.5], atol=1e-6)
    np.testing.assert_allclose(v[2].max() - v[2].min(), 3.0, atol=1e-6)


@pytest.fixture(scope="module")
def jrdb_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("jrdb"))
    write_synthetic_jrdb(d, num_frames=3, boxes_per_frame=4)
    return d


def test_jrdb_handle(jrdb_dir):
    h = JrdbHandle("train", {"data_dir": jrdb_dir, "radius_segment": 0.7,
                             "perturb": 0.1, "is_3d": True})
    assert len(h) == 2 * 3  # 2 train sequences x 3 frames
    fr = h[0]
    assert fr["points"].shape[1] == 3
    assert len(fr["segments"]) == len(fr["boxes"]) == len(fr["dets_center"])
    assert fr["boxes"].shape[1] == 7
    # segments lie within the crop radius of their pseudo-center
    for seg, c in zip(fr["segments"], fr["dets_center"]):
        if len(seg):
            d = np.linalg.norm(seg[:, :2] - c[:2], axis=1)
            assert d.max() <= 0.7 + 1e-5


def test_jrdb_handle_2d(jrdb_dir):
    h = JrdbHandle("train", {"data_dir": jrdb_dir, "radius_segment": 0.7,
                             "perturb": 0.0, "is_3d": False})
    fr = h[0]
    assert fr["boxes"].shape[1] == 5
    assert fr["points"].shape[1] == 3


def test_jrdb_box_dataset(jrdb_dir):
    cfg = {
        "data_dir": jrdb_dir, "radius_segment": 0.7, "perturb": 0.1,
        "is_3d": True, "min_segment_size": 5, "input_size": 32,
        "augmentation_kwargs": {"use_data_augmentation": True,
                                "rot_max": 0.25, "dist_max": 0.3,
                                "dim_max": 0.2, "random_drop": 0.25},
    }
    ds = JrdbBoxRegressionDataset("train", cfg)
    assert len(ds) > 0
    s = ds[0]
    assert s["input"].shape == (32, 4)  # xyz + angle channel
    assert s["target"].shape == (5,)
    assert s["target_neighbor"].shape == (8, 7)
    assert s["target_neighbor_valid"].any()
    # angle channel is constant per sample; ori residual consistent with it
    ang = s["input"][:, -1]
    assert np.allclose(ang, ang[0])
    np.testing.assert_allclose(s["target"][-1], s["rot_z"] - ang[0],
                               atol=1e-5)

    b = ds.batch([0, 1, 2])
    assert b["input"].shape == (3, 32, 4)
    assert b["target"].shape == (3, 5)


def test_jrdb_box_dataset_2d(jrdb_dir):
    cfg = {
        "data_dir": jrdb_dir, "radius_segment": 0.7, "perturb": 0.1,
        "is_3d": False, "min_segment_size": 5, "input_size": 16,
        "input_with_angle": False,
        "augmentation_kwargs": {"use_data_augmentation": False},
    }
    ds = JrdbBoxRegressionDataset("train", cfg)
    if len(ds):
        s = ds[0]
        assert s["input"].shape == (16, 2)
        assert s["target"].shape == (3,)


def test_jrdb_val_split_disjoint(jrdb_dir):
    h_train = JrdbHandle("train", {"data_dir": jrdb_dir})
    h_val = JrdbHandle("val", {"data_dir": jrdb_dir})
    assert not set(h_train.sequence_names) & set(h_val.sequence_names)
    assert set(h_train.sequence_names) <= set(JRDB_TRAIN_SEQUENCES)
