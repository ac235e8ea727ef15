"""Mesh-config failure loudness: a `pipeline.mesh` request must never be
dropped silently (round-4 verdict item 2). Unknown axis names are config
errors, fallbacks to single-device jit log a warning naming the reason,
`strict: true` turns fallbacks into errors, and a pipe axis that doesn't
match the task's stage count fails with a config-level message instead of
a trace-time crash (config contract analogue: the reference builds exactly
what the config names or crashes, src/pipeline/pipeline.py:6-36)."""

import pytest

from planar_optical_flow_tpu.data import write_synthetic_drow_split
from planar_optical_flow_tpu.pipeline import Pipeline
from planar_optical_flow_tpu.utils.logger import RunLogger


@pytest.fixture
def warnings_log(monkeypatch):
    """Capture RunLogger.warning calls (the run logger doesn't propagate
    to the root logger, so caplog can't see them)."""
    msgs = []
    orig = RunLogger.warning
    monkeypatch.setattr(
        RunLogger, "warning",
        lambda self, m: (msgs.append(str(m)), orig(self, m)) and None,
    )
    return msgs


@pytest.fixture(scope="module")
def drow_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("meshcfg_drow"))
    write_synthetic_drow_split(d, "train", num_sequences=1, num_frames=16,
                               num_pts=64)
    return d


def _cfg(drow_dir, tmp_path, mesh, batch_size=8, model_type="drow"):
    return {
        "batch_size": batch_size,
        "epochs": 1,
        "num_scans": 2,
        "pedestrian_only": True,
        "data_dir": drow_dir,
        "log_dir": str(tmp_path / "logs"),
        "console": False,
        "tensorboard": False,
        "backup_list": [],
        "model_type": model_type,
        "mesh": mesh,
        "cutout_kwargs": dict(fixed=True, centered=True, window_width=1.0,
                              window_depth=0.5, num_cutout_pts=8,
                              padding_val=29.99, area_mode=False),
        "scheduler_kwargs": {"epoch0": 0, "lr0": 1e-3, "epoch1": 2,
                             "lr1": 1e-3},
    }


def test_unknown_mesh_axis_raises(drow_dir, tmp_path):
    with pytest.raises(ValueError, match="unknown mesh axis.*dataa"):
        Pipeline(_cfg(drow_dir, tmp_path, {"dataa": 8}),
                 install_signal_handlers=False)


def test_non_dict_mesh_raises(drow_dir, tmp_path):
    with pytest.raises(TypeError, match="pipeline.mesh must be a mapping"):
        Pipeline(_cfg(drow_dir, tmp_path, [8]),
                 install_signal_handlers=False)


def test_indivisible_batch_warns_and_falls_back(drow_dir, tmp_path,
                                                warnings_log):
    # batch 8 does not divide over data=3 -> single-device jit, loudly
    pipe = Pipeline(_cfg(drow_dir, tmp_path, {"data": 3}),
                    install_signal_handlers=False)
    assert pipe.trainer._mesh is None
    assert any("falling back to single-device jit" in m
               and "not divisible" in m for m in warnings_log)


def test_strict_mesh_raises_instead_of_falling_back(drow_dir, tmp_path):
    with pytest.raises(ValueError, match="strict"):
        Pipeline(_cfg(drow_dir, tmp_path, {"data": 3, "strict": True}),
                 install_signal_handlers=False)


def test_too_many_devices_warns(drow_dir, tmp_path, warnings_log):
    # 16 devices requested on the 8-device CPU mesh -> construction error,
    # warned, single-device fallback
    pipe = Pipeline(_cfg(drow_dir, tmp_path, {"data": 16}),
                    install_signal_handlers=False)
    assert pipe.trainer._mesh is None
    assert any("mesh construction failed" in m for m in warnings_log)


def test_valid_mesh_kept_without_warning(drow_dir, tmp_path, warnings_log):
    pipe = Pipeline(_cfg(drow_dir, tmp_path, {"data": 8}),
                    install_signal_handlers=False)
    assert pipe.trainer._mesh is not None
    assert dict(pipe.trainer._mesh.shape) == {"data": 8}
    assert not any("falling back" in m for m in warnings_log)


def test_pipe_axis_stage_count_mismatch_raises(drow_dir, tmp_path):
    # DROW stages into 2 pipeline stages; a pipe=4 mesh passes the batch
    # divisibility check (8 % 4 == 0) but must fail with a config-level
    # message, not a trace-time crash inside pipeline_apply
    pipe = Pipeline(_cfg(drow_dir, tmp_path, {"pipe": 4}),
                    install_signal_handlers=False)
    assert pipe.trainer._mesh is not None
    with pytest.raises(ValueError, match="2 pipeline stages"):
        pipe.train()


def test_model_only_mesh_kept_regardless_of_batch(drow_dir, tmp_path,
                                                  warnings_log):
    """A pure tensor-parallel mesh replicates the batch (no data axis),
    so batch divisibility must NOT drop it — batch 8 on {model: 8}."""
    cfg = _cfg(drow_dir, tmp_path, {"model": 8}, model_type="dr-spaam")
    pipe = Pipeline(cfg, install_signal_handlers=False)
    assert pipe.trainer._mesh is not None
    assert dict(pipe.trainer._mesh.shape) == {"model": 8}
    assert not any("falling back" in m for m in warnings_log)


def test_dcn_pipe_mesh_raises_at_init(drow_dir, tmp_path):
    with pytest.raises(ValueError, match="dcn axis cannot combine"):
        Pipeline(_cfg(drow_dir, tmp_path, {"dcn": 2, "pipe": 2},
                      batch_size=8),
                 install_signal_handlers=False)
