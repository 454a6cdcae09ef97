"""tools/check_dataset.py: the real-data readiness drill (VERDICT r4 #8).

Must pass on a schema-correct synthetic tree and fail with actionable
messages on the malformed variants a real dataset drop could produce
(missing events datasets, missing t0, unsorted ts, flow maps without
``timestamp`` attrs, wrong flow-map rank).
"""

import os
import sys

import h5py
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from event_flow_tpu.data.schema import write_synthetic_sequence  # noqa: E402

import check_dataset  # noqa: E402


@pytest.fixture
def good_file(tmp_path):
    p = str(tmp_path / "seq.h5")
    write_synthetic_sequence(p, res=(32, 32), n_events=2000, duration=1.0,
                             velocity=(2.0, 3.0), seed=0, gt_flow_hz=4.0)
    return p


def test_good_file_passes(good_file):
    errors, warnings = check_dataset.check_file(
        good_file, mode="gtflow_dt1", res=(32, 32))
    assert errors == []
    assert warnings == []


def test_missing_events_dataset(good_file):
    with h5py.File(good_file, "a") as f:
        del f["events/ps"]
    errors, _ = check_dataset.check_file(good_file)
    assert any("events/ps" in e for e in errors)


def test_missing_t0_attr(good_file):
    with h5py.File(good_file, "a") as f:
        del f.attrs["t0"]
    errors, _ = check_dataset.check_file(good_file)
    assert any("t0" in e for e in errors)


def test_unsorted_ts(good_file):
    with h5py.File(good_file, "a") as f:
        ts = f["events/ts"][:]
        ts[10], ts[11] = ts[11] + 1.0, ts[10]
        f["events/ts"][:] = ts
    errors, _ = check_dataset.check_file(good_file)
    assert any("not sorted" in e for e in errors)


def test_flow_map_missing_timestamp_attr(good_file):
    with h5py.File(good_file, "a") as f:
        name = next(iter(f["flow_dt1"]))
        del f["flow_dt1"][name].attrs["timestamp"]
    errors, _ = check_dataset.check_file(good_file, mode="gtflow_dt1")
    assert any("timestamp" in e for e in errors)


def test_flow_map_wrong_shape(good_file):
    with h5py.File(good_file, "a") as f:
        name = next(iter(f["flow_dt1"]))
        stamp = f["flow_dt1"][name].attrs["timestamp"]
        del f["flow_dt1"][name]
        d = f["flow_dt1"].create_dataset(name, data=np.zeros((32, 32)))
        d.attrs["timestamp"] = stamp
    errors, _ = check_dataset.check_file(good_file, mode="gtflow_dt1")
    assert any("(2, H, W)" in e for e in errors)


def test_gtflow_mode_requires_group(good_file):
    with h5py.File(good_file, "a") as f:
        del f["flow_dt1"]
    errors, _ = check_dataset.check_file(good_file, mode="gtflow_dt1")
    assert any("flow_dt1" in e for e in errors)
    # events mode is fine without it
    errors, _ = check_dataset.check_file(good_file, mode="events")
    assert errors == []


def test_cli_on_tree(tmp_path, good_file, capsys, monkeypatch):
    monkeypatch.setattr(
        sys, "argv",
        ["check_dataset.py", str(tmp_path), "--mode", "gtflow_dt1"])
    assert check_dataset.main() == 0
    out = capsys.readouterr().out
    assert "OK" in out and "eval_MVSEC" in out


def test_cli_fails_on_empty_dir(tmp_path, capsys, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["check_dataset.py", str(tmp_path)])
    assert check_dataset.main() == 1
