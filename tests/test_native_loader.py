import numpy as np
import pytest

from event_flow_tpu.config.parser import default_config, merge_dicts
from event_flow_tpu.data.h5 import EventStream
from event_flow_tpu.data.native_loader import (
    NativeEventStream,
    native_available,
)
from event_flow_tpu.data.schema import write_synthetic_sequence

RES = (32, 32)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ toolchain unavailable"
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("native_ds")
    for i in range(3):
        write_synthetic_sequence(
            str(root / f"seq{i}.h5"), res=RES, n_events=4000, duration=1.0,
            velocity=(2.0, 4.0), seed=i, t0=1.0 + i,
        )
    return str(root)


def _config(dataset, window=500, batch_size=2):
    cfg = default_config()
    merge_dicts(
        {
            "data": {"path": dataset, "mode": "events", "window": window},
            "loader": {
                "resolution": list(RES),
                "batch_size": batch_size,
                "augment": [],
                "seed": 0,
            },
        },
        cfg,
    )
    return cfg


def test_matches_python_stream(dataset):
    cfg = _config(dataset)
    py = EventStream(cfg)
    nat = NativeEventStream(cfg)
    for step in range(6):
        pb = py.next_batch()
        nb = nat.next_batch()
        assert pb["new_seq"] == nb["new_seq"], step
        np.testing.assert_allclose(
            nb["events"], pb["events"], rtol=1e-5, atol=1e-5,
            err_msg=f"step {step}",
        )
        np.testing.assert_allclose(nb["dt_input"], pb["dt_input"], rtol=1e-4)
    py.close()
    nat.close()


def test_rollover_and_attribution(dataset):
    cfg = _config(dataset, window=1500)
    nat = NativeEventStream(cfg)
    names = set()
    rolled = 0
    for _ in range(8):
        b = nat.next_batch()
        rolled += int(b["new_seq"])
        names.add(nat.slot_filename(0))
    assert rolled >= 1
    assert len(names) >= 2
    nat.close()


def test_prefetch_is_consistent(dataset):
    # drain quickly; the double buffer must never duplicate or drop windows
    cfg = _config(dataset, window=200, batch_size=1)
    nat = NativeEventStream(cfg)
    first_events = []
    for _ in range(10):
        b = nat.next_batch()
        first_events.append(tuple(b["events"][0, 0]))
    nat.close()
    # consecutive windows advance the cursor: first timestamps increase
    # within one sequence
    ts = [e[0] for e in first_events]
    assert any(t2 > t1 for t1, t2 in zip(ts, ts[1:]))
    assert len(set(first_events)) == len(first_events)


@pytest.fixture(scope="module")
def dataset_gt(tmp_path_factory):
    root = tmp_path_factory.mktemp("native_gt")
    for i in range(2):
        write_synthetic_sequence(
            str(root / f"seq{i}.h5"), res=RES, n_events=8000, duration=1.0,
            velocity=(2.0, 4.0), seed=10 + i, t0=1.0 + i, gt_flow_hz=8,
            gt_flow_dt4_interval=0.25,
        )
    return str(root)


def _mode_config(dataset, mode, window, batch_size=2, max_events=4096):
    cfg = default_config()
    merge_dicts(
        {
            "data": {"path": dataset, "mode": mode, "window": window,
                     "max_events": max_events},
            "loader": {
                "resolution": list(RES),
                "batch_size": batch_size,
                "augment": [],
                "seed": 0,
            },
        },
        cfg,
    )
    return cfg


@pytest.mark.parametrize("mode,window", [
    ("time", 0.05),
    ("gtflow_dt1", 1),
    ("gtflow_dt4", 0.25),  # fractional windows (reference h5.py:208-223)
])
def test_variable_modes_match_python_stream(dataset_gt, mode, window):
    """time / gtflow window modes: the native loader's event windows,
    validity masks, gt maps, and dt_gt match the Python stream exactly."""
    cfg = _mode_config(dataset_gt, mode, window)
    py = EventStream(cfg)
    nat = NativeEventStream(cfg)
    for step in range(10):
        pb = py.next_batch()
        nb = nat.next_batch()
        assert pb["new_seq"] == nb["new_seq"], (mode, step)
        np.testing.assert_array_equal(
            nb["valid"], pb["valid"], err_msg=f"{mode} step {step}"
        )
        np.testing.assert_allclose(
            nb["events"], pb["events"], rtol=1e-5, atol=1e-5,
            err_msg=f"{mode} step {step}",
        )
        np.testing.assert_allclose(nb["dt_input"], pb["dt_input"], rtol=1e-4)
        if mode.startswith("gtflow"):
            np.testing.assert_allclose(nb["gtflow"], pb["gtflow"])
            np.testing.assert_allclose(nb["dt_gt"], pb["dt_gt"], rtol=1e-6)
    py.close()
    nat.close()
