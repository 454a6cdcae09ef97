import jax.numpy as jnp
import numpy as np
import pytest

from event_flow_tpu.config.parser import default_config, merge_dicts
from event_flow_tpu.data.h5 import EventStream
from event_flow_tpu.data.schema import write_synthetic_sequence
from event_flow_tpu.eval.harness import Evaluator

RES = (32, 32)
VEL = (8.0, 16.0)  # (vy, vx) px/s


class ConstFlowModel:
    """Stub with the model interface that predicts a constant flow map."""

    def __init__(self, fx, fy):
        self.fx, self.fy = fx, fy

    def zero_state(self, b, h, w, dtype=jnp.float32):
        return ()

    def apply(self, params, voxel, cnt, state, log=False):
        b, h, w, _ = cnt.shape
        fm = jnp.zeros((b, h, w, 2)).at[..., 0].set(self.fx).at[..., 1].set(self.fy)
        return {"flow": [fm], "activity": None}, state


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("h5eval")
    for i in range(2):
        write_synthetic_sequence(
            str(root / f"seq{i}.h5"), res=RES, n_events=6000, duration=1.0,
            velocity=VEL, seed=i, gt_flow_hz=10, t0=1.0 + i,
        )
    return str(root)


def _config(dataset, mode, window, window_eval=None, metrics=("FWL", "RSAT")):
    cfg = default_config()
    merge_dicts(
        {
            "data": {
                "path": dataset,
                "mode": mode,
                "window": window,
                "window_eval": window_eval or window,
            },
            "model": {"num_bins": 2, "round_encoding": False},
            "metrics": {"name": list(metrics), "flow_scaling": 32},
            "loader": {
                "resolution": list(RES),
                "batch_size": 1,
                "augment": [],
                "seed": 0,
            },
            "hot_filter": {"enabled": False},
        },
        cfg,
    )
    return cfg


def test_fwl_rsat_zero_flow_is_unity(dataset):
    cfg = _config(dataset, "events", 2000)
    model = ConstFlowModel(0.0, 0.0)
    ev = Evaluator(cfg, model, params={})
    stream = EventStream(cfg)
    results = ev.run(stream, max_batches=4)
    stream.close()
    for fname, val in results["FWL"].items():
        assert val == pytest.approx(1.0, abs=1e-4)
    for fname, val in results["RSAT"].items():
        assert val == pytest.approx(1.0, abs=1e-4)


def test_fwl_improves_with_true_flow(dataset):
    cfg = _config(dataset, "events", 2000)
    # dt per 2000-event window ~ 1/3 s; displacement/window = v * dt;
    # normalized flow = displacement / flow_scaling
    dt = 1.0 / 3.0
    model = ConstFlowModel(VEL[1] * dt / 32.0, VEL[0] * dt / 32.0)
    ev = Evaluator(cfg, model, params={})
    stream = EventStream(cfg)
    results = ev.run(stream, max_batches=4)
    stream.close()
    assert all(v > 1.02 for v in results["FWL"].values()), results
    assert all(v < 1.0 for v in results["RSAT"].values()), results


def test_window_eval_accumulation(dataset):
    # window 1000, window_eval 2000 -> metrics every 2 windows
    cfg = _config(dataset, "events", 1000, window_eval=2000)
    model = ConstFlowModel(0.0, 0.0)
    ev = Evaluator(cfg, model, params={})
    assert ev.k_windows == 2
    stream = EventStream(cfg)
    results = ev.run(stream, max_batches=4)
    stream.close()
    its = sum(
        e["FWL"]["it"] for e in ev._results.values() if "FWL" in e
    )
    assert its == 2  # 4 windows -> 2 metric evaluations


def test_aee_zero_flow_matches_gt_magnitude(dataset):
    cfg = _config(dataset, "gtflow_dt1", 1, metrics=("AEE",))
    model = ConstFlowModel(0.0, 0.0)
    ev = Evaluator(cfg, model, params={})
    stream = EventStream(cfg)
    results = ev.run(stream, max_batches=6)
    stream.close()
    # GT per dt1 interval: (vx*dt, vy*dt) = (1.6, 0.8) px -> |gt| = 1.789
    expected = np.hypot(VEL[1] * 0.1, VEL[0] * 0.1)
    for fname, val in results["AEE"].items():
        assert val == pytest.approx(expected, rel=1e-3)
    for fname, val in results["AEE_percent"].items():
        assert 0.0 <= val <= 1.0


def test_results_keyed_per_file(dataset):
    cfg = _config(dataset, "events", 2000)
    model = ConstFlowModel(0.0, 0.0)
    ev = Evaluator(cfg, model, params={})
    stream = EventStream(cfg)
    results = ev.run(stream)
    stream.close()
    assert set(results["FWL"]) <= {"seq0.h5", "seq1.h5"}
    assert len(results["FWL"]) >= 1


class DecayFlowModel(ConstFlowModel):
    """Stateful stub: flow shrinks with a carried per-window counter, so
    chunked/per-window state handling differences change the metrics."""

    def zero_state(self, b, h, w, dtype=jnp.float32):
        return (jnp.zeros((b, 1, 1, 1), dtype),)

    def apply(self, params, voxel, cnt, state, log=False):
        (n,) = state
        b, h, w, _ = cnt.shape
        decay = 1.0 / (1.0 + n)
        fm = jnp.zeros((b, h, w, 2))
        fm = fm.at[..., 0].set(self.fx * decay[:, 0, 0, 0, None, None])
        fm = fm.at[..., 1].set(self.fy * decay[:, 0, 0, 0, None, None])
        return {"flow": [fm], "activity": None}, (n + 1.0,)


@pytest.mark.parametrize("mode,window,metrics", [
    ("events", 1000, ("FWL", "RSAT")),
    ("gtflow_dt1", 1, ("AEE",)),
])
def test_chunked_matches_per_window(dataset, mode, window, metrics):
    """The chunked fast path (one dispatch per S windows) reproduces the
    per-window protocol exactly — including recurrent state carry across
    chunk boundaries and sequence-change flushes."""
    window_eval = 2000 if mode == "events" else None
    results = {}
    for tag, chunk in (("chunked", "4"), ("plain", "1")):
        import os

        os.environ["EVFLOW_EVAL_CHUNK"] = chunk
        try:
            cfg = _config(dataset, mode, window, window_eval=window_eval,
                          metrics=metrics)
            ev = Evaluator(cfg, model := DecayFlowModel(0.4, 0.2),
                           params={})
            assert ev.chunked == (chunk == "4")
            stream = EventStream(cfg)
            results[tag] = ev.run(stream)
            stream.close()
        finally:
            del os.environ["EVFLOW_EVAL_CHUNK"]
    for metric in results["plain"]:
        assert set(results["chunked"][metric]) == set(results["plain"][metric])
        for fname, val in results["plain"][metric].items():
            assert results["chunked"][metric][fname] == pytest.approx(
                val, rel=1e-5, abs=1e-6
            ), (metric, fname)


def test_gt_f16_transfer_matches_f32(dataset):
    """EVFLOW_EVAL_GT_DTYPE=float16 ships the GT flow maps compact (the
    MVSEC transfer floor, see harness._flush_chunk) and must reproduce
    the f32 AEE well inside the 1% parity bar."""
    import os

    results = {}
    for tag in ("f32", "f16"):
        os.environ["EVFLOW_EVAL_CHUNK"] = "4"
        if tag == "f16":
            os.environ["EVFLOW_EVAL_GT_DTYPE"] = "float16"
        try:
            cfg = _config(dataset, "gtflow_dt1", 1, window_eval=None,
                          metrics=("AEE",))
            ev = Evaluator(cfg, DecayFlowModel(0.4, 0.2), params={})
            stream = EventStream(cfg)
            results[tag] = ev.run(stream)
            stream.close()
        finally:
            del os.environ["EVFLOW_EVAL_CHUNK"]
            os.environ.pop("EVFLOW_EVAL_GT_DTYPE", None)
    for metric in results["f32"]:
        for fname, val in results["f32"][metric].items():
            assert results["f16"][metric][fname] == pytest.approx(
                val, rel=2e-3, abs=1e-5
            ), (metric, fname)


class ScalarLeafDecayModel(DecayFlowModel):
    """DecayFlowModel plus a 0-d state leaf — the FireNet-family ANN
    cells carry scalar placeholder states (cells.py ConvLayerS), which
    must replicate (not shard) on the data mesh."""

    def zero_state(self, b, h, w, dtype=jnp.float32):
        return super().zero_state(b, h, w, dtype) + (jnp.zeros((), dtype),)

    def apply(self, params, voxel, cnt, state, log=False):
        out, inner = super().apply(params, voxel, cnt, state[:-1], log)
        return out, inner + (state[-1],)


@pytest.mark.parametrize("chunk", ["1", "4"])
def test_mesh_eval_matches_single_device(dataset, chunk):
    """Data-parallel eval (batch slots sharded over a 2-device 'data'
    mesh) reproduces the mesh-free run exactly, in both the per-window
    and the chunked dispatch paths, with sharded recurrent state (and a
    replicated scalar state leaf)."""
    import os

    from event_flow_tpu.parallel.mesh import make_mesh

    results = {}
    for tag in ("plain", "mesh"):
        os.environ["EVFLOW_EVAL_CHUNK"] = chunk
        try:
            cfg = _config(dataset, "events", 1000, window_eval=2000)
            cfg["loader"]["batch_size"] = 2  # one slot per file
            mesh = make_mesh(2) if tag == "mesh" else None
            ev = Evaluator(cfg, ScalarLeafDecayModel(0.4, 0.2), params={},
                           mesh=mesh)
            stream = EventStream(cfg)
            results[tag] = ev.run(stream)
            stream.close()
        finally:
            del os.environ["EVFLOW_EVAL_CHUNK"]
    for metric in results["plain"]:
        assert set(results["mesh"][metric]) == set(results["plain"][metric])
        for fname, val in results["plain"][metric].items():
            assert results["mesh"][metric][fname] == pytest.approx(
                val, rel=1e-5, abs=1e-6
            ), (metric, fname)


def test_mesh_eval_rejects_indivisible_batch(dataset):
    from event_flow_tpu.parallel.mesh import make_mesh

    cfg = _config(dataset, "events", 1000)
    cfg["loader"]["batch_size"] = 3
    with pytest.raises(AssertionError, match="divide"):
        Evaluator(cfg, ConstFlowModel(0.1, 0.1), params={},
                  mesh=make_mesh(2))
