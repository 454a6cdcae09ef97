"""Opt-in TPU hardware smoke tests (VERDICT round-1 weak #5).

Run with ``EVFLOW_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py``
from an environment with a real TPU (the repo's CI conftest pins tests to
CPU; this module re-selects the default backend). Kept tiny on purpose —
the axon tunnel worker dies under heavy compiles — but covers the TPU
numerics that CPU tests cannot: scatter-add determinism on hardware, a
finite training update, and an eval window step.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("EVFLOW_TPU_TESTS") != "1",
    reason="TPU smoke tests are opt-in (EVFLOW_TPU_TESTS=1)",
)


@pytest.fixture(scope="module")
def tpu():
    import jax

    # undo the CPU pin from tests/conftest.py for this module's runs (run
    # this module in its own pytest invocation: a backend that other test
    # modules already initialized on CPU cannot be re-targeted)
    os.environ.pop("JAX_PLATFORMS", None)
    try:
        jax.config.update("jax_platforms", None)
        dev = jax.devices()[0]
    except RuntimeError as e:
        pytest.skip(f"cannot select TPU backend: {e}")
    if dev.platform == "cpu":
        pytest.skip("no TPU device available")
    yield dev
    jax.config.update("jax_platforms", "cpu")


def test_scatter_add_deterministic_on_hardware(tpu):
    """TPU scatter-adds are deterministic (SURVEY.md §5 race detection):
    same duplicate-heavy scatter twice -> bitwise-identical images."""
    import jax
    import jax.numpy as jnp

    from event_flow_tpu.ops.scatter import scatter_add

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 64, (2, 20000)), jnp.int32)
    vals = jnp.asarray(rng.normal(size=(2, 20000, 3)), jnp.float32)

    f = jax.jit(lambda i, v: scatter_add(i, v, 64))
    a = np.asarray(f(idx, vals))
    b = np.asarray(f(idx, vals))
    np.testing.assert_array_equal(a, b)
    # and matches the CPU oracle within float tolerance
    expect = np.zeros((2, 64, 3), np.float32)
    for bi in range(2):
        np.add.at(expect[bi], np.asarray(idx[bi]), np.asarray(vals[bi]))
    np.testing.assert_allclose(a, expect, rtol=1e-5, atol=1e-4)


def test_one_training_update_finite(tpu):
    """One b1 LIFFireNet update (64x64, T=3) compiles and yields a finite
    loss + finite params on the chip."""
    import jax
    import jax.numpy as jnp

    from event_flow_tpu.data.synthetic import constant_flow_window
    from event_flow_tpu.loss.warping import LossConfig
    from event_flow_tpu.models.registry import get_model
    from event_flow_tpu.train.optim import make_optimizer
    from event_flow_tpu.train.step import init_train_state, make_train_step

    RES, B, T, N = (64, 64), 1, 3, 500
    cfg = {"name": "LIFFireNet", "encoding": "cnt", "num_bins": 2,
           "base_num_channels": 32, "kernel_size": 3, "mask_output": True,
           "activations": ["arctanspike", "arctanspike"],
           "spiking_neuron": {"leak": [-4.0, 0.1], "thresh": [0.8, 0.1],
                              "learn_leak": True, "learn_thresh": True,
                              "hard_reset": True}}
    model = get_model("LIFFireNet", cfg)
    tx = make_optimizer("Adam", 2e-4, clip_grad=100.0)
    step = jax.jit(make_train_step(
        model, tx, RES, 2, LossConfig(RES, 64.0, 0.001, smoothing_mask=True)
    ))
    state = init_train_state(model, tx, jax.random.PRNGKey(0), B, RES, 2)
    rng = np.random.default_rng(0)
    ev = jnp.asarray(np.stack([np.stack(
        [constant_flow_window(rng, N, RES, (2.0, -2.0), 16)
         for _ in range(T)])]))
    state, loss = step(state, ev, jnp.ones((B, T, N)), jnp.zeros((B, 3)),
                       jnp.asarray(False))
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(p)))
               for p in jax.tree_util.tree_leaves(state.params))


def test_eval_window_step_finite(tpu):
    """One eval window step (encodings + model + IWE) on the chip."""
    import jax
    import jax.numpy as jnp

    from event_flow_tpu.data.synthetic import constant_flow_window
    from event_flow_tpu.eval.harness import Evaluator
    from event_flow_tpu.models.registry import get_model
    from event_flow_tpu.ops.hot_filter import init_hot_state
    from event_flow_tpu.train.step import init_train_state
    from event_flow_tpu.train.optim import make_optimizer

    RES, B, N = (64, 64), 1, 1000
    cfg = {
        "data": {"mode": "events", "window": N, "window_eval": N},
        "model": {"name": "FireNet", "encoding": "cnt", "num_bins": 2,
                  "base_num_channels": 32, "kernel_size": 3,
                  "activations": ["relu", None], "mask_output": True,
                  "spiking_neuron": None},
        "metrics": {"name": ["FWL"], "flow_scaling": 64},
        "loader": {"resolution": list(RES), "batch_size": B},
        "hot_filter": {"enabled": False},
    }
    model = get_model("FireNet", cfg["model"])
    tx = make_optimizer("Adam", 1e-3)
    state = init_train_state(model, tx, jax.random.PRNGKey(0), B, RES, 2)
    ev = Evaluator(cfg, model, state.params)
    rng = np.random.default_rng(1)
    events = jnp.asarray(constant_flow_window(rng, N, RES, (2.0, 1.0), 16))
    mstate, hstate, win = ev._step(
        state.params, state.model_state, init_hot_state(B, RES),
        events[None], jnp.ones((B, N)), jnp.zeros((B, 3)), jnp.zeros((B,)),
    )
    assert np.all(np.isfinite(np.asarray(win["flow_last"])))
    assert np.all(np.isfinite(np.asarray(win["iwe"])))


def test_auto_cell_impl_matches_xla(tpu):
    """EVFLOW_CELL_IMPL=auto routes ConvLIFRecurrent at a measured-win
    shape (c64) through the fused Pallas kernel on hardware; outputs and
    state must match the XLA cells within bf16 tolerance."""
    import jax
    import jax.numpy as jnp

    from event_flow_tpu.models import policy
    from event_flow_tpu.models.snn_cells import ConvLIFRecurrent

    cell = ConvLIFRecurrent(features=64, kernel_size=3)
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (2, 32, 32, 64), jnp.float32)
    v = jnp.zeros((2, 32, 32, 64), jnp.float32)
    z = jnp.zeros_like(v)
    params = cell.init(key, x, (v, z))

    # the auto gate must actually fire at this shape on this backend
    # (checked with the impl set to auto — the default is xla)
    bound = cell.bind(params)
    policy.set_cell_impl("auto")
    try:
        assert bound._use_fused(x, 1, rec=True)
    finally:
        policy.set_cell_impl("xla")

    outs = {}
    for impl in ("xla", "auto"):
        policy.set_cell_impl(impl)
        try:
            out, (v2, z2) = jax.jit(cell.apply)(params, x, (v, z))
            outs[impl] = (np.asarray(out), np.asarray(v2), np.asarray(z2))
        finally:
            policy.set_cell_impl("xla")
    for a, b in zip(outs["xla"], outs["auto"]):
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)
    # spikes are {0,1}: demand near-exact agreement (boundary cases may
    # flip under reordered accumulation, so allow a tiny fraction)
    assert (outs["xla"][2] != outs["auto"][2]).mean() < 1e-3
