import jax.numpy as jnp
import numpy as np
import pytest

from event_flow_tpu.ops import scatter_pallas
from event_flow_tpu.ops.scatter import _scatter_add_xla
from event_flow_tpu.ops.scatter_pallas import scatter_add_pallas


@pytest.fixture(autouse=True)
def interpret_mode():
    scatter_pallas.set_interpret(True)
    yield
    scatter_pallas.set_interpret(False)


def test_matches_xla_backend():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 64, (2, 128)).astype(np.int32))
    vals = jnp.asarray(rng.normal(size=(2, 128, 4)).astype(np.float32))
    ours = scatter_add_pallas(idx, vals, 64)
    ref = _scatter_add_xla(idx, vals, 64)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5)


def test_duplicates_accumulate():
    idx = jnp.zeros((1, 32), jnp.int32)
    vals = jnp.ones((1, 32, 2))
    out = scatter_add_pallas(idx, vals, 8)
    np.testing.assert_allclose(out[0, 0], [32.0, 32.0])
    assert float(out[0, 1:].sum()) == 0.0
