import jax
import jax.numpy as jnp
import numpy as np
import pytest

from event_flow_tpu.ops.spike import (
    SPIKE_FNS,
    arctanspike,
    get_spike_fn,
    mgspike,
    superspike,
    trianglespike,
)


def test_forward_is_heaviside():
    x = jnp.array([-1.0, 0.0, 0.5, 0.79, 0.81, 2.0])
    # spike fires when x - thresh > 0
    out = arctanspike(x, thresh=0.8, width=10.0)
    np.testing.assert_allclose(out, [0.0, 0.0, 0.0, 0.0, 1.0, 1.0])


@pytest.mark.parametrize("name", sorted(SPIKE_FNS))
def test_forward_equal_across_flavors(name):
    fn = get_spike_fn(name)
    x = jnp.linspace(-2, 2, 41)
    np.testing.assert_allclose(fn(x, 0.5), (x > 0.5).astype(jnp.float32))


def test_arctan_surrogate_grad():
    # d spike / dx = 1 / (1 + width * (x-thresh)^2)  (reference spiking_util.py:92)
    g = jax.grad(lambda x: arctanspike(x, thresh=1.0, width=10.0).sum())(
        jnp.array([0.0, 1.0, 1.5])
    )
    expect = 1.0 / (1.0 + 10.0 * np.array([-1.0, 0.0, 0.5]) ** 2)
    np.testing.assert_allclose(g, expect, rtol=1e-6)


def test_superspike_surrogate_grad():
    g = jax.grad(lambda x: superspike(x, thresh=0.0, width=10.0).sum())(
        jnp.array([-0.5, 0.0, 0.2])
    )
    expect = 1.0 / (1.0 + 10.0 * np.abs([-0.5, 0.0, 0.2])) ** 2
    np.testing.assert_allclose(g, expect, rtol=1e-6)


def test_triangle_surrogate_grad():
    g = jax.grad(lambda x: trianglespike(x, thresh=0.0, width=1.0).sum())(
        jnp.array([-2.0, -0.5, 0.0, 0.5, 2.0])
    )
    expect = np.maximum(0.0, 1.0 - np.abs([-2.0, -0.5, 0.0, 0.5, 2.0]))
    np.testing.assert_allclose(g, expect, rtol=1e-6)


def test_mgspike_surrogate_grad_peak():
    # multi-Gauss surrogate peaks at x = thresh
    xs = jnp.linspace(-2, 2, 201)
    g = jax.vmap(jax.grad(lambda x: mgspike(x, thresh=0.0, width=0.5)))(xs)
    assert jnp.argmax(g) == 100


def test_grad_flows_to_thresh():
    # thresh is learnable in LIF cells; gradient must be -surrogate
    gt = jax.grad(lambda t: arctanspike(jnp.array(1.2), thresh=t, width=10.0))(0.9)
    expect = -1.0 / (1.0 + 10.0 * (1.2 - 0.9) ** 2)
    np.testing.assert_allclose(gt, expect, rtol=1e-6)
