import jax
import jax.numpy as jnp
import numpy as np
import pytest

from event_flow_tpu.ops import conv_pallas
from event_flow_tpu.ops.conv_pallas import conv2d_pallas


@pytest.fixture(autouse=True)
def interpret_mode():
    # CPU tests run the kernels in the Pallas interpreter
    conv_pallas.set_interpret(True)
    yield
    conv_pallas.set_interpret(False)


def _xla_conv(x, w):
    p = w.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize("shape,k", [
    ((2, 16, 16, 8), 3),
    ((1, 8, 24, 4), 3),
    ((2, 16, 16, 8), 1),
    ((1, 16, 16, 8), 5),
])
def test_forward_matches_xla(shape, k):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=(k, k, shape[-1], 16)).astype(np.float32) * 0.1
    )
    ours = conv2d_pallas(x, w)
    ref = _xla_conv(x, w)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_gradients_match_xla():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 16)).astype(np.float32) * 0.1)
    t = jnp.asarray(rng.normal(size=(2, 16, 16, 16)).astype(np.float32))

    def loss_p(x, w):
        return ((conv2d_pallas(x, w) - t) ** 2).sum()

    def loss_x(x, w):
        return ((_xla_conv(x, w) - t) ** 2).sum()

    gx_p, gw_p = jax.grad(loss_p, argnums=(0, 1))(x, w)
    gx_x, gw_x = jax.grad(loss_x, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_x),
                               rtol=1e-3, atol=1e-4)


def test_availability_gate():
    from event_flow_tpu.ops.conv_pallas import conv2d_pallas_available

    assert conv2d_pallas_available((8, 128, 128, 32), 3, 1)
    assert not conv2d_pallas_available((8, 128, 128, 32), 3, 2)  # stride
    assert not conv2d_pallas_available((8, 128, 128, 32), 4, 1)  # even k
