import jax
import jax.numpy as jnp
import numpy as np

from event_flow_tpu.ops.scatter import scatter_add


def _ref_scatter(idx, vals, size):
    b, m, c = vals.shape
    out = np.zeros((b, size, c), dtype=np.float64)
    for bi in range(b):
        for mi in range(m):
            out[bi, idx[bi, mi]] += vals[bi, mi]
    return out


def test_scatter_matches_naive():
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 50, size=(3, 200)).astype(np.int32)
    vals = rng.normal(size=(3, 200, 4)).astype(np.float32)
    out = scatter_add(jnp.asarray(idx), jnp.asarray(vals), 50)
    np.testing.assert_allclose(out, _ref_scatter(idx, vals, 50), rtol=1e-4, atol=1e-5)


def test_scatter_duplicate_indices():
    idx = jnp.zeros((1, 100), dtype=jnp.int32)
    vals = jnp.ones((1, 100, 1))
    out = scatter_add(idx, vals, 10)
    assert out[0, 0, 0] == 100.0
    assert out[0, 1:].sum() == 0.0


def test_scatter_grad_is_gather():
    # d/dvals sum(w * out) = w gathered at idx — the analytic VJP
    idx = jnp.array([[0, 2, 2, 1]], dtype=jnp.int32)
    vals = jnp.array([[[1.0], [2.0], [3.0], [4.0]]])
    w = jnp.arange(5.0).reshape(1, 5, 1)

    def f(v):
        return (scatter_add(idx, v, 5) * w).sum()

    g = jax.grad(f)(vals)
    np.testing.assert_allclose(g[0, :, 0], [0.0, 2.0, 2.0, 1.0])


def test_scatter_grad_matches_autodiff_oracle():
    rng = np.random.default_rng(1)
    idx = jnp.asarray(rng.integers(0, 30, size=(2, 64)).astype(np.int32))
    vals = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(2, 30, 3)).astype(np.float32))

    def with_custom(v):
        return (scatter_add(idx, v, 30) * w).sum()

    def with_autodiff(v):
        out = jax.vmap(
            lambda i, vv: jax.ops.segment_sum(vv, i, num_segments=30)
        )(idx, v)
        return (out * w).sum()

    np.testing.assert_allclose(
        jax.grad(with_custom)(vals), jax.grad(with_autodiff)(vals), rtol=1e-5
    )
