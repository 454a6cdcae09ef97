"""Fused conv+LIF Pallas kernel — the north-star fusion.

The reference's SNN hot path is one bias-free conv followed by the LIF
neuron update and a surrogate-gradient Heaviside
(reference: models/spiking_submodules.py:96-126). Unfused, the feedforward
current ``ff = conv(x) [+ conv_rec(z)]`` round-trips HBM between the conv
kernel and the elementwise update; fused, one kernel per (batch, row-strip)
builds the im2col patches in VMEM, hits the MXU, and applies the neuron
dynamics on the accumulator before anything leaves the chip:

    hard reset:  v' = v*l*(1-z) + (1-l)*cur     (spiking_submodules.py:117-121)
    soft reset:  v' = v*l + (1-l)*cur - z*th    (spiking_submodules.py:122-126)
    z' = H(v' - th)   with surrogate gradient   (spiking_util.py:82-93)

The custom VJP avoids re-running the conv for the leak gradient by
recovering the current algebraically from the saved outputs:
``(1-l)*cur = v' - v*l*(1-z)`` (hard) / ``v' - v*l + z*th`` (soft); the
input/weight gradients use the DIRECT conv formulations (same as
models/conv.py::_conv_im2col_bwd — dx = conv(g, rot180 io-swapped w),
dw = conv with batch as the contraction dim), which avoid the 9x
patch-matrix materialization of the earlier im2col dw kernel
(EVFLOW_FUSED_BWD=patches re-selects it for A/B runs).

Semantics match ConvLIF / ConvLIFRecurrent with detach=True (the
reference default): the spike state's cotangent through the reset is
dropped; for the recurrent cell the previous spikes still receive the
recurrent-conv gradient (pre-detach use, spiking_submodules.py:530).

``leak`` and ``thresh`` enter POST-squash (sigmoid / clip applied by the
caller), so their parameter gradients chain outside the VJP boundary.
Supported: stride 1, odd k <= 5, NHWC; selected via EVFLOW_CELL_IMPL=pallas
(models/snn_cells.py) when shapes qualify.
"""

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv_pallas import (_compiler_params, _conv_dw, _conv_fwd,
                          _flatten_kernel, _flip_transpose_kernel,
                          _patches, _row_tile)
from . import conv_pallas as _cp

__all__ = ["fused_conv_lif", "fused_conv_lif_rec", "fused_lif_available"]


def _interpret():
    return _cp._INTERPRET


# Backward conv formulation: 'native' (direct XLA convs, no patch
# materialization — default) or 'patches' (the original Pallas im2col
# dx/dw kernels) for A/B measurements.
_FUSED_BWD = os.environ.get("EVFLOW_FUSED_BWD", "native")


def _conv_grads(x, w, g, k):
    """(dx, dw) of y = conv_same(x, w) given the output cotangent g,
    as the direct convs XLA emits for ``lax.conv`` autodiff
    (ops/conv_grads.py — shared with models/conv.py's im2col VJP): no
    im2col patch matrices."""
    if _FUSED_BWD == "patches":
        dx = _conv_fwd(g, _flatten_kernel(_flip_transpose_kernel(w)), k)
        dw = _conv_dw(x, g, k).reshape(w.shape)
        return dx, dw
    from .conv_grads import conv_same_grads

    return conv_same_grads(x, w, g, k)


def fused_lif_available(x_shape, kernel_size, stride, cout=None, rec=False):
    """Conservative VMEM-fit gate: both padded images (x and, for the
    recurrent cell, the previous spikes), the per-strip patch matrices,
    the flattened weights, and the f32 output strips must fit well inside
    the kernel's VMEM budget — otherwise report unavailable so the caller
    falls back to the XLA cells instead of failing Mosaic compilation."""
    b, h, w, cin = x_shape
    if stride != 1 or kernel_size % 2 == 0 or kernel_size > 5:
        return False
    if h % _row_tile(h) != 0:
        return False
    cout = cin if cout is None else cout
    k, p = kernel_size, kernel_size // 2
    th = _row_tile(h)
    imgs = (h + 2 * p) * w * cin * 4 + (rec * (h + 2 * p) * w * cout * 4)
    patches = th * w * k * k * (cin + rec * cout) * 4
    weights = k * k * (cin + rec * cout) * cout * 4
    strips = 5 * th * w * cout * 4  # v, z in + v, z out + f32 accumulator
    need = imgs + patches + weights + strips
    return need < _cp._VMEM_LIMIT // 3


def _surrogate(d, activation, width):
    """Surrogate gradient of the Heaviside at distance d = v' - th
    (ops/spike.py flavors; reference spiking_util.py:28-93)."""
    if activation == "arctanspike":
        return 1.0 / (1.0 + width * d * d)
    if activation == "superspike":
        return 1.0 / (1.0 + width * jnp.abs(d)) ** 2
    if activation == "trianglespike":
        return jnp.maximum(1.0 - width * jnp.abs(d), 0.0)
    if activation == "mgspike":
        import math

        def gauss(x, mu, sigma):
            return jnp.exp(-((x - mu) ** 2) / (2.0 * sigma * sigma)) / (
                sigma * math.sqrt(2.0 * math.pi))

        return (1.15 * gauss(d, 0.0, width)
                - 0.15 * gauss(d, width, 6.0 * width)
                - 0.15 * gauss(d, -width, 6.0 * width))
    raise KeyError(activation)


def _fwd_kernel(x_ref, w_ref, v_ref, z_ref, l_ref, t_ref,
                vo_ref, zo_ref, *, k, th, w_img, cin, cout,
                hard_reset, rec, zr_ref=None, wr_ref=None):
    j = pl.program_id(1)
    r0 = j * th
    pm = _patches(x_ref, r0, k, th, w_img, cin)
    cur = jnp.dot(pm, w_ref[:], preferred_element_type=jnp.float32)
    if rec:
        pr = _patches(zr_ref, r0, k, th, w_img, cout)
        cur = cur + jnp.dot(pr, wr_ref[:],
                            preferred_element_type=jnp.float32)
    cur = cur.reshape(1, th, w_img, cout)
    v = v_ref[:].astype(jnp.float32)
    z = z_ref[:].astype(jnp.float32)
    leak = l_ref[:].astype(jnp.float32).reshape(1, 1, 1, cout)
    thr = t_ref[:].astype(jnp.float32).reshape(1, 1, 1, cout)
    if hard_reset:
        v_out = v * leak * (1.0 - z) + (1.0 - leak) * cur
    else:
        v_out = v * leak + (1.0 - leak) * cur - z * thr
    z_out = (v_out - thr > 0).astype(jnp.float32)
    vo_ref[:] = v_out.astype(vo_ref.dtype)
    zo_ref[:] = z_out.astype(zo_ref.dtype)


def _fused_fwd(x, w2, v, z, leak, thresh, k, hard_reset, activation, width,
               z_rec=None, wr2=None):
    b, h, wd, cin = x.shape
    cout = w2.shape[1]
    p = k // 2
    th = _row_tile(h)
    xp = jnp.pad(x, ((0, 0), (p, p), (0, 0), (0, 0)))
    rec = z_rec is not None
    leak2 = leak.reshape(1, cout)
    thresh2 = thresh.reshape(1, cout)

    img_spec = lambda ch: pl.BlockSpec(
        (1, h + 2 * p, wd, ch), lambda i, j: (i, 0, 0, 0),
        memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((1, th, wd, cout), lambda i, j: (i, j, 0, 0),
                              memory_space=pltpu.VMEM)
    chan_spec = pl.BlockSpec((1, cout), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [
        img_spec(cin),
        pl.BlockSpec((k * k * cin, cout), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        state_spec, state_spec, chan_spec, chan_spec,
    ]
    args = [xp, w2, v, z, leak2, thresh2]
    kern = partial(_fwd_kernel, k=k, th=th, w_img=wd, cin=cin, cout=cout,
                   hard_reset=hard_reset, rec=rec)
    if rec:
        zrp = jnp.pad(z_rec, ((0, 0), (p, p), (0, 0), (0, 0)))
        in_specs += [img_spec(cout),
                     pl.BlockSpec((k * k * cout, cout), lambda i, j: (0, 0),
                                  memory_space=pltpu.VMEM)]
        args += [zrp, wr2]

        def kern(x_ref, w_ref, v_ref, z_ref, l_ref, t_ref, zr_ref, wr_ref,
                 vo_ref, zo_ref):
            _fwd_kernel(x_ref, w_ref, v_ref, z_ref, l_ref, t_ref,
                        vo_ref, zo_ref, k=k, th=th, w_img=wd, cin=cin,
                        cout=cout, hard_reset=hard_reset, rec=True,
                        zr_ref=zr_ref, wr_ref=wr_ref)

    vo, zo = pl.pallas_call(
        kern,
        grid=(b, h // th),
        in_specs=in_specs,
        out_specs=(state_spec, state_spec),
        out_shape=(jax.ShapeDtypeStruct((b, h, wd, cout), x.dtype),
                   jax.ShapeDtypeStruct((b, h, wd, cout), x.dtype)),
        interpret=_interpret(),
        **_compiler_params(),
    )(*args)
    return vo, zo


def _bwd_kernel(v_ref, z_ref, vo_ref, l_ref, t_ref, gv_ref, gz_ref,
                gcur_ref, gvin_ref, gl_ref, gt_ref, *, cout, hard_reset,
                activation, width):
    """Elementwise backward + per-channel (leak, thresh) accumulation.

    Recovers (1-l)*cur from the saved states, so no conv recompute:
      hard: (1-l)*cur = v' - v*l*(1-z)
      soft: (1-l)*cur = v' - v*l + z*th
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        gl_ref[:] = jnp.zeros_like(gl_ref)
        gt_ref[:] = jnp.zeros_like(gt_ref)

    v = v_ref[:].astype(jnp.float32)
    z = z_ref[:].astype(jnp.float32)
    v_out = vo_ref[:].astype(jnp.float32)
    leak = l_ref[:].astype(jnp.float32).reshape(1, 1, 1, cout)
    thr = t_ref[:].astype(jnp.float32).reshape(1, 1, 1, cout)
    g_v = gv_ref[:].astype(jnp.float32)
    g_z = gz_ref[:].astype(jnp.float32)

    sg = _surrogate(v_out - thr, activation, width)
    vbar = g_v + g_z * sg                      # total cotangent on v'
    tbar = -g_z * sg                           # d z'/d th
    one_m_l = 1.0 - leak
    cur_scaled = (v_out - v * leak * (1.0 - z)) if hard_reset else (
        v_out - v * leak + z * thr)            # == (1-l)*cur
    g_cur = vbar * one_m_l
    # Recovering cur divides by (1-l); with a learnable leak sigmoid(param)
    # rounds to exactly 1.0 in f32 once the raw param exceeds ~17, which
    # would make the leak gradient Inf/NaN. Clamp the divisor: as l -> 1 the
    # true d v'/d l contribution of cur is bounded (cur*(1-l) stays finite),
    # so a floored divisor only saturates an already-degenerate gradient.
    one_m_l = jnp.maximum(one_m_l, 1e-6)
    if hard_reset:
        g_vin = vbar * leak * (1.0 - z)
        # d v'/d l = v*(1-z) - cur ; vbar * that, with cur recovered
        lbar = vbar * (v * (1.0 - z) - cur_scaled / one_m_l)
    else:
        g_vin = vbar * leak
        lbar = vbar * (v - cur_scaled / one_m_l)
        tbar = tbar - vbar * z                 # soft reset -z*th term
    gcur_ref[:] = g_cur.astype(gcur_ref.dtype)
    gvin_ref[:] = g_vin.astype(gvin_ref.dtype)
    gl_ref[:] += lbar.sum(axis=(0, 1, 2)).reshape(1, cout)
    gt_ref[:] += tbar.sum(axis=(0, 1, 2)).reshape(1, cout)


def _fused_bwd_elem(v, z, v_out, leak, thresh, g_v, g_z, hard_reset,
                    activation, width):
    b, h, wd, cout = v.shape
    th = _row_tile(h)
    state_spec = pl.BlockSpec((1, th, wd, cout), lambda i, j: (i, j, 0, 0),
                              memory_space=pltpu.VMEM)
    chan_spec = pl.BlockSpec((1, cout), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM)
    g_cur, g_vin, g_l, g_t = pl.pallas_call(
        partial(_bwd_kernel, cout=cout, hard_reset=hard_reset,
                activation=activation, width=width),
        grid=(b, h // th),
        in_specs=[state_spec, state_spec, state_spec, chan_spec, chan_spec,
                  state_spec, state_spec],
        out_specs=(state_spec, state_spec, chan_spec, chan_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, wd, cout), v.dtype),
            jax.ShapeDtypeStruct((b, h, wd, cout), v.dtype),
            jax.ShapeDtypeStruct((1, cout), jnp.float32),
            jax.ShapeDtypeStruct((1, cout), jnp.float32),
        ),
        interpret=_interpret(),
        **_compiler_params(),
    )(v, z, v_out, leak.reshape(1, cout), thresh.reshape(1, cout), g_v, g_z)
    return g_cur, g_vin, g_l.reshape(cout), g_t.reshape(cout)


@partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def fused_conv_lif(x, w, v, z, leak, thresh, k, hard_reset, activation,
                   width):
    """Feedforward fused cell. x [B,H,W,Cin]; w [k,k,Cin,O]; v/z [B,H,W,O];
    leak/thresh [O] post-squash. Returns (v_out, z_out)."""
    return _fused_fwd(x, _flatten_kernel(w), v, z, leak, thresh, k,
                      hard_reset, activation, width)


def _ff_fwd(x, w, v, z, leak, thresh, k, hard_reset, activation, width):
    out = fused_conv_lif(x, w, v, z, leak, thresh, k, hard_reset,
                         activation, width)
    return out, (x, w, v, z, leak, thresh, out[0])


def _ff_bwd(k, hard_reset, activation, width, res, g):
    x, w, v, z, leak, thresh, v_out = res
    g_v, g_z = g
    g_cur, g_vin, g_l, g_t = _fused_bwd_elem(
        v, z, v_out, leak, thresh, g_v, g_z, hard_reset, activation, width)
    dx, dw = _conv_grads(x, w, g_cur, k)
    # z enters only via the (detached) reset -> no z cotangent
    dz = jnp.zeros_like(z)
    return dx, dw, g_vin, dz, g_l.astype(leak.dtype), g_t.astype(thresh.dtype)


fused_conv_lif.defvjp(_ff_fwd, _ff_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def fused_conv_lif_rec(x, w, w_rec, v, z, z_rec, leak, thresh, k,
                       hard_reset, activation, width):
    """Recurrent fused cell: current = conv(x) + conv_rec(z_rec).
    ``z_rec`` is the previous spike map feeding the recurrent conv
    PRE-detach (reference: spiking_submodules.py:518-530); for
    ConvLIFRecurrent z_rec is z itself — pass it separately so its
    recurrent-conv cotangent survives the detached reset."""
    return _fused_fwd(x, _flatten_kernel(w), v, z, leak, thresh, k,
                      hard_reset, activation, width,
                      z_rec=z_rec, wr2=_flatten_kernel(w_rec))


def _rec_fwd(x, w, w_rec, v, z, z_rec, leak, thresh, k, hard_reset,
             activation, width):
    out = fused_conv_lif_rec(x, w, w_rec, v, z, z_rec, leak, thresh, k,
                             hard_reset, activation, width)
    return out, (x, w, w_rec, v, z, z_rec, leak, thresh, out[0])


def _rec_bwd(k, hard_reset, activation, width, res, g):
    x, w, w_rec, v, z, z_rec, leak, thresh, v_out = res
    g_v, g_z = g
    g_cur, g_vin, g_l, g_t = _fused_bwd_elem(
        v, z, v_out, leak, thresh, g_v, g_z, hard_reset, activation, width)
    dx, dw = _conv_grads(x, w, g_cur, k)
    dzrec, dwrec = _conv_grads(z_rec, w_rec, g_cur, k)
    dz = jnp.zeros_like(z)
    return (dx, dw, dwrec, g_vin, dz, dzrec,
            g_l.astype(leak.dtype), g_t.astype(thresh.dtype))


fused_conv_lif_rec.defvjp(_rec_fwd, _rec_bwd)
