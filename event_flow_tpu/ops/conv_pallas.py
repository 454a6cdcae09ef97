"""Pallas TPU convolution kernels (im2col matmul formulation).

The models are small-channel (C<=512) 3x3 convnets; XLA's conv on TPU v5e
reaches only a few percent of peak for these shapes because both channel
operands pad to the 128-lane tile. This kernel reformulates the conv as
im2col matmuls — [TH*W, K*K*C] @ [K*K*C, O] per row block — which keeps the
M dimension huge (H*W) and eats the channel padding only once on the N
side (BASELINE.json north star: fused Pallas conv kernels).

- forward: grid over batch; the padded image lives in VMEM; a fori_loop
  walks row blocks, building patches from shifted slices and hitting the
  MXU once per block.
- backward (custom_vjp): dx is the same kernel with the spatially-flipped,
  in/out-transposed kernel; dw is a [K*K*C, M] @ [M, O] matmul with grid
  accumulation over M chunks. All three matmuls ride the MXU.

Supported: stride 1, odd kernel size, H divisible by the row tile.
Strided convs (UNet encoders) fall back to XLA. Layout NHWC.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv2d_pallas", "conv2d_pallas_available", "set_interpret"]

_INTERPRET = False  # flipped by tests on CPU


def set_interpret(flag):
    global _INTERPRET
    _INTERPRET = bool(flag)


def conv2d_pallas_available(x_shape, kernel_size, stride):
    b, h, w, c = x_shape
    if stride != 1 or kernel_size % 2 == 0 or kernel_size > 5:
        return False
    # padded image + patch block must fit VMEM comfortably
    p = kernel_size // 2
    img_bytes = (h + 2 * p) * (w + 2 * p) * c * 4
    return h % _row_tile(h) == 0 and img_bytes < 9 * 1024 * 1024


def _row_tile(h):
    for th in (16, 8, 4, 2, 1):
        if h % th == 0:
            return th
    return 1


def _fwd_kernel(x_ref, w_ref, o_ref, *, k, th, h_img, w_img, cin, cout):
    """One batch program. x_ref: [1, H+2p, W+2p, C]; w_ref: [k*k*C, O];
    o_ref: [1, H, W, O]."""
    w2 = w_ref[:]

    def body(i, _):
        r0 = i * th
        patches = []
        for dy in range(k):
            for dx in range(k):
                patches.append(
                    x_ref[0, pl.ds(r0 + dy, th), pl.ds(dx, w_img), :]
                )
        pm = jnp.concatenate(patches, axis=-1).reshape(
            th * w_img, k * k * cin
        )
        y = jnp.dot(pm, w2, preferred_element_type=jnp.float32)
        o_ref[0, pl.ds(r0, th), :, :] = y.reshape(th, w_img, cout).astype(
            o_ref.dtype
        )
        return 0

    jax.lax.fori_loop(0, h_img // th, body, 0)


def _conv_fwd(x, w2, k):
    """x [B,H,W,C]; w2 [k*k*C, O] flattened row-major (dy, dx, cin)."""
    b, h, wd, cin = x.shape
    cout = w2.shape[1]
    p = k // 2
    th = _row_tile(h)
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))

    return pl.pallas_call(
        partial(_fwd_kernel, k=k, th=th, h_img=h, w_img=wd, cin=cin,
                cout=cout),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h + 2 * p, wd + 2 * p, cin),
                         lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * k * cin, cout), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wd, cout), lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, cout), x.dtype),
        interpret=_INTERPRET,
    )(xp, w2)


def _dw_kernel(p_ref, g_ref, o_ref):
    """Grid accumulation over M chunks: o += p_chunk^T @ g_chunk."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += jax.lax.dot_general(
        p_ref[:], g_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _conv_dw(x, g, k):
    """dW2 [k*k*C, O] = im2col(x)^T @ g, accumulated over M chunks."""
    b, h, wd, cin = x.shape
    cout = g.shape[-1]
    p = k // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    patches = [
        xp[:, dy:dy + h, dx:dx + wd, :] for dy in range(k) for dx in range(k)
    ]
    pm = jnp.concatenate(patches, axis=-1).reshape(b * h * wd, k * k * cin)
    gm = g.reshape(b * h * wd, cout)
    m = pm.shape[0]
    mc = 4096
    while m % mc:
        mc //= 2
    steps = m // mc
    out = pl.pallas_call(
        _dw_kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((mc, k * k * cin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mc, cout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k * k * cin, cout), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k * k * cin, cout), jnp.float32),
        interpret=_INTERPRET,
    )(pm, gm)
    return out.astype(x.dtype)


def _flatten_kernel(w):
    """[k,k,Cin,O] -> [k*k*Cin, O], (dy, dx, cin) row order matching the
    forward kernel's patch concat."""
    k = w.shape[0]
    return w.reshape(k * k * w.shape[2], w.shape[3])


def _flip_transpose_kernel(w):
    """Weights for dx: spatially flipped, in/out channels swapped."""
    return jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)


@jax.custom_vjp
def conv2d_pallas(x, w):
    """Same-padding stride-1 conv. x [B,H,W,Cin] NHWC; w [k,k,Cin,O]."""
    return _conv_fwd(x, _flatten_kernel(w), w.shape[0])


def _cp_fwd(x, w):
    return conv2d_pallas(x, w), (x, w)


def _cp_bwd(res, g):
    x, w = res
    k = w.shape[0]
    dx = _conv_fwd(g, _flatten_kernel(_flip_transpose_kernel(w)), k)
    dw2 = _conv_dw(x, g, k)
    dw = dw2.reshape(k, k, w.shape[2], w.shape[3])
    return dx, dw


conv2d_pallas.defvjp(_cp_fwd, _cp_bwd)
