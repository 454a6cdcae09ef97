"""Pallas TPU convolution kernels (im2col matmul formulation).

The models are small-channel (C<=512) 3x3 convnets; the conv is expressed
as im2col matmuls — [TH*W, K*K*C] @ [K*K*C, O] per row strip — which keeps
the M dimension large and pays the 128-lane padding of the small channel
count only on the N side (BASELINE.json north star: fused Pallas conv
kernels).

Hardware lessons baked in (measured on TPU v5e behind the axon tunnel):
  - row strips are GRID dimensions, not an in-kernel fori_loop (the
    dynamic-slice-write loop form crashes the remote Mosaic compile helper
    at batch >= 7);
  - ``CompilerParams(vmem_limit_bytes=100MB)`` is REQUIRED: the default
    VMEM budget rejects these whole-image-resident blocks once a fused
    producer feeds the kernel (opaque "HTTP 500" helper crashes);
  - input is padded in H only (W stays lane-aligned); the column halo is
    built in-kernel with static rolls + masks, so no operand ever carries
    a padded lane dimension.

- forward: grid (batch, row-strips); the H-padded image resides in VMEM
  per batch; each program builds its strip's patches and hits the MXU once.
- backward (custom_vjp): dx is the same kernel with the spatially-flipped,
  in/out-transposed kernel; dw is a [K*K*C, M] @ [M, O] matmul with grid
  accumulation over M chunks. All three matmuls ride the MXU.

Supported: stride 1, odd kernel size <= 5, H divisible by the row tile.
Strided convs (UNet encoders) fall back to XLA. Layout NHWC.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv2d_pallas", "conv2d_pallas_available", "set_interpret"]

_INTERPRET = False  # flipped by tests on CPU

# the v5e has 128 MB of VMEM; the compile helper rejects kernels under its
# much smaller default budget (see module docstring)
_VMEM_LIMIT = 100 * 2**20


def set_interpret(flag):
    global _INTERPRET
    _INTERPRET = bool(flag)


def _compiler_params():
    if _INTERPRET:
        return {}
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=_VMEM_LIMIT)}


def conv2d_pallas_available(x_shape, kernel_size, stride):
    b, h, w, c = x_shape
    if stride != 1 or kernel_size % 2 == 0 or kernel_size > 5:
        return False
    # H-padded image + per-strip blocks must fit VMEM comfortably
    p = kernel_size // 2
    img_bytes = (h + 2 * p) * w * c * 4
    return h % _row_tile(h) == 0 and img_bytes < 24 * 1024 * 1024


def _row_tile(h):
    for th in (16, 8, 4, 2, 1):
        if h % th == 0:
            return th
    return 1


def _patches(x_ref, r0, k, th, w_img, cin):
    """Im2col patch strip [th*W, k*k*C] from an H-padded VMEM image
    ([1, H+2p, W, C]); column halo via static rolls + masks (W is the
    lane dim; never padded). Mosaic's rotate only handles 32-bit data,
    so narrow inputs (bf16) roll in f32 and the patch matrix casts back
    before the MXU dot. Shared by the conv and fused conv+LIF kernels."""
    p = k // 2
    dtype = x_ref.dtype
    narrow = jnp.dtype(dtype).itemsize < 4
    out = []
    for dy in range(k):
        rows = x_ref[0, pl.ds(r0 + dy, th), :, :]  # [th, W, C]
        if narrow:
            rows = rows.astype(jnp.float32)
        for dx in range(-p, p + 1):
            if dx == 0:
                sh = rows
            else:
                sh = pltpu.roll(rows, (w_img - dx) % w_img, 1)
                col = jax.lax.broadcasted_iota(
                    jnp.int32, (th, w_img, cin), 1)
                sh = jnp.where(
                    col >= -dx if dx < 0 else col <= w_img - 1 - dx,
                    sh, 0.0)
            out.append(sh)
    pm = jnp.concatenate(out, axis=-1).reshape(th * w_img, k * k * cin)
    return pm.astype(dtype) if narrow else pm


def _fwd_kernel(x_ref, w_ref, o_ref, *, k, th, w_img, cin, cout):
    """Grid (batch, row-strips). x_ref: [1, H+2p, W, C] (H-padded only);
    w_ref: [k*k*C, O]; o_ref: [1, th, W, O]."""
    j = pl.program_id(1)
    pm = _patches(x_ref, j * th, k, th, w_img, cin)
    y = jnp.dot(pm, w_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = y.reshape(1, th, w_img, cout).astype(o_ref.dtype)


def _conv_fwd(x, w2, k):
    """x [B,H,W,C]; w2 [k*k*C, O] flattened row-major (dy, dx, cin)."""
    b, h, wd, cin = x.shape
    cout = w2.shape[1]
    p = k // 2
    th = _row_tile(h)
    xp = jnp.pad(x, ((0, 0), (p, p), (0, 0), (0, 0)))  # H-only pad

    return pl.pallas_call(
        partial(_fwd_kernel, k=k, th=th, w_img=wd, cin=cin, cout=cout),
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, h + 2 * p, wd, cin),
                         lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * k * cin, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, wd, cout), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, cout), x.dtype),
        interpret=_INTERPRET,
        **_compiler_params(),
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
        **_compiler_params(),
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
