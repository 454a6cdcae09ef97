"""Convolution primitives (NHWC, TPU-native) with reference-compatible
shape semantics and init distributions.

The reference uses torch ``nn.Conv2d(k, stride, padding=k//2)`` everywhere
(symmetric padding) — we reproduce that with explicit padding on
``lax.conv_general_dilated`` so output sizes match for odd inputs too
(out = floor((h + 2*(k//2) - k)/s) + 1).

Init distributions (all cited to the reference):
  - ``torch_default``: kaiming_uniform(a=sqrt(5)) == U(+-sqrt(1/(Cin*k*k)))
    plus bias U(+-1/sqrt(Cin*k*k)) — torch's nn.Conv2d default, used by all
    ANN cells (submodules.py:33).
  - ``uniform_fan_in_channels``: U(+-sqrt(1/Cin)) — the SNN cells' init
    (spiking_submodules.py:74-75; fan-in counts channels only, not k^2).
  - ``w_scale``: U(+-w_scale) with zero bias (submodules.py:34-36).
  - ``orthogonal``: ConvGRU gates (submodules.py:393-398), zero bias.
"""

import math
import os

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

__all__ = ["Conv2d", "ConvTranspose2dX2", "conv2d_fn",
           "torch_conv_kernel_init", "set_conv_compute_dtype",
           "set_conv_quant"]

# Conv compute precision policy: 'float32' (default, parity) or 'bfloat16'
# (TPU MXU fast path; accumulation stays f32 via preferred_element_type).
_COMPUTE_DTYPE = os.environ.get("EVFLOW_CONV_DTYPE", "float32")


def set_conv_compute_dtype(name):
    global _COMPUTE_DTYPE
    assert name in ("float32", "bfloat16"), name
    _COMPUTE_DTYPE = name


def _conv_operands(x, kernel):
    if _COMPUTE_DTYPE == "bfloat16":
        return x.astype(jnp.bfloat16), kernel.astype(jnp.bfloat16)
    return x, kernel.astype(x.dtype)


# Conv implementation policy: 'xla' | 'im2col' | 'pallas' | 'auto'.
#  - 'auto' picks the im2col-matmul formulation on TPU for stride-1 odd-k
#    convs (isolated: 100 us vs 175 us for lax.conv at the 32-channel
#    b8 128^2 shapes, measured v5e) and lax.conv elsewhere.
#  - 'pallas' selects the Pallas kernel (ops/conv_pallas.py) — compiles
#    and runs on hardware (needs the raised VMEM budget baked into the
#    kernel); XLA's conv remains faster for these shapes, so 'auto' does
#    not pick it.
_CONV_IMPL = os.environ.get("EVFLOW_CONV_IMPL", "auto")

# Backward for the im2col path: 'native' (custom VJP -> direct XLA convs,
# default) or 'patches' (autodiff through the patch matmul) for A/B runs.
_CONV_BWD = os.environ.get("EVFLOW_CONV_BWD", "native")


def set_conv_impl(name):
    global _CONV_IMPL
    assert name in ("xla", "im2col", "pallas", "auto"), name
    _CONV_IMPL = name


# Serving-only int8 quantization policy ('none' | 'int8'). The v5e MXU
# runs int8 matmuls at 2x its bf16 rate (394 vs 197 TOPS) and the
# operand bytes halve vs bf16; spiking models quantize especially well
# because every hidden conv's input is BINARY spikes (exact at any
# scale). Inference-only: round() has zero gradient, so training paths
# must keep this off.
_CONV_QUANT = os.environ.get("EVFLOW_CONV_QUANT", "none")


def set_conv_quant(name):
    global _CONV_QUANT
    assert name in ("none", "int8"), name
    _CONV_QUANT = name


def _quantize_sym(a, axes, signed_max=127.0):
    """Symmetric linear quantization: returns (int8 values, f32 scale)
    with scale shaped to broadcast back over ``a``."""
    scale = jnp.max(jnp.abs(a), axis=axes, keepdims=True) / signed_max
    scale = jnp.maximum(scale.astype(jnp.float32), 1e-12)
    q = jnp.clip(jnp.round(a.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _conv2d_int8(x, kernel, stride, pad):
    """int8 x int8 -> int32 conv: per-output-channel weight scales,
    dynamic per-tensor activation scale. The integer accumulation is
    exact, so the only error vs f32 is the input rounding (zero for
    binary spike inputs)."""
    w_i8, w_scale = _quantize_sym(kernel, (0, 1, 2))  # [1,1,1,Cout]
    x_i8, a_scale = _quantize_sym(x, None)
    k = kernel.shape[0]
    if stride == 1 and k % 2 == 1 and _conv_impl_for(x.shape, k, 1) != "xla":
        # im2col form: one [B*H*W, k*k*C] @ [k*k*C, O] int8 matmul
        b, h, w, cin = x.shape
        cout = kernel.shape[-1]
        xp = jnp.pad(x_i8, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        patches = [
            xp[:, dy:dy + h, dx:dx + w, :]
            for dy in range(k) for dx in range(k)
        ]
        pm = jnp.concatenate(patches, axis=-1).reshape(b * h * w,
                                                       k * k * cin)
        y = jax.lax.dot(pm, w_i8.reshape(k * k * cin, cout),
                        preferred_element_type=jnp.int32)
        y = y.reshape(b, h, w, cout)
    elif (jax.default_backend() == "tpu"
          and os.environ.get("EVFLOW_INT8_STRIDED", "dequant") == "dequant"):
        # int8 DOTS lower to the TPU MXU, but int8 CONVOLUTIONS are not a
        # guaranteed lowering — strided convs (the UNet encoders, a
        # minority of serving FLOPs) compute with the DEQUANTIZED int8
        # values instead: identical quantization numerics (modulo f32
        # summation rounding), f32 MXU speed. EVFLOW_INT8_STRIDED=conv
        # re-selects the integer conv for A/B once measured viable.
        xq = x_i8.astype(jnp.float32) * a_scale
        wq = w_i8.astype(jnp.float32) * w_scale
        return jax.lax.conv_general_dilated(
            xq, wq,
            window_strides=(stride, stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    else:
        y = jax.lax.conv_general_dilated(
            x_i8, w_i8,
            window_strides=(stride, stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
    return y.astype(jnp.float32) * (a_scale * w_scale.reshape(1, 1, 1, -1))


def _conv_impl_for(x_shape, k, stride):
    if _CONV_IMPL == "xla":
        return "xla"
    # the im2col formulation is stride-1 odd-k only; strided convs (UNet
    # encoders) always take lax.conv, even when im2col is forced
    if stride != 1 or k % 2 == 0:
        return "xla"
    if _CONV_IMPL == "im2col":
        return "im2col"
    if _CONV_IMPL == "pallas":
        from ..ops.conv_pallas import conv2d_pallas_available

        return "pallas" if conv2d_pallas_available(x_shape, k, stride) else "xla"
    # auto
    return "im2col" if jax.default_backend() == "tpu" else "xla"


def _conv_im2col_raw(x, kernel, k):
    """Stride-1 same-padding conv as one [B*H*W, k*k*C] @ [k*k*C, O]
    matmul — keeps the M dim huge so the MXU amortizes the small-channel
    padding; bandwidth-bound on the patch materialization."""
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    p = k // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    patches = [
        xp[:, dy:dy + h, dx:dx + w, :] for dy in range(k) for dx in range(k)
    ]
    pm = jnp.concatenate(patches, axis=-1).reshape(b * h * w, k * k * cin)
    w2 = kernel.reshape(k * k * cin, cout)
    y = jax.lax.dot(pm, w2, preferred_element_type=jnp.float32)
    return y.reshape(b, h, w, cout)


from functools import partial  # noqa: E402


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv_im2col(x, kernel, k):
    """im2col forward (fast on TPU: one huge-M matmul) with a NATIVE conv
    backward. Autodiff through the patch construction materializes a 9x
    input-sized patch cotangent, re-expands patches for dw, and transposes
    them — measured pathological at the UNet's wide layers. The VJP below
    instead computes dx / dw with the same direct conv formulations XLA
    emits for ``lax.conv`` autodiff:

      dx = conv(g, rot180(kernel) io-swapped), same padding
      dw = conv(x as [Ci,H,W,B], g as [H,W,B,Co]), valid-k padding

    both bf16-operand / f32-accumulate like the forward."""
    return _conv_im2col_raw(x, kernel, k)


def _conv_im2col_fwd(x, kernel, k):
    return _conv_im2col_raw(x, kernel, k), (x, kernel)


def _conv_im2col_bwd(k, res, g):
    x, kernel = res
    from ..ops.conv_grads import conv_same_grads

    return conv_same_grads(x, kernel, g, k)


_conv_im2col.defvjp(_conv_im2col_fwd, _conv_im2col_bwd)


def conv2d_fn(x, kernel, stride=1, bias=None):
    """Functional NHWC conv with torch-style symmetric padding, honoring
    the global impl/dtype policies. ``kernel`` is [kh, kw, Cin, Cout].

    Exposed so cells can fuse several same-input convs into one call by
    concatenating kernels along the output-channel axis (e.g. the ConvGRU
    update+reset gates) while keeping their parameter trees unchanged."""
    k = kernel.shape[0]
    pad = k // 2
    if _CONV_QUANT == "int8":
        y = _conv2d_int8(x, kernel, stride, pad).astype(x.dtype)
        y = checkpoint_name(y, "conv_out")
        return y + bias.astype(y.dtype) if bias is not None else y
    xa, ka = _conv_operands(x, kernel)
    impl = _conv_impl_for(x.shape, k, stride)
    if impl == "pallas":
        from ..ops.conv_pallas import conv2d_pallas

        y = conv2d_pallas(xa, ka).astype(x.dtype)
    elif impl == "im2col":
        conv = _conv_im2col if _CONV_BWD == "native" else _conv_im2col_raw
        y = conv(xa, ka, k).astype(x.dtype)
    else:
        y = jax.lax.conv_general_dilated(
            xa,
            ka,
            window_strides=(stride, stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(x.dtype)
    # named for the EVFLOW_REMAT=convs policy (train/step.py): save
    # the (cheap, compute-dtype) conv outputs across the scan remat,
    # recompute only the elementwise neuron dynamics in the backward
    y = checkpoint_name(y, "conv_out")
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """U(+-sqrt(1/fan_in)) with fan_in = Cin*k*k (torch Conv2d default)."""
    kh, kw, cin, _ = shape
    bound = math.sqrt(1.0 / (cin * kh * kw))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _uniform_fan_in_channels_init(key, shape, dtype=jnp.float32):
    """U(+-sqrt(1/Cin)) — SNN conv init (spiking_submodules.py:74-75)."""
    cin = shape[2]
    bound = math.sqrt(1.0 / cin)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_bias_init(cin_kk):
    bound = 1.0 / math.sqrt(cin_kk)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv2d(nn.Module):
    """NHWC conv with torch-style symmetric padding.

    init: one of 'torch_default' | 'snn' | 'orthogonal', or a float w_scale
    (uniform +-w_scale, zero bias).
    """

    features: int
    kernel_size: int
    stride: int = 1
    use_bias: bool = True
    init: object = "torch_default"
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        cin = x.shape[-1]
        shape = (k, k, cin, self.features)

        if isinstance(self.init, (int, float)):
            w_scale = float(self.init)
            kernel_init = (
                lambda key, s, dtype=jnp.float32: jax.random.uniform(
                    key, s, dtype, -w_scale, w_scale
                )
            )
            bias_init = nn.initializers.zeros
        elif self.init == "snn":
            kernel_init = _uniform_fan_in_channels_init
            bias_init = nn.initializers.zeros
        elif self.init == "orthogonal":
            kernel_init = nn.initializers.orthogonal(column_axis=-1)
            bias_init = nn.initializers.zeros
        else:
            kernel_init = torch_conv_kernel_init
            bias_init = _torch_bias_init(cin * k * k)

        kernel = self.param("kernel", kernel_init, shape)
        if self.weight_norm:
            # torch nn.utils.weight_norm(conv) parity
            # (spiking_submodules.py:87-88): w = g * v/||v|| with a
            # per-output-channel norm over (kh, kw, Cin); g initialized to
            # ||v_init|| so the initial weights are unchanged. The init
            # closure captures the kernel param created just above — flax
            # creates params in order during init, so the value is live.
            def g_init(key, s, dtype=jnp.float32):
                return jnp.sqrt(
                    (kernel.astype(jnp.float32) ** 2).sum(axis=(0, 1, 2))
                ).astype(dtype)

            g = self.param("g", g_init, (self.features,))
            norm = jnp.sqrt((kernel**2).sum(axis=(0, 1, 2), keepdims=True))
            kernel = kernel / norm * g
        if self.use_bias:
            bias = self.param("bias", bias_init, (self.features,))
        else:
            bias = None
        return conv2d_fn(x, kernel, stride=self.stride, bias=bias)


class ConvTranspose2dX2(nn.Module):
    """x2 spatial upsampling transposed conv, matching torch
    ``ConvTranspose2d(k, stride=2, padding=k//2, output_padding=1)``
    output shape (2H, 2W) (reference: submodules.py:104-112).

    Implemented as an input-dilated convolution (lhs_dilation=2), the
    TPU/XLA-native formulation.
    """

    features: int
    kernel_size: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        p = k // 2
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", torch_conv_kernel_init, (k, k, cin, self.features)
        )
        lo = k - 1 - p
        hi = k - 1 - p + 1  # +1 == output_padding
        xa, ka = _conv_operands(x, kernel)
        y = jax.lax.conv_general_dilated(
            xa,
            ka,
            window_strides=(1, 1),
            padding=((lo, hi), (lo, hi)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(x.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", _torch_bias_init(cin * k * k), (self.features,)
            )
            y = y + bias.astype(y.dtype)
        return y


def out_hw(h, w, stride):
    """Output spatial dims of a stride-s conv with torch k//2 padding
    (= ceil(h/s) for odd kernels)."""
    return (h + stride - 1) // stride, (w + stride - 1) // stride
