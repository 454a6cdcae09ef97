"""Cell compute-precision policy.

TPU elementwise throughput and HBM bandwidth both double in bfloat16, and
the recurrent scan's carry + remat saves dominate HBM traffic at the
training recipe (see train/step.py::_pack_state). This policy lets the
whole per-window cell compute — conv operands, neuron dynamics, scan
carries — run in bf16 while keeping:

  - parameters (and the Adam update) in float32,
  - conv/matmul ACCUMULATION in float32 (preferred_element_type in
    models/conv.py),
  - the contrast-max loss and its per-event gather/scatter in float32
    (flow maps are cast back at the model boundary, train/step.py).

This is the standard mixed-precision training recipe; the reference has no
analogue (torch f32 everywhere). Default is float32 for bit-level parity
with the reference; the bench opts in (measured 2.15x on the 7-cell
LIFFireNet scan fwd+bwd, TPU v5e). Deviation bounds are tested in
tests/test_conv_dtype.py.

Env: EVFLOW_CELL_DTYPE = float32 (default) | bfloat16.

A second, orthogonal lever selects the cell implementation
(EVFLOW_CELL_IMPL = xla | pallas | auto): 'pallas' routes qualifying LIF
cells (stride 1, odd k, no norm, detach) through the fused conv+LIF
Pallas kernel (ops/fused_lif_pallas.py) — the north-star fusion over the
reference's conv-then-neuron hot path (spiking_submodules.py:96-126).
'auto' routes ONLY the shapes where the fused kernel measured faster
than XLA on v5e (recurrent cells at c64 at any resolution, and at c>=128
when the image is <=32x32 — measured at c128/hw32, c256/hw16, c512/hw8;
tools/ab_fused_lif.py's docstring has the table,
models/policy.py::fused_auto_wins the gate) and only on the TPU backend
(never the CPU interpreter / other accelerators). The parameter tree is
identical either way, so checkpoints interchange.
"""

import os

import jax.numpy as jnp

__all__ = ["cell_compute_dtype", "set_cell_compute_dtype",
           "cell_impl", "set_cell_impl"]

_CELL_DTYPE = os.environ.get("EVFLOW_CELL_DTYPE", "float32")
_CELL_IMPL = os.environ.get("EVFLOW_CELL_IMPL", "xla")


def set_cell_compute_dtype(name):
    global _CELL_DTYPE
    assert name in ("float32", "bfloat16"), name
    _CELL_DTYPE = name


def cell_compute_dtype():
    return jnp.bfloat16 if _CELL_DTYPE == "bfloat16" else jnp.float32


def set_cell_impl(name):
    global _CELL_IMPL
    assert name in ("xla", "pallas", "auto"), name
    _CELL_IMPL = name


def cell_impl():
    return _CELL_IMPL


def fused_auto_wins(h, w, c, rec):
    """Shape gate for EVFLOW_CELL_IMPL=auto: True only where the fused
    conv+LIF kernel measured FASTER than the XLA cells on TPU v5e
    (tools/ab_fused_lif.py, b8 bf16, device-chained 20-step scan
    fwd+bwd). Measured wins: recurrent cells at c64 (128^2 and 64^2,
    -13%; other resolutions extrapolated — more rows only help the MXU),
    c256 (16^2, -18%), c128 (32^2, -4%) and c512 (8^2, -3.8%) — the last
    two are the in-model UNet deep-encoder shapes, measured 2026-08-18.
    Measured losses: every feedforward shape and c32 (the kernel's VMEM
    gate rejects c128 at 128^2, so >=c128 only qualifies at <=32^2).
    Heights not divisible by 8 are excluded too: the kernel's row tile
    degrades to 2/1 there (e.g. the ECD recipe's 90-row encoder stage),
    far from any measured configuration.
    """
    if not rec or h % 8:
        return False
    if c == 64:
        return True
    return c >= 128 and max(h, w) <= 32
