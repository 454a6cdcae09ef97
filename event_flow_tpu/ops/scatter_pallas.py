"""Pallas TPU scatter-add kernel.

Random scatter is fundamentally scalar work on vector hardware; this kernel
keeps the whole accumulator image in VMEM and walks the event list with a
``fori_loop`` of dynamic-slice accumulations — one VMEM read-modify-write
per event row, with the C payload channels riding each row (the channelled
formulation already collapses what the reference issued as separate
``scatter_add_`` calls, utils/iwe.py:89-91).

Used for A/B benchmarking against XLA's native scatter (select with
``EVFLOW_SCATTER_IMPL=pallas``); the analytic gather backward lives in
ops/scatter.py and is backend-independent.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["scatter_add_pallas", "set_interpret"]

_INTERPRET = False


def set_interpret(flag):
    global _INTERPRET
    _INTERPRET = bool(flag)


def _kernel(idx_ref, vals_ref, out_ref, *, m, chunk):
    out_ref[:] = jnp.zeros_like(out_ref)

    def body(i, _):
        base = i * chunk
        for j in range(chunk):
            e = base + j
            cell = idx_ref[0, e]
            out_ref[0, cell, :] += vals_ref[0, e, :]
        return 0

    jax.lax.fori_loop(0, m // chunk, body, 0)


def scatter_add_pallas(idx, vals, size):
    """idx [B, M] int32 in [0, size); vals [B, M, C] -> [B, size, C]."""
    b, m = idx.shape
    c = vals.shape[-1]
    chunk = 1
    return pl.pallas_call(
        partial(_kernel, m=m, chunk=chunk),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, m), lambda bi: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, c), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, size, c), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, size, c), vals.dtype),
        interpret=_INTERPRET,
    )(idx, vals)
