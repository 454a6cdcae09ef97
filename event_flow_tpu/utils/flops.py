"""Analytic FLOP accounting by walking a jaxpr.

XLA's ``compiled.cost_analysis()`` counts a while/scan body ONCE, so any
program built around ``lax.scan`` (our whole training step) is undercounted
by the trip count. This walker traverses the jaxpr instead: it multiplies
scan-body costs by the static trip count, recurses into pjit / closed
calls / custom-vjp calls / remat, and counts the MXU ops that matter for
MFU — ``conv_general_dilated`` and ``dot_general`` — from their shapes
(2·M·N·K per matmul; 2·spatial_out·Cout·Cin·kh·kw·batch per conv).
Elementwise FLOPs are ignored (they are not the MFU numerator).

Use ``flops_of_fn(fn, *args)`` for a callable traced abstractly (no device
execution).
"""

import math

import jax

__all__ = ["jaxpr_flops", "flops_of_fn"]


def _dot_flops(eqn):
    a, b = eqn.invars[0].aval, eqn.invars[1].aval
    dims = eqn.params["dimension_numbers"]
    (lc, rc), (lb, rb) = dims
    m = math.prod(
        [d for i, d in enumerate(a.shape) if i not in set(lc) | set(lb)]
    )
    n = math.prod(
        [d for i, d in enumerate(b.shape) if i not in set(rc) | set(rb)]
    )
    k = math.prod([a.shape[i] for i in lc])
    batch = math.prod([a.shape[i] for i in lb])
    return 2.0 * batch * m * n * k


def _conv_flops(eqn):
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    out = eqn.outvars[0].aval
    dn = eqn.params["dimension_numbers"]
    fgc = eqn.params.get("feature_group_count", 1)
    bgc = eqn.params.get("batch_group_count", 1)
    batch = lhs.shape[dn.lhs_spec[0]]
    cin = lhs.shape[dn.lhs_spec[1]]
    cout = out.shape[dn.out_spec[1]]
    out_spatial = math.prod([out.shape[i] for i in dn.out_spec[2:]])
    k_spatial = math.prod([rhs.shape[i] for i in dn.rhs_spec[2:]])
    return 2.0 * batch * out_spatial * cout * (cin // fgc) * k_spatial / bgc


def jaxpr_flops(jaxpr):
    """MXU FLOPs of a (closed or open) jaxpr, scan bodies x trip count."""
    jaxpr = getattr(jaxpr, "jaxpr", jaxpr)
    total = 0.0
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "dot_general":
            total += _dot_flops(eqn)
        elif prim == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif prim == "scan":
            body = eqn.params["jaxpr"]
            total += eqn.params["length"] * jaxpr_flops(body)
        elif prim == "while":
            # trip count unknowable statically; count one body iteration
            total += jaxpr_flops(eqn.params["body_jaxpr"])
        elif prim == "pallas_call":
            # kernel jaxpr is per-block: its dot_generals run once per grid
            # point. This makes MFU exact under EVFLOW_CELL_IMPL=auto/pallas
            # (the fused conv+LIF kernels' MXU work was previously invisible
            # to the walker and under-reported bench FLOPs).
            gm = eqn.params.get("grid_mapping")
            grid = math.prod(getattr(gm, "grid", ()) or (1,))
            total += grid * jaxpr_flops(eqn.params["jaxpr"])
        elif prim == "cond":
            branches = eqn.params["branches"]
            total += max(jaxpr_flops(b) for b in branches)
        else:
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                sub = eqn.params.get(key)
                if sub is not None:
                    total += jaxpr_flops(sub)
                    break
    return total


def flops_of_fn(fn, *args, **kwargs):
    """Trace ``fn`` abstractly and return its MXU FLOP count."""
    return jaxpr_flops(jax.make_jaxpr(fn)(*args, **kwargs))
