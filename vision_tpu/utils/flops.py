"""Analytic matmul/conv FLOP counting over a traced jaxpr.

``count_flops(fn, *args)`` traces ``fn`` (no compile, no execution) and
sums ``2 * output_elements * contraction_size`` over every ``dot_general``
and ``conv_general_dilated`` — the exact MAC-based count MFU convention
uses (elementwise/reduction ops are excluded, as usual). Control flow:
``scan`` multiplies its body by the trip count, ``while`` counts one body
iteration (unknown trip count — the bench workloads don't use it on the
hot path), ``cond`` takes the most expensive branch, and any other
higher-order primitive (pjit, remat, custom_vjp...) recurses through its
sub-jaxprs generically.

Why not XLA's ``compiled.cost_analysis()['flops']``: measured on the CPU
backend it undercounts convolutions badly (Real-ESRGAN @1024² reports
8.3 TFLOP against the exact 37.6 TFLOP conv count — scripts/exp_flops.py),
because it prices the post-rewrite HLO, not the arithmetic the model
defines. This counter prices the model's own einsum/conv graph, so MFU
numbers stay comparable across backends and XLA versions. Used by
``vision_tpu.benchmark`` for the per-row MFU scoreboard; regression
anchors pinned in tests/test_benchmark.py.
"""

from __future__ import annotations

import math

import jax

__all__ = ["count_flops"]


def _shape(var) -> tuple:
    return tuple(getattr(var.aval, "shape", ()))


def _eqn_flops(eqn) -> float:
    name = eqn.primitive.name
    if name == "dot_general":
        (lhs_c, _rhs_c), _batch = eqn.params["dimension_numbers"]
        lhs = _shape(eqn.invars[0])
        out = _shape(eqn.outvars[0])
        k = math.prod(lhs[d] for d in lhs_c)
        return 2.0 * math.prod(out) * k
    if name == "conv_general_dilated":
        dn = eqn.params["dimension_numbers"]
        kernel = _shape(eqn.invars[1])
        out = _shape(eqn.outvars[0])
        in_ch = kernel[dn.rhs_spec[1]]  # already per feature group
        k_spatial = math.prod(kernel[d] for d in dn.rhs_spec[2:])
        return 2.0 * math.prod(out) * in_ch * k_spatial
    if name == "scan":
        return eqn.params["length"] * _jaxpr_flops(eqn.params["jaxpr"].jaxpr)
    if name == "while":
        return _jaxpr_flops(eqn.params["body_jaxpr"].jaxpr)
    if name == "cond":
        return max(
            (_jaxpr_flops(b.jaxpr) for b in eqn.params["branches"]), default=0.0
        )
    # generic recursion: pjit / remat / custom_jvp / custom_vjp / closed_call
    # all carry their bodies as (tuples of) jaxprs in params
    total = 0.0
    for v in eqn.params.values():
        total += _param_flops(v)
    return total


def _param_flops(v) -> float:
    if hasattr(v, "jaxpr") and hasattr(v, "consts"):  # ClosedJaxpr
        return _jaxpr_flops(v.jaxpr)
    if hasattr(v, "eqns"):  # raw Jaxpr
        return _jaxpr_flops(v)
    if isinstance(v, (tuple, list)):
        return sum(_param_flops(u) for u in v)
    return 0.0


def _jaxpr_flops(jaxpr) -> float:
    return sum(_eqn_flops(e) for e in jaxpr.eqns)


def count_flops(fn, *args, **kwargs) -> float:
    """Total matmul+conv FLOPs of one call of ``fn(*args, **kwargs)``.

    ``args`` may be real arrays or ``jax.ShapeDtypeStruct`` specs — the
    function is traced, never executed.
    """
    jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    return _jaxpr_flops(jaxpr.jaxpr)
