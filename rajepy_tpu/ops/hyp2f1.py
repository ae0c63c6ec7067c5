"""Gauss hypergeometric series for the jet travel-time integral.

The reference evaluates ``scipy.special.hyp2f1(q_vd, b, b+1, z)`` per grid
cell through ``np.vectorize`` (geometry.py:168-175) — its slowest pure-Python
kernel.  Here the required family is reduced analytically and evaluated as a
single fused, whole-grid JAX computation.

Reduction: the travel-time integrand needs the product
``(1 - z)^a * 2F1(a, b; b+1; z)`` with ``z <= 0``.  The Pfaff transformation
``2F1(a, b; c; z) = (1-z)^(-a) 2F1(a, c-b; c; z/(z-1))`` with ``c = b+1``
(so ``c - b = 1``) collapses that product to ``2F1(a, 1; b+1; u)`` with
``u = z/(z-1) in [0, 1)`` — a Gauss series with unit numerator parameter:

    2F1(a, 1; c; u) = sum_n [(a)_n / (c)_n] u^n

whose term ratio ``(a+n)/(c+n) * u -> u`` gives geometric convergence.  For
``u`` near 1 (cells almost on the jet axis) the series is re-expanded about
u = 1 with the DLMF 15.8.4 connection formula, which for b = 1 closes to

    2F1(a,1;c;u) = A * 2F1(a, 1; a+2-c; 1-u)
                 + B * (1-u)^(c-a-1) * u^(1-c)

    A = G(c)G(c-a-1) / (G(c-a)G(c-1)),   B = G(c)G(a+1-c) / G(a)

(the second 2F1 degenerates: 2F1(p, q; p; x) = (1-x)^(-q)).  ``a`` and ``c``
are *static* model power-law exponents, so A/B are computed at trace time on
the host.  Degenerate integer c-a-1 is handled by an epsilon nudge of ``a``.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

_CHUNK = 8        # series terms accumulated between convergence checks
_SWITCH = 0.8     # u above which the 1-u re-expansion is used


def _gauss_series_b1(a: float, c: float, u, max_terms: int, rtol: float):
    """sum_n (a)_n/(c)_n u^n elementwise for u in [0, _SWITCH].

    Runs a `lax.while_loop` accumulating ``_CHUNK`` terms per iteration and
    exits once every cell's current term is below ``rtol`` of its partial sum.
    A geometric tail estimate ``t_N * r/(1-r)`` is added on exit.
    """
    u = jnp.asarray(u)
    dtype = u.dtype
    # convergence threshold cannot be finer than the dtype resolution
    # (an f32 series would otherwise always run to max_terms)
    rtol = max(rtol, 4.0 * float(jnp.finfo(dtype).eps))

    def ratio(n):
        return (a + n) / (c + n) * u

    def cond(state):
        n, acc, term = state
        max_rel = jnp.max(jnp.abs(term) / jnp.maximum(jnp.abs(acc), 1.0))
        return (n < max_terms) & (max_rel > rtol)

    def body(state):
        n, acc, term = state
        for k in range(_CHUNK):
            term = term * ratio(n + k)
            acc = acc + term
        return n + _CHUNK, acc, term

    n, acc, term = lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), jnp.ones_like(u),
                     jnp.ones_like(u)))

    r = ratio(n.astype(dtype))
    tail = jnp.where(jnp.abs(r) < 1.0, term * r / (1.0 - r), 0.0)
    return acc + tail


def _gamma(x: float) -> float:
    """Host-side gamma with sign (math.gamma handles poles by raising)."""
    return math.gamma(x)


def hyp2f1_a1_series(a: float, c: float, u, *, max_terms: int = 8192,
                     rtol: float = 1e-15):
    """Evaluate ``2F1(a, 1; c; u)`` elementwise for ``0 <= u < 1``.

    ``a`` and ``c`` must be static Python floats (model power-law exponents);
    ``u`` is an array.  Uses the direct Gauss series for u <= 0.8 and the
    u -> 1-u connection formula above 0.8.
    """
    a = float(a)
    c = float(c)
    u = jnp.asarray(u)

    if a == 0.0:
        return jnp.ones_like(u)

    if a < 0.0 and a == round(a):
        # Terminating series (polynomial of degree -a): exact for all u
        return _gauss_series_b1(a, c, u, max_terms, rtol)

    # Nudge away from the degenerate case where c - a - 1 is an integer
    # (gamma poles in A/B; the log-case connection formula would be needed).
    s = c - a - 1.0
    if abs(s - round(s)) < 1e-5:
        a = a + 1e-9 if s >= round(s) else a - 1e-9
        s = c - a - 1.0

    # --- branch 1: direct series, u clamped into its fast-convergence zone
    u_lo = jnp.minimum(u, _SWITCH)
    f_series = _gauss_series_b1(a, c, u_lo, max_terms, rtol)

    # --- branch 2: re-expansion about u = 1 (v = 1 - u small)
    coef_a = (_gamma(c) * _gamma(s)) / (_gamma(c - a) * _gamma(c - 1.0))
    coef_b = (_gamma(c) * _gamma(-s)) / _gamma(a)
    v = jnp.where(u > _SWITCH, 1.0 - u, 1.0 - _SWITCH)
    u_hi = jnp.where(u > _SWITCH, u, 1.0)
    f_conn = (coef_a * _gauss_series_b1(a, a + 2.0 - c, v, max_terms, rtol)
              + coef_b * v ** s * u_hi ** (1.0 - c))

    return jnp.where(u > _SWITCH, f_conn, f_series)


def hyp2f1_pfaff_product(a: float, b: float, z, *, max_terms: int = 8192,
                         rtol: float = 1e-15):
    """``(1 - z)^a * 2F1(a, b; b+1; z)`` for ``z <= 0`` — the exact factor
    ``p3 * p4`` of the reference's travel-time integrand (geometry.py:165-171,
    where p3 = (1-z)^q_vd and p4 = hyp2f1(q_vd, b, b+1, z))."""
    z = jnp.asarray(z)
    u = z / (z - 1.0)
    return hyp2f1_a1_series(a, b + 1.0, u, max_terms=max_terms, rtol=rtol)
