"""Global reductions with reproducibility options.

TPU-native analogue of comm/{mpi,serial}/ice_global_reductions.F90 and
ice_reprosum.F90. On a fixed mesh, `jnp.sum` of a sharded array lowers to
per-device partials + `psum`, which XLA evaluates in a deterministic order —
so run-to-run reproducibility is automatic. What the reference's `bfbflag`
additionally buys is *decomposition-invariant* sums; we provide that via
pairwise/compensated and integer-fixed-point modes:

  bfbflag = 'off'      plain sum (fastest; deterministic on a fixed mesh)
            'lsum4'    float32 accumulation (reference's low-precision
                       local-sum variant, ice_global_reductions.F90:99-750)
            'lsum8'    float64 accumulation
            'lsum16'   quad-precision analogue: double-double (two-float64)
                       accumulation — the reference uses REAL*16 local sums;
                       TPU/XLA has no native float128, so the compensated
                       double-double carries the same ~32 significant digits
            'ddpdd'    compensated (Kahan/Knuth two-sum) summation
            'reprosum' integer fixed-point accumulation (exact, layout
                       invariant; reference ice_reprosum.F90:262)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def global_sum(field: jnp.ndarray, *, weight: jnp.ndarray | None = None,
               mask: jnp.ndarray | None = None, bfbflag: str = "off") -> jnp.ndarray:
    """Weighted masked sum over the global grid."""
    x = field
    if weight is not None:
        x = x * weight
    if mask is not None:
        x = jnp.where(mask, x, jnp.zeros_like(x))
    if bfbflag == "off":
        return jnp.sum(x)
    if bfbflag == "lsum4":
        return jnp.sum(x.astype(jnp.float32)).astype(field.dtype)
    if bfbflag == "lsum8":
        return jnp.sum(x.astype(jnp.float64)).astype(field.dtype)
    if bfbflag == "lsum16":
        return _double_double_sum(x).astype(field.dtype)
    if bfbflag == "ddpdd":
        return _compensated_sum(x).astype(field.dtype)
    if bfbflag == "reprosum":
        return _fixedpoint_sum(x).astype(field.dtype)
    raise ValueError(f"unknown bfbflag {bfbflag}")


def _compensated_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Kahan-Babuska compensated serial sum via lax.scan over flattened rows.

    Scans row partial-sums (each row reduced vectorized first with a pairwise
    tree, which is already far more accurate than naive accumulation), keeping
    a compensation term across rows.
    """
    rows = x.reshape(-1, x.shape[-1])
    row_sums = jnp.sum(rows, axis=-1)

    def body(carry, r):
        s, c = carry
        t = s + r
        c = c + jnp.where(jnp.abs(s) >= jnp.abs(r), (s - t) + r, (r - t) + s)
        return (t, c), None

    (s, c), _ = jax.lax.scan(body, (jnp.zeros((), x.dtype), jnp.zeros((), x.dtype)),
                             row_sums)
    return s + c


def _double_double_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Double-double (Dekker/Knuth two-sum) accumulation: ~106 bits of
    significand, the float128-free analogue of the reference's lsum16
    REAL*16 local sums (ice_global_reductions.F90). Scans row partials in
    f64 with an exact error term carried alongside."""
    xd = x.astype(jnp.float64)
    rows = xd.reshape(-1, xd.shape[-1])

    def body(carry, r):
        hi, lo = carry
        # row reduced by Kahan within the row first
        def inner(c, v):
            s, comp = c
            t = s + v
            comp = comp + jnp.where(jnp.abs(s) >= jnp.abs(v),
                                    (s - t) + v, (v - t) + s)
            return (t, comp), None
        (rs, rc), _ = jax.lax.scan(inner, (jnp.zeros(()), jnp.zeros(())), r)
        # two-sum of (hi) and row total
        t = hi + rs
        e = jnp.where(jnp.abs(hi) >= jnp.abs(rs), (hi - t) + rs,
                      (rs - t) + hi)
        return (t, lo + e + rc), None

    (hi, lo), _ = jax.lax.scan(body, (jnp.zeros(()), jnp.zeros(())), rows)
    return hi + lo


def _fixedpoint_sum(x: jnp.ndarray, frac_bits: int = 32) -> jnp.ndarray:
    """Exact layout-invariant sum: scale to int64 fixed point and sum.

    Follows the spirit of the Worley reprosum algorithm (ice_reprosum.F90:62):
    integers commute, so the result is bit-for-bit identical for any summation
    order / decomposition, provided the values fit the fixed-point window.
    The window is chosen from the max exponent of |x|.
    """
    absmax = jnp.max(jnp.abs(x))
    scale = jnp.where(absmax > 0, 2.0 ** (frac_bits - jnp.ceil(jnp.log2(absmax + 1e-300))), 1.0)
    xi = jnp.round(x.astype(jnp.float64) * scale).astype(jnp.int64) if x.dtype == jnp.float64 \
        else jnp.round(x.astype(jnp.float32) * scale.astype(jnp.float32)).astype(jnp.int64)
    total = jnp.sum(xi)
    return total.astype(jnp.float64) / scale if x.dtype == jnp.float64 \
        else (total.astype(jnp.float32) / scale.astype(jnp.float32))


def global_maxval(field, mask=None):
    x = field
    if mask is not None:
        x = jnp.where(mask, x, jnp.full_like(x, -jnp.inf))
    return jnp.max(x)


def global_minval(field, mask=None):
    x = field
    if mask is not None:
        x = jnp.where(mask, x, jnp.full_like(x, jnp.inf))
    return jnp.min(x)
