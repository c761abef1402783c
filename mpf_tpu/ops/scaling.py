"""Row/column equilibration (LAPACK geequ family).

The reference has no scaling at all — its fp16 panel copy relies on the
generator's benign [0, 9.9] value range (`matrix_generator.cpp:66`,
`fp16_utils.h:15-23` saturates the rest).  For a general-purpose
mixed-precision library, badly row/column-scaled inputs destroy bf16
pivot selection long before they trouble fp32, so equilibration is the
standard preprocessing (HPL-AI practice).

Scales are rounded to powers of two: multiplying by an exact power of two
changes only the exponent, so the scaled matrix carries the SAME mantissas
— the scaling itself introduces zero rounding error, and unscaling the
solution is exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pow2_round(s):
    """Nearest power of two, constructed EXACTLY via the fp32 exponent
    field (XLA's exp2 is polynomial-approximated and lands ~1 ulp off even
    at integer arguments, which would break the bit-exactness guarantee).
    Exponents are clamped to the normal range [-126, 127]."""
    k = jnp.clip(jnp.round(jnp.log2(s.astype(jnp.float32))), -126, 127)
    return jax.lax.bitcast_convert_type(
        (k.astype(jnp.int32) + 127) << 23, jnp.float32
    )


@jax.jit
def geequ(a: jax.Array):
    """Row and column scale factors equilibrating ``a`` (LAPACK sgeequ
    semantics, inf-norm based): ``r[i] = 1/max_j |a[i,j]|`` then
    ``c[j] = 1/max_i |r[i] a[i,j]|``, both rounded to powers of two.

    Returns ``(r, c, rowcnd, colcnd, amax)`` where rowcnd/colcnd are the
    min/max ratios of the unrounded scales (LAPACK's "is scaling worth
    it" signals: close to 1 means already equilibrated) and ``amax`` is
    the largest absolute entry."""
    aa = jnp.abs(a.astype(jnp.float32))
    rmax = jnp.max(aa, axis=1)
    amax = jnp.max(rmax)
    safe_r = jnp.where(rmax > 0, rmax, 1.0)
    r = _pow2_round(1.0 / safe_r)
    cmax = jnp.max(aa * r[:, None], axis=0)
    safe_c = jnp.where(cmax > 0, cmax, 1.0)
    c = _pow2_round(1.0 / safe_c)
    rowcnd = jnp.min(safe_r) / jnp.max(safe_r)
    colcnd = jnp.min(safe_c) / jnp.max(safe_c)
    return r, c, rowcnd, colcnd, amax


@jax.jit
def equilibrate(a: jax.Array):
    """``(diag(r) @ a @ diag(c), r, c)`` with power-of-two scales."""
    r, c, _, _, _ = geequ(a)
    return (a.astype(jnp.float32) * r[:, None] * c[None, :]).astype(a.dtype), r, c
