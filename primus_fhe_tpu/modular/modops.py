"""Functional modular-arithmetic namespace.

One function per operation per width, replacing the reference's value-side /
modulus-side trait mirror (``primus_reduce`` + ``primus_modulo`` — SURVEY.md
section 2 rows 4-5).  Lazy-range contracts carry over verbatim:

- ``lazy_*``     results in ``[0, 2q)``
- canonical ops  results in ``[0, q)``
- ``reduce_once(x) = min(x, x - q)`` assumes ``x < 2q`` (Harvey min-trick)

The 32-bit path works on uint32 arrays with ``q < 2^31``; the 64-bit path on
:class:`~primus_fhe_tpu.numeric.limb.U64` pairs with ``q < 2^62``.  All
functions broadcast: a scalar modulus record serves a polynomial, a
``(n_mod, 1)``-shaped record serves a CRT polynomial.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..numeric.limb import (
    U64,
    mul_wide_u32,
    mulhi_u32,
    u64_add,
    u64_ge,
    u64_lt,
    u64_min,
    u64_mul_hi,
    u64_mul_lo,
    u64_mul_wide,
    u64_select,
    u64_sub,
)
from .modulus import BarrettModulus32, BarrettModulus64

_U32 = jnp.uint32

# ===========================================================================
# uint32 path  (q < 2^31)
# ===========================================================================


def reduce_once32(x, q):
    """``x mod q`` for ``x < 2q`` (min-trick: wrapping sub then unsigned min)."""
    return jnp.minimum(x, x - q)


def reduce_twice32(x, q):
    """``x mod q`` for ``x < 4q``."""
    return reduce_once32(reduce_once32(x, q * 2), q)


def add32(a, b, q):
    """``(a + b) mod q`` for canonical inputs; no overflow since q < 2^31."""
    return reduce_once32(a + b, q)


def lazy_add32(a, b, two_q):
    """``(a + b) mod 2q`` for inputs in ``[0, 2q)``."""
    return reduce_once32(a + b, two_q)


def sub32(a, b, q):
    """``(a - b) mod q`` for canonical inputs."""
    d = a - b
    return jnp.where(a < b, d + q, d)


def neg32(a, q):
    """``-a mod q`` (0 maps to 0)."""
    return jnp.where(a == 0, a, q - a)


def double32(a, q):
    return reduce_once32(a + a, q)


def barrett_lazy_reduce32(v, m: BarrettModulus32):
    """Barrett lazy reduce of one uint32 word to ``[0, 2q)``.

    Mirrors ``LazyReduce<T> for BarrettModulus`` (barrett/ops.rs:13-33).
    """
    tmp = mulhi_u32(v, m.ratio_lo)
    lo, hi = mul_wide_u32(v, m.ratio_hi)
    s = lo + tmp
    q_hat = hi + (s < lo).astype(_U32)
    return v - q_hat * m.value


def barrett_lazy_reduce_wide32(lo, hi, m: BarrettModulus32):
    """Barrett lazy reduce of ``hi*2^32 + lo`` to ``[0, 2q)``.

    Mirrors ``lazy_reduce_wide`` (barrett/mod.rs:99-132): estimates
    ``q_hat = floor(value * ratio / 2^64)`` with the four-product diagram,
    then one wrapping low-word subtraction.
    """
    ah = mulhi_u32(lo, m.ratio_lo)
    b_lo, b_hi = mul_wide_u32(lo, m.ratio_hi)
    b_lo2 = b_lo + ah
    b_hi = b_hi + (b_lo2 < b_lo).astype(_U32)
    c_lo, c_hi = mul_wide_u32(hi, m.ratio_lo)
    d = hi * m.ratio_hi
    s = b_lo2 + c_lo
    carry = (s < b_lo2).astype(_U32)
    q_hat = d + b_hi + c_hi + carry
    return lo - q_hat * m.value


def mul32(a, b, m: BarrettModulus32):
    """``a * b mod q`` canonical."""
    lo, hi = mul_wide_u32(a, b)
    return reduce_once32(barrett_lazy_reduce_wide32(lo, hi, m), m.value)


def lazy_mul32(a, b, m: BarrettModulus32):
    """``a * b mod q`` in ``[0, 2q)``."""
    lo, hi = mul_wide_u32(a, b)
    return barrett_lazy_reduce_wide32(lo, hi, m)


def sqr32(a, m: BarrettModulus32):
    return mul32(a, a, m)


def mul_add32(a, b, c, m: BarrettModulus32):
    """``a * b + c mod q`` with exact wide accumulate then Barrett reduce."""
    lo, hi = mul_wide_u32(a, b)
    lo2 = lo + jnp.asarray(c, dtype=_U32)
    hi = hi + (lo2 < lo).astype(_U32)
    return reduce_once32(barrett_lazy_reduce_wide32(lo2, hi, m), m.value)


def dot32(a, b, m: BarrettModulus32, axis: int = -1):
    """Modular dot product ``sum_i a_i b_i mod q``.

    Each product is lazily reduced to ``[0, 2q) ⊂ [0, 2^32)``, the terms are
    summed exactly into a (lo, hi) u32 limb pair via 16-bit half sums, and a
    single wide Barrett reduce finishes — the vector analogue of
    ``reduce_dot_product``.  Safe for up to 2^16 terms.  ``m`` broadcasts
    against the *output* shape (inputs minus the contracted axis).
    """
    import jax

    if axis != -1:
        raise NotImplementedError("dot32 contracts the trailing axis")
    m_l = jax.tree.map(lambda x: x[..., None] if jnp.ndim(x) else x, m)
    t = lazy_mul32(a, b, m_l)
    n = t.shape[axis] if t.ndim else 1
    if n > (1 << 16):
        raise NotImplementedError("dot32 supports up to 65536 terms")
    s_lo16 = jnp.sum(t & 0xFFFF, axis=axis, dtype=jnp.uint32)
    s_hi16 = jnp.sum(t >> 16, axis=axis, dtype=jnp.uint32)
    lo_part = s_lo16 + (s_hi16 << 16)
    carry = (lo_part < s_lo16).astype(_U32)
    hi_part = (s_hi16 >> 16) + carry
    return reduce_once32(barrett_lazy_reduce_wide32(lo_part, hi_part, m), m.value)


def sum_mod32(t, m: BarrettModulus32, axis=-1):
    """Exact modular sum of canonical terms over ``axis``.

    Terms must be in ``[0, q)``; the sum accumulates exactly via 16-bit half
    sums (up to 2^16 terms) into a 64-bit limb pair, then one wide Barrett
    reduce.  ``m`` broadcasts against the output shape.
    """
    axes = (axis,) if isinstance(axis, int) else tuple(axis)
    s_lo16 = jnp.sum(t & 0xFFFF, axis=axes, dtype=jnp.uint32)
    s_hi16 = jnp.sum(t >> 16, axis=axes, dtype=jnp.uint32)
    lo = s_lo16 + (s_hi16 << 16)
    carry = (lo < s_lo16).astype(_U32)
    hi = (s_hi16 >> 16) + carry
    return reduce_once32(barrett_lazy_reduce_wide32(lo, hi, m), m.value)


# ===========================================================================
# U64 path  (q < 2^62)
# ===========================================================================


def reduce_once64(x: U64, q: U64) -> U64:
    return u64_min(x, u64_sub(x, q))


def reduce_twice64(x: U64, q: U64, two_q: U64) -> U64:
    return reduce_once64(reduce_once64(x, two_q), q)


def add64(a: U64, b: U64, q: U64) -> U64:
    return reduce_once64(u64_add(a, b), q)


def sub64(a: U64, b: U64, q: U64) -> U64:
    d = u64_sub(a, b)
    return u64_select(u64_lt(a, b), u64_add(d, q), d)


def neg64(a: U64, q: U64) -> U64:
    zero = u64_sub(a, a)
    is_zero = (a.lo == 0) & (a.hi == 0)
    return u64_select(is_zero, zero, u64_sub(q, a))


def double64(a: U64, q: U64) -> U64:
    return reduce_once64(u64_add(a, a), q)


def barrett_lazy_reduce_wide64(lo: U64, hi: U64, m: BarrettModulus64) -> U64:
    """Barrett lazy reduce of a 128-bit value to ``[0, 2q)`` (U64 limbs)."""
    ah = u64_mul_hi(lo, m.ratio0)
    b_lo, b_hi = u64_mul_wide(lo, m.ratio1)
    b_lo2 = u64_add(b_lo, ah)
    b_hi = u64_add(
        b_hi,
        U64(u64_lt(b_lo2, b_lo).astype(_U32), jnp.zeros_like(b_lo.lo)),
    )
    c_lo, c_hi = u64_mul_wide(hi, m.ratio0)
    d = u64_mul_lo(hi, m.ratio1)
    s = u64_add(b_lo2, c_lo)
    carry = U64(u64_lt(s, b_lo2).astype(_U32), jnp.zeros_like(s.lo))
    q_hat = u64_add(u64_add(d, u64_add(b_hi, c_hi)), carry)
    return u64_sub(lo, u64_mul_lo(q_hat, m.value))


def mul64(a: U64, b: U64, m: BarrettModulus64) -> U64:
    lo, hi = u64_mul_wide(a, b)
    return reduce_once64(barrett_lazy_reduce_wide64(lo, hi, m), m.value)


def lazy_mul64(a: U64, b: U64, m: BarrettModulus64) -> U64:
    lo, hi = u64_mul_wide(a, b)
    return barrett_lazy_reduce_wide64(lo, hi, m)


def sqr64(a: U64, m: BarrettModulus64) -> U64:
    return mul64(a, a, m)


def mul_add64(a: U64, b: U64, c: U64, m: BarrettModulus64) -> U64:
    lo, hi = u64_mul_wide(a, b)
    lo2 = u64_add(lo, c)
    hi = u64_add(hi, U64(u64_lt(lo2, lo).astype(_U32), jnp.zeros_like(lo.lo)))
    return reduce_once64(barrett_lazy_reduce_wide64(lo2, hi, m), m.value)


def dot64(a: U64, b: U64, m: BarrettModulus64, axis: int = -1) -> U64:
    """Modular dot product over U64 pairs.

    Products lazily reduce to ``[0, 2q) ⊂ [0, 2^63)``; partial sums
    accumulate exactly into a 128-bit (lo64, hi64) pair via 32-bit half
    sums, then one wide Barrett reduce.  Safe for up to 2^16 terms.
    ``m`` broadcasts against the output shape.
    """
    import jax

    if axis != -1:
        raise NotImplementedError("dot64 contracts the trailing axis")
    m_l = jax.tree.map(lambda x: x[..., None] if jnp.ndim(x) else x, m)
    t = lazy_mul64(a, b, m_l)
    # Exact multi-word sum: sum each 32-bit limb in uint64-equivalent halves.
    # Use 16-bit splits so uint32 partial sums cannot overflow for n <= 2^16.
    n = t.lo.shape[axis] if t.lo.ndim else 1
    if n > (1 << 16):
        raise NotImplementedError("dot64 supports up to 65536 terms")

    def _split_sum(x):
        lo16 = jnp.sum(x & 0xFFFF, axis=axis, dtype=jnp.uint32)
        hi16 = jnp.sum(x >> 16, axis=axis, dtype=jnp.uint32)
        lo = lo16 + (hi16 << 16)
        carry = (lo < lo16).astype(_U32) + (hi16 >> 16)
        return lo, carry

    s0, c0 = _split_sum(t.lo)  # weight 2^0 (c0 at 2^32)
    s1, c1 = _split_sum(t.hi)  # weight 2^32 (c1 at 2^64)
    w1 = s1 + c0
    carry1 = (w1 < s1).astype(_U32)
    lo = U64(s0, w1)
    hi = U64(c1 + carry1, jnp.zeros_like(s0))
    return reduce_once64(barrett_lazy_reduce_wide64(lo, hi, m), m.value)


# ===========================================================================
# exponentiation / inversion / division
# (ReduceExp / ReduceExpPowOf2 / ReduceInv / ReduceDiv —
#  crates/primus_reduce/src/ops.rs:210-343; FieldContext common.rs:97-151)
# ===========================================================================


def exp32(a, e, m: BarrettModulus32):
    """``a^e mod q`` canonical.

    A static (Python int) exponent unrolls the square-and-multiply ladder at
    trace time (the common case: Fermat inverses, root powers); a traced
    uint32 exponent runs the fixed 32-step ladder with selects.
    """
    if isinstance(e, int) or hasattr(e, "__index__") and not hasattr(e, "shape"):
        e = int(e)
        assert e >= 0
        result = None
        acc = a
        while e:
            if e & 1:
                result = acc if result is None else mul32(result, acc, m)
            e >>= 1
            if e:
                acc = sqr32(acc, m)
        if result is None:
            return jnp.broadcast_to(jnp.uint32(1), jnp.shape(a)).astype(_U32)
        return result
    e = jnp.asarray(e, _U32)
    shape = jnp.broadcast_shapes(jnp.shape(a), jnp.shape(e))
    result = jnp.broadcast_to(jnp.uint32(1), shape).astype(_U32)
    acc = jnp.broadcast_to(a, shape)
    for i in range(32):
        bit = (e >> i) & 1
        result = jnp.where(bit == 1, mul32(result, acc, m), result)
        acc = sqr32(acc, m)
    return result


def exp_pow_of_2_32(a, log_e: int, m: BarrettModulus32):
    """``a^(2^log_e) mod q`` — ``log_e`` repeated squarings (static)."""
    for _ in range(log_e):
        a = sqr32(a, m)
    return a


def inv32(a, m: BarrettModulus32, q: int):
    """Fermat inverse ``a^(q-2) mod q`` — requires **prime** q (the
    FieldContext contract).  ``inv32(0) = 0`` (the reference errors; the
    vectorized kernel leaves zero fixed — callers check when it matters)."""
    return exp32(a, q - 2, m)


def div32(a, b, m: BarrettModulus32, q: int):
    """``a / b mod q`` for prime q (``ReduceDiv``)."""
    return mul32(a, inv32(b, m, q), m)


def exp64(a: U64, e, m: BarrettModulus64) -> U64:
    """``a^e mod q`` over U64 pairs; static int ``e`` only (plan-time powers,
    Fermat inverses — exponent is always a known modulus-derived constant)."""
    e = int(e)
    assert e >= 0
    result = None
    acc = a
    while e:
        if e & 1:
            result = acc if result is None else mul64(result, acc, m)
        e >>= 1
        if e:
            acc = sqr64(acc, m)
    if result is None:
        one = jnp.broadcast_to(jnp.uint32(1), jnp.shape(a.lo)).astype(_U32)
        return U64(one, jnp.zeros_like(one))
    return result


def exp_pow_of_2_64(a: U64, log_e: int, m: BarrettModulus64) -> U64:
    for _ in range(log_e):
        a = sqr64(a, m)
    return a


def inv64(a: U64, m: BarrettModulus64, q: int) -> U64:
    """Fermat inverse over U64 pairs — prime q (``inv64(0) = 0``)."""
    return exp64(a, q - 2, m)


def div64(a: U64, b: U64, m: BarrettModulus64, q: int) -> U64:
    return mul64(a, inv64(b, m, q), m)


# ===========================================================================
# UintModulus fallback multiply — arbitrary q, no Barrett ratio
# (``crates/primus_modulus/src/uint/mod.rs:11-43`` + common/uint kernels:
#  the any-modulus compare-subtract tier; callers preferring speed use
#  BarrettModulus. Exact for ANY q, prime or not, even or odd.)
# ===========================================================================


def uint_mul32(a, b, q):
    """``a * b mod q`` for arbitrary ``q < 2^31`` via shift-subtract.

    64 unrolled conditional-subtract steps over the wide product — the slow
    generic tier (the reference's ``UintModulus`` mul); ``q`` may be an
    array (broadcasts).
    """
    lo, hi = mul_wide_u32(a, b)
    q = jnp.asarray(q, _U32)
    r = jnp.zeros_like(lo)
    for i in range(63, -1, -1):
        bit = ((hi >> (i - 32)) if i >= 32 else (lo >> i)) & _U32(1)
        r = (r << 1) | bit
        r = jnp.where(r >= q, r - q, r)
    return r


def uint_mul64(a: U64, b: U64, q: U64) -> U64:
    """``a * b mod q`` for arbitrary ``q < 2^63`` via shift-subtract
    (128 unrolled steps over the 128-bit product)."""
    lo, hi = u64_mul_wide(a, b)
    r = u64_zeros_like(lo)
    for i in range(127, -1, -1):
        word = hi if i >= 64 else lo
        j = i % 64
        bit = (word.lo >> j if j < 32 else word.hi >> (j - 32)) & _U32(1)
        r = U64((r.lo << 1) | bit, (r.hi << 1) | (r.lo >> 31))
        r = u64_select(u64_ge(r, q), u64_sub(r, q), r)
    return r


def u64_zeros_like(x: U64) -> U64:
    return U64(jnp.zeros_like(x.lo), jnp.zeros_like(x.hi))
