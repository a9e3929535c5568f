"""Zero-copy byte round-trips for ciphertexts and parameter tables.

Reference: the ``impl_bytes_conversion!`` macro gives every container
``from_bytes``/``to_bytes`` via bytemuck casts
(``crates/primus_lattice/src/macros/mod.rs:39-97``).  Here the same role is
played by little-endian NumPy buffer views — every container is an array
(or a U64 pair), so serialization is a dtype-tagged byte cast.
"""

from __future__ import annotations

import numpy as np

from ..numeric.limb import U64, from_u64_pair, to_u64_pair


def u32_to_bytes(arr) -> bytes:
    """uint32 array -> little-endian bytes (shape-flattened)."""
    return np.ascontiguousarray(np.asarray(arr, dtype="<u4")).tobytes()


def u32_from_bytes(data: bytes, shape) -> np.ndarray:
    out = np.frombuffer(data, dtype="<u4").reshape(shape)
    return out.copy()


def u64_to_bytes(pair: U64) -> bytes:
    """U64 pair -> little-endian u64 bytes."""
    return np.ascontiguousarray(from_u64_pair(pair).astype("<u8")).tobytes()


def u64_from_bytes(data: bytes, shape) -> U64:
    arr = np.frombuffer(data, dtype="<u8").reshape(shape).copy()
    return to_u64_pair(arr)


# ---------------------------------------------------------------------------
# Container-aware serialization.
#
# The reference's ``impl_bytes_conversion!`` gives each container type a
# bytes round trip where the *type* carries the layout; containers here are
# layout conventions over arrays (lattice/__init__.py's table), so the
# byte stream itself is self-describing: a small header records the
# container kind, element tier (u32 / u64-pair), evaluation domain, shape,
# and the moduli it is defined over.  ``KINDS`` registers a rank/shape
# validator per kind so a GGSW cannot round-trip with a GLWE's layout.
# ---------------------------------------------------------------------------

import struct

_MAGIC = b"PFT1"
_TIER_U32, _TIER_U64 = 0, 1
_DOMAINS = ("coeff", "ntt")


def _is_pow2(v: int) -> bool:
    return v > 0 and (v & (v - 1)) == 0


def _v_lwe(s):  # (..., n+1)
    return len(s) >= 1 and s[-1] >= 2


def _v_poly(s):  # (..., N), N a power of two
    return len(s) >= 1 and _is_pow2(s[-1])


def _v_rlwe(s):  # (..., 2, N)
    return len(s) >= 2 and s[-2] == 2 and _is_pow2(s[-1])


def _v_glwe(s):  # (..., k+1, N)
    return len(s) >= 2 and s[-2] >= 2 and _is_pow2(s[-1])


def _v_glev(s):  # (..., L, k+1, N)
    return len(s) >= 3 and s[-2] >= 2 and _is_pow2(s[-1])


def _v_ggsw(s):  # (..., k+1, L, k+1, N) — the two k+1 axes must agree
    return (
        len(s) >= 4 and s[-4] == s[-2] and s[-2] >= 2 and _is_pow2(s[-1])
    )


def _v_bsk(s):  # (n_lwe, k+1, L, k+1, N) — a GGSW per LWE secret bit
    return len(s) >= 5 and _v_ggsw(s[-4:])


def _v_ksk(s):  # (n_in, L, n_out+1)
    return len(s) >= 3 and s[-1] >= 2


def _v_any(s):
    return True


KINDS = {
    "lwe": _v_lwe,           # src/lwe/single_message.rs:14
    "multi_lwe": _v_lwe,     # src/lwe/multiple_message.rs:14
    "rlwe": _v_rlwe,         # src/rlwe/coeff.rs:26
    "glwe": _v_glwe,         # src/glwe/*.rs
    "glev": _v_glev,         # src/glev/mod.rs
    "rlev": _v_glev,         # src/rlev/mod.rs (k = 1)
    "ggsw": _v_ggsw,         # src/ggsw/mod.rs
    "rgsw": _v_ggsw,         # src/rgsw/mod.rs (k = 1)
    "ntru": _v_poly,         # src/ntru/mod.rs
    "poly": _v_poly,         # bare ring element
    "bootstrap_key": _v_bsk,
    "keyswitch_key": _v_ksk,
    "secret_key": _v_any,
    "raw": _v_any,
}


def _validate(kind: str, shape, domain: str) -> None:
    if kind not in KINDS:
        raise ValueError(f"unknown container kind {kind!r}")
    if domain not in _DOMAINS:
        raise ValueError(f"unknown domain {domain!r}")
    if not KINDS[kind](tuple(int(d) for d in shape)):
        raise ValueError(f"shape {tuple(shape)} is not a valid {kind} layout")


def pack_container(kind: str, value, *, domain: str = "coeff", moduli=()) -> bytes:
    """Container (array or U64 pair) -> self-describing bytes.

    ``moduli`` records the modulus chain (CRT containers carry a leading
    modulus-major axis matching ``len(moduli)``); a single int is fine.
    """
    if isinstance(moduli, int):
        moduli = (moduli,)
    moduli = tuple(int(m) for m in moduli)
    if isinstance(value, U64):
        tier = _TIER_U64
        arr = from_u64_pair(value).astype("<u8")
    else:
        arr = np.asarray(value)
        if arr.dtype == np.uint64:
            tier = _TIER_U64
            arr = arr.astype("<u8")
        elif arr.dtype == np.uint32:
            tier = _TIER_U32
            arr = arr.astype("<u4")
        else:
            raise TypeError(
                f"container elements must be uint32 or uint64, got {arr.dtype}"
            )
    _validate(kind, arr.shape, domain)
    kb = kind.encode()
    head = struct.pack(
        "<4sBBBBB",
        _MAGIC,
        1,  # version
        tier,
        _DOMAINS.index(domain),
        len(kb),
        arr.ndim,
    )
    head += kb
    head += struct.pack(f"<{arr.ndim}Q", *arr.shape) if arr.ndim else b""
    head += struct.pack("<B", len(moduli))
    head += struct.pack(f"<{len(moduli)}Q", *moduli) if moduli else b""
    return head + np.ascontiguousarray(arr).tobytes()


def unpack_container(data: bytes, expect_kind: str | None = None):
    """Bytes -> ``(kind, value, meta)``; ``value`` is a U64 pair for the
    u64 tier, a uint32 ndarray otherwise; ``meta`` has domain + moduli.

    ``expect_kind`` makes type confusion a loud error (the typed
    ``from_bytes`` of the reference macro)."""
    magic, version, tier, dom, klen, ndim = struct.unpack_from("<4sBBBBB", data, 0)
    if magic != _MAGIC or version != 1:
        raise ValueError("not a PFT1 container byte stream")
    off = struct.calcsize("<4sBBBBB")
    kind = data[off : off + klen].decode()
    off += klen
    shape = struct.unpack_from(f"<{ndim}Q", data, off) if ndim else ()
    off += 8 * ndim
    (nmod,) = struct.unpack_from("<B", data, off)
    off += 1
    moduli = struct.unpack_from(f"<{nmod}Q", data, off) if nmod else ()
    off += 8 * nmod
    domain = _DOMAINS[dom]
    _validate(kind, shape, domain)
    if expect_kind is not None and kind != expect_kind:
        raise ValueError(f"expected a {expect_kind!r} stream, got {kind!r}")
    count = int(np.prod(shape)) if shape else 1
    if tier == _TIER_U64:
        arr = np.frombuffer(data, dtype="<u8", count=count, offset=off)
        value = to_u64_pair(arr.reshape(shape).copy())
    else:
        arr = np.frombuffer(data, dtype="<u4", count=count, offset=off)
        value = arr.reshape(shape).copy()
    meta = {"domain": domain, "moduli": tuple(int(m) for m in moduli)}
    return kind, value, meta


def _make_pair(kind: str):
    def to_bytes(value, *, domain="coeff", moduli=()):
        return pack_container(kind, value, domain=domain, moduli=moduli)

    def from_bytes(data: bytes):
        _, value, meta = unpack_container(data, expect_kind=kind)
        return value, meta

    to_bytes.__name__ = f"{kind}_to_bytes"
    from_bytes.__name__ = f"{kind}_from_bytes"
    to_bytes.__doc__ = f"Serialize a {kind} container (layout-validated)."
    from_bytes.__doc__ = (
        f"Deserialize a {kind} container; raises on any other kind."
    )
    return to_bytes, from_bytes


lwe_to_bytes, lwe_from_bytes = _make_pair("lwe")
rlwe_to_bytes, rlwe_from_bytes = _make_pair("rlwe")
glwe_to_bytes, glwe_from_bytes = _make_pair("glwe")
glev_to_bytes, glev_from_bytes = _make_pair("glev")
ggsw_to_bytes, ggsw_from_bytes = _make_pair("ggsw")
rgsw_to_bytes, rgsw_from_bytes = _make_pair("rgsw")
ntru_to_bytes, ntru_from_bytes = _make_pair("ntru")
bootstrap_key_to_bytes, bootstrap_key_from_bytes = _make_pair("bootstrap_key")
keyswitch_key_to_bytes, keyswitch_key_from_bytes = _make_pair("keyswitch_key")
