"""Container-aware byte round trips (reference ``impl_bytes_conversion!``,
crates/primus_lattice/src/macros/mod.rs:39-97 — e.g. Lwe::{from_bytes,
to_bytes}, src/lwe/single_message.rs:26-61).

Every container kind in lattice/__init__.py's layout table round-trips
through the self-describing PFT1 byte format in both element tiers, with
layout validation and loud type confusion."""

import numpy as np
import pytest

from primus_fhe_tpu.numeric import from_u64_pair, to_u64_pair
from primus_fhe_tpu.utils import serialize as ser

RNG = np.random.default_rng(7)


def _u32(shape):
    return RNG.integers(0, 1 << 32, size=shape, dtype=np.uint64).astype(np.uint32)


def _u64(shape, q=(1 << 50) - 27):
    return to_u64_pair(RNG.integers(0, q, size=shape, dtype=np.uint64))


# (kind, valid shape) — one per row of the container table
CASES = [
    ("lwe", (513,)),
    ("lwe", (4, 513)),  # batched
    ("multi_lwe", (512 + 8,)),
    ("rlwe", (2, 1024)),
    ("glwe", (3, 1024)),
    ("glev", (4, 2, 256)),
    ("rlev", (4, 2, 256)),
    ("ggsw", (2, 4, 2, 256)),
    ("rgsw", (2, 3, 2, 64)),
    ("ntru", (1024,)),
    ("poly", (2, 64)),
    ("bootstrap_key", (8, 2, 3, 2, 32)),
    ("keyswitch_key", (32, 3, 9)),
    ("secret_key", (630,)),
]


@pytest.mark.parametrize("kind,shape", CASES)
def test_roundtrip_u32(kind, shape):
    v = _u32(shape)
    data = ser.pack_container(kind, v, domain="coeff", moduli=())
    k2, out, meta = ser.unpack_container(data)
    assert k2 == kind
    assert out.dtype == np.uint32 and (out == v).all()
    assert meta == {"domain": "coeff", "moduli": ()}


@pytest.mark.parametrize("kind,shape", CASES)
def test_roundtrip_u64(kind, shape):
    moduli = (1125899906826241, 1125899906629633)
    v = _u64((len(moduli),) + shape)  # CRT: modulus-major leading axis
    data = ser.pack_container(kind, v, domain="ntt", moduli=moduli)
    k2, out, meta = ser.unpack_container(data)
    assert k2 == kind
    assert (from_u64_pair(out) == from_u64_pair(v)).all()
    assert meta["domain"] == "ntt" and meta["moduli"] == moduli


def test_typed_wrappers_and_confusion():
    glwe = _u32((3, 256))
    data = ser.glwe_to_bytes(glwe, moduli=(1 << 32))
    out, meta = ser.glwe_from_bytes(data)
    assert (out == glwe).all() and meta["moduli"] == ((1 << 32),)
    with pytest.raises(ValueError, match="expected a 'ggsw'"):
        ser.ggsw_from_bytes(data)
    with pytest.raises(ValueError, match="expected a 'lwe'"):
        ser.lwe_from_bytes(data)


def test_layout_validation():
    with pytest.raises(ValueError, match="not a valid ggsw"):
        # the two k+1 axes disagree
        ser.pack_container("ggsw", _u32((2, 4, 3, 256)))
    with pytest.raises(ValueError, match="not a valid rlwe"):
        ser.pack_container("rlwe", _u32((3, 256)))
    with pytest.raises(ValueError, match="not a valid glwe"):
        ser.pack_container("glwe", _u32((2, 100)))  # N not a power of two
    with pytest.raises(ValueError, match="unknown container kind"):
        ser.pack_container("nonsense", _u32((4,)))
    with pytest.raises(ValueError, match="unknown domain"):
        ser.pack_container("poly", _u32((4,)), domain="fourier")
    with pytest.raises(TypeError, match="uint32 or uint64"):
        ser.pack_container("poly", RNG.integers(0, 10, (4,)).astype(np.int32))


def test_garbage_rejected():
    with pytest.raises(ValueError, match="PFT1"):
        ser.unpack_container(b"\x00" * 64)


def test_real_keys_roundtrip():
    """Bootstrap + keyswitch keys from a real context round-trip."""
    import jax

    from primus_fhe_tpu.params import TOY, make_context

    ctx = make_context(jax.random.PRNGKey(3), TOY)
    bsk = np.asarray(ctx.bsk)
    ksk = np.asarray(ctx.ksk)
    b2, _ = ser.bootstrap_key_from_bytes(ser.bootstrap_key_to_bytes(bsk))
    k2, _ = ser.keyswitch_key_from_bytes(ser.keyswitch_key_to_bytes(ksk))
    assert (b2 == bsk).all()
    assert (k2 == ksk).all()


def test_u64_scalar_modulus_and_plain_u64_array():
    v = RNG.integers(0, 1 << 60, size=(2, 64), dtype=np.uint64)
    data = ser.pack_container("poly", v, moduli=(1 << 60) - 93)
    _, out, meta = ser.unpack_container(data, expect_kind="poly")
    assert (from_u64_pair(out) == v).all()
    assert meta["moduli"] == ((1 << 60) - 93,)
