"""Direct tests of the packed-floor compose collective (_psum_bigint).

The production meshes exercise group size D=2 only; these pin the
narrow-limb reduce-scatter path at D in {2, 4, 8} (W = 31/30/29), odd Q
widths, the gather-leg packing (ceil(q_bits/32) words + zero pad), and
the fallbacks — all against exact Python big-int arithmetic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from primus_fhe_tpu.numeric.bigint import big_from_int
from primus_fhe_tpu.parallel.mesh import make_mesh
from primus_fhe_tpu.parallel.overlap import _psum_bigint

pytestmark = [
    pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices"),
]


def _limbs_to_int(v):
    return sum(int(x) << (32 * i) for i, x in enumerate(v))


def _run(d, q_bits, n_limbs, n_coeff=16, q_bits_arg="exact"):
    """Sum d random canonical values per coefficient, mod a q_bits-wide Q."""
    rng = np.random.default_rng(q_bits * 7 + d)
    Q = (1 << q_bits) - int(rng.integers(1, 1 << min(q_bits // 2, 62)))
    vals = [
        [int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62)) % Q
         for _ in range(n_coeff)]
        for _ in range(d)
    ]
    part = np.zeros((d, n_coeff, n_limbs), dtype=np.uint32)
    for dev in range(d):
        for c in range(n_coeff):
            part[dev, c] = np.asarray(big_from_int(vals[dev][c], n_limbs))
    log_d = max(0, d.bit_length() - 1)
    q_mult = [
        jnp.asarray(big_from_int((1 << j) * Q, n_limbs))
        for j in range(log_d - 1, -1, -1)
    ] or [jnp.asarray(big_from_int(Q, n_limbs))]
    qb = Q.bit_length() if q_bits_arg == "exact" else q_bits_arg

    mesh = make_mesh(d, residue=d)
    fn = jax.jit(
        jax.shard_map(
            lambda x: _psum_bigint(x[0], "residue", n_limbs, q_mult, qb),
            mesh=mesh,
            in_specs=P("residue"),
            out_specs=P(),
            check_vma=False,
        )
    )
    got = np.asarray(fn(jnp.asarray(part)))
    want = [sum(vals[dev][c] for dev in range(d)) % Q for c in range(n_coeff)]
    for c in range(n_coeff):
        assert _limbs_to_int(got[c]) == want[c], (d, q_bits, c)
    return got


@pytest.mark.parametrize("d,q_bits,n_limbs", [
    (2, 101, 5),   # the production shape (W=31, 4 narrow words)
    (4, 101, 5),   # W=30
    (8, 101, 5),   # W=29
    (2, 96, 4),    # q_bits a multiple of 32
    (4, 127, 5),   # W=30, 5 narrow words
    (8, 60, 3),    # small Q, W=29
])
def test_narrow_limb_compose_exact(d, q_bits, n_limbs):
    _run(d, q_bits, n_limbs)


def test_gather_leg_zero_pad():
    """q_bits well under the limb budget: the gathered top words must be
    identically zero (the packed gather + pad path)."""
    got = _run(2, 70, 5)
    assert (got[:, 3:] == 0).all()


def test_fallback_no_q_bits_matches():
    """Without q_bits the halves path runs; results must agree."""
    a = _run(4, 101, 5, q_bits_arg="exact")
    b = _run(4, 101, 5, q_bits_arg=None)
    assert (a == b).all()


def test_fallback_carry_word_overflow():
    """n_w*W + 32 > 32*n_limbs forces the halves fallback — still exact
    (q_bits == 32*n_limbs exactly, no headroom for the carry word)."""
    _run(2, 160, 5, q_bits_arg=160)
