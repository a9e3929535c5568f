"""Measured vs predicted bootstrap output noise at BOOLEAN_128 (TPU).

Builds the MXU bootstrap key at the profile's real glwe_sigma, runs
several batches of sign bootstraps, and compares the empirical phase
deviation around +/-2^28 with the ``noise.blind_rotate`` prediction
(the bench pipeline has no key switch, and the constant test polynomial
makes the modulus-switch index error phase-invariant away from the sign
boundary, so blind-rotate noise is the whole prediction).

Writes NOISE_CHECK_r05.json.  Run alone (one TPU process at a time).
"""

import json
import math
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from primus_fhe_tpu import noise
from primus_fhe_tpu.boot import bootstrap
from primus_fhe_tpu.boot.blind_rotate import make_bootstrap_key_mxu
from primus_fhe_tpu.decompose import ApproxSignedBasis32
from primus_fhe_tpu.distr.sampling import DiscreteGaussian
from primus_fhe_tpu.lattice import tfhe
from primus_fhe_tpu.lattice.lwe import phase_torus32
from primus_fhe_tpu.params import BOOLEAN_128 as BP

assert jax.default_backend() == "tpu", jax.default_backend()

n, batch, rounds = BP.n, 64, 4
basis = ApproxSignedBasis32(None, BP.log_basis, reverse_length=BP.level)
conv = tfhe.make_convolver(BP.log_n, BP.level, BP.glwe_dim, BP.log_basis)
gauss = DiscreteGaussian(BP.glwe_sigma)
key = jax.random.PRNGKey(7)
k1, k2, k3, k4 = jax.random.split(key, 4)
ls = (jax.random.bits(k1, (BP.lwe_dim,), dtype=jnp.uint32) & 1).astype(jnp.uint32)
gs = (
    jax.random.bits(k2, (BP.glwe_dim, n), dtype=jnp.uint32) & 1
).astype(jnp.uint32)
bsk = make_bootstrap_key_mxu(k3, ls, gs, basis, gauss, conv)
jax.block_until_ready(bsk)
print("bsk built", file=sys.stderr)

test_poly = jnp.full(n, 1 << 28, dtype=jnp.uint32)
run = jax.jit(lambda c: bootstrap(conv, basis, bsk, c, test_poly, BP.log_n))

errs = []
for r in range(rounds):
    kr = jax.random.fold_in(k4, r)
    ka, kb = jax.random.split(kr)
    mus = jnp.asarray(
        np.where(
            np.arange(batch) % 2 == 0, 1 << 29, (1 << 32) - (1 << 29)
        ).astype(np.uint32)
    )
    a = jax.random.bits(ka, (batch, BP.lwe_dim), dtype=jnp.uint32)
    # fresh encryption noise at the profile's lwe_sigma (the real input)
    e = DiscreteGaussian(BP.lwe_sigma).sample_torus32(kb, (batch,))
    b = jnp.sum(a * ls[None], axis=1, dtype=jnp.uint32) + mus + e
    cts = jnp.concatenate([a, b[:, None]], axis=1)
    out = jax.block_until_ready(run(cts))
    ph = np.asarray(phase_torus32(out, gs.reshape(-1))).astype(np.int64)
    ph = np.where(ph >= 1 << 31, ph - (1 << 32), ph)
    sign_ok = ((ph > 0) == (np.arange(batch) % 2 == 0)).all()
    assert sign_ok, f"sign flip in round {r}"
    errs.append(np.abs(ph) - (1 << 28))
    print(f"round {r}: ok", file=sys.stderr)

errs = np.concatenate(errs).astype(np.float64)
measured = float(errs.std())
pred = noise.blind_rotate(
    BP.lwe_dim, BP.glwe_sigma, n, BP.glwe_dim, BP.level,
    BP.log_basis, basis.drop_bits,
).stddev
rec = {
    "check": "bootstrap output noise, BOOLEAN_128 (no key switch)",
    "samples": int(errs.size),
    "measured_std": measured,
    "measured_std_log2": math.log2(measured),
    "predicted_std": pred,
    "predicted_std_log2": math.log2(pred),
    "ratio": measured / pred,
    "device": jax.devices()[0].device_kind,
}
print(json.dumps(rec))
with open("/root/repo/NOISE_CHECK_r05.json", "w") as f:
    json.dump(rec, f, indent=1)
