"""Round-4 probe: MXU CMux vs round-3 fused CMux on TPU (bench_boot cfg)."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scratch")

import jax
import jax.numpy as jnp

from ptime import timeit

from primus_fhe_tpu.boot.blind_rotate import (
    blind_rotate,
    make_bootstrap_key,
    make_bootstrap_key_mxu,
    modulus_switch,
)
from primus_fhe_tpu.decompose import ApproxSignedBasis32
from primus_fhe_tpu.distr.sampling import DiscreteGaussian
from primus_fhe_tpu.lattice import tfhe

LOG_N, K, LB, LV = 10, 1, 8, 2
N = 1 << LOG_N
N_LWE = int(sys.argv[1]) if len(sys.argv) > 1 else 512
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 64

basis = ApproxSignedBasis32(None, LB, reverse_length=LV)
conv = tfhe.make_convolver(LOG_N, LV, K, LB)
gauss = DiscreteGaussian(3.2)
print(f"primes={conv.primes} pallas={conv.use_pallas}", file=sys.stderr)

key = jax.random.PRNGKey(0)
k1, k2, k3, k4 = jax.random.split(key, 4)
lwe_s = (jax.random.bits(k1, (N_LWE,), dtype=jnp.uint32) & 1).astype(jnp.uint32)
glwe_s = (jax.random.bits(k2, (K, N), dtype=jnp.uint32) & 1).astype(jnp.uint32)

t0 = time.time()
bsk_ref = make_bootstrap_key(k3, lwe_s, glwe_s, basis, gauss, conv)
jax.block_until_ready(bsk_ref)
print(f"bsk_ref built {time.time()-t0:.1f}s", file=sys.stderr)
t0 = time.time()
bsk_mxu = make_bootstrap_key_mxu(k3, lwe_s, glwe_s, basis, gauss, conv)
jax.block_until_ready(bsk_mxu)
print(f"bsk_mxu built {time.time()-t0:.1f}s", file=sys.stderr)

test_poly = jnp.full(N, 1 << 28, dtype=jnp.uint32)
cts = jax.random.bits(k4, (BATCH, N_LWE + 1), dtype=jnp.uint32)
switched = modulus_switch(cts, LOG_N + 1)

run_ref = jax.jit(lambda s: blind_rotate(conv, basis, bsk_ref, s, test_poly))
run_mxu = jax.jit(lambda s: blind_rotate(conv, basis, bsk_mxu, s, test_poly))

t0 = time.time()
o_ref = jax.block_until_ready(run_ref(switched))
print(f"ref compile+run {time.time()-t0:.1f}s", file=sys.stderr)
t0 = time.time()
o_mxu = jax.block_until_ready(run_mxu(switched))
print(f"mxu compile+run {time.time()-t0:.1f}s", file=sys.stderr)

same = (np.asarray(o_ref) == np.asarray(o_mxu)).all()
print(f"bit-exact match on TPU: {same}", file=sys.stderr)


def reps_ref(r):
    out = None
    for _ in range(r):
        out = run_ref(switched)
    return jnp.sum(out, dtype=jnp.uint32)


def reps_mxu(r):
    out = None
    for _ in range(r):
        out = run_mxu(switched)
    return jnp.sum(out, dtype=jnp.uint32)


dt_ref = timeit(reps_ref, r1=1, r2=5, tries=3)
dt_mxu = timeit(reps_mxu, r1=1, r2=5, tries=3)
print(
    f"ref: {dt_ref*1e3:.1f} ms/rotation-batch ({BATCH/dt_ref:.0f} boots/s)\n"
    f"mxu: {dt_mxu*1e3:.1f} ms/rotation-batch ({BATCH/dt_mxu:.0f} boots/s)\n"
    f"speedup: {dt_ref/dt_mxu:.2f}x"
)
