"""TPU smoke: MXU CMux bootstrap at log_n=11 (BOOLEAN_128 geometry),
tiny n_lwe so it's quick.  Run alone (one TPU process at a time)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from primus_fhe_tpu.boot import bootstrap
from primus_fhe_tpu.boot.blind_rotate import make_bootstrap_key_mxu
from primus_fhe_tpu.decompose import ApproxSignedBasis32
from primus_fhe_tpu.distr.sampling import DiscreteGaussian
from primus_fhe_tpu.lattice import tfhe
from primus_fhe_tpu.lattice.lwe import phase_torus32

assert jax.default_backend() == "tpu", jax.default_backend()

log_n, k, lb, lv, n_lwe, batch = 11, 1, 7, 3, 24, 4
n = 1 << log_n
basis = ApproxSignedBasis32(None, lb, reverse_length=lv)
conv = tfhe.make_convolver(log_n, lv, k, lb)
gauss = DiscreteGaussian(3.2)
key = jax.random.PRNGKey(0)
k1, k2, k3, k4 = jax.random.split(key, 4)
ls = (jax.random.bits(k1, (n_lwe,), dtype=jnp.uint32) & 1).astype(jnp.uint32)
gs = (jax.random.bits(k2, (k, n), dtype=jnp.uint32) & 1).astype(jnp.uint32)
t0 = time.time()
bsk = make_bootstrap_key_mxu(k3, ls, gs, basis, gauss, conv)
jax.block_until_ready(bsk)
print(f"bsk(mxu) built {time.time()-t0:.1f}s", file=sys.stderr)
test_poly = jnp.full(n, 1 << 28, dtype=jnp.uint32)
mus = jnp.asarray(
    np.where(np.arange(batch) % 2 == 0, 1 << 29, (1 << 32) - (1 << 29)).astype(
        np.uint32
    )
)
a = jax.random.bits(k4, (batch, n_lwe), dtype=jnp.uint32)
b = jnp.sum(a * ls[None], axis=1, dtype=jnp.uint32) + mus
cts = jnp.concatenate([a, b[:, None]], axis=1)
t0 = time.time()
out = jax.jit(lambda c: bootstrap(conv, basis, bsk, c, test_poly, log_n))(cts)
out = jax.block_until_ready(out)
print(f"boot compile+run {time.time()-t0:.1f}s", file=sys.stderr)
ph = np.asarray(phase_torus32(out, gs.reshape(-1))).astype(np.int64)
ph = np.where(ph >= 1 << 31, ph - (1 << 32), ph)
ok = ((ph > 0) == (np.arange(batch) % 2 == 0)).all() and (
    np.abs(np.abs(ph) - (1 << 28)) < 1 << 26
).all()
print("sign check:", bool(ok), ph[:4])
assert ok
