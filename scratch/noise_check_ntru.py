"""Measured vs predicted NTRU gate output noise at NTRU_128 (TPU).

Runs batches of NAND gates at the shipped profile (ksk at lwe_sigma,
ks B=2 x L=12) and compares the empirical post-gate phase deviation
around +/-true_mu with the model sum used in params.py / the budget
test: sqrt(rotation^2 + keyswitch^2) ~ 12.8k.

Writes NOISE_CHECK_NTRU_r05.json.  Run alone."""

import json
import math
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from primus_fhe_tpu.boot import ntru_blind_rotate as nb
from primus_fhe_tpu.boot.ntru_gates import false_mu, ntru_nand, true_mu
from primus_fhe_tpu.distr.sampling import DiscreteGaussian, sample_uniform
from primus_fhe_tpu.params import NTRU_128, make_ntru_context

assert jax.default_backend() == "tpu", jax.default_backend()

p = NTRU_128
batch, rounds = 16, 4
ctx, ks_basis = make_ntru_context(p)
gauss = DiscreteGaussian(p.sigma)
key = jax.random.PRNGKey(33)
k1, k2, k3, k4, k5 = jax.random.split(key, 5)
sk = nb.ntru_keygen(k1, ctx)
s = (jax.random.bits(k2, (p.lwe_dim,), dtype=jnp.uint32) & 1).astype(jnp.uint32)
evk = nb.make_ntru_bootstrap_key_mxu(k3, ctx, sk, s, gauss)
ksk = nb.make_ntru_keyswitch_key(
    k4, ctx, sk, s, ks_basis, DiscreteGaussian(p.lwe_sigma)
)
jax.block_until_ready(ksk)
print("keys built", file=sys.stderr)

tv, fv = true_mu(ctx), false_mu(ctx)
sv = np.asarray(s).astype(np.int64)
enc_gauss = DiscreteGaussian(p.lwe_sigma)


def enc(k, mu):
    ka, ke = jax.random.split(k)
    a = sample_uniform(ka, (p.lwe_dim,), ctx.q_int)
    e = enc_gauss.sample_mod(ke, (), ctx.q_int)
    b = (int(np.asarray(a, dtype=np.int64) @ sv) + int(mu) + int(e)) % ctx.q_int
    return jnp.concatenate([a, jnp.asarray([b], dtype=jnp.uint32)])


run = jax.jit(lambda a, b: ntru_nand(ctx, evk, ksk, ks_basis, a, b))
devs = []
for r in range(rounds):
    kr = jax.random.fold_in(k5, r)
    keys = jax.random.split(kr, 2 * batch)
    xs = np.arange(batch) % 2
    ys = (np.arange(batch) // 2) % 2
    c1 = jnp.stack([enc(keys[i], tv if xs[i] else fv) for i in range(batch)])
    c2 = jnp.stack(
        [enc(keys[batch + i], tv if ys[i] else fv) for i in range(batch)]
    )
    outs = np.asarray(jax.block_until_ready(run(c1, c2))).astype(np.int64)
    for i in range(batch):
        ph = (int(outs[i, -1]) - int(outs[i, :-1] @ sv)) % ctx.q_int
        phc = ph - ctx.q_int if ph > ctx.q_int // 2 else ph
        want = 1 - (int(xs[i]) & int(ys[i]))
        assert (1 if phc > 0 else 0) == want, (r, i, phc)
        devs.append(abs(phc) - tv)
    print(f"round {r}: ok", file=sys.stderr)

devs = np.asarray(devs, dtype=np.float64)
measured = float(devs.std())
rot = (p.sigma * (1 << p.log_basis) / 2.0) ** 2 * p.n * p.level * p.lwe_dim
bks2 = float(1 << (2 * p.ks_log_basis))
ks_g = p.n * p.ks_level * (bks2 / 12.0) * p.lwe_sigma**2
drop = p.q.bit_length() - p.ks_log_basis * p.ks_level
eps = float(1 << drop) if drop > 0 else 0.0
# the drop error multiplies the t-scaled NTRU secret f = 1 + t*f'
ks_d = p.n * (eps * eps / 12.0) * (8.0 * 8.0 * 2.0 / 3.0)
pred = math.sqrt(rot + ks_g + ks_d)
rec = {
    "check": "NTRU NAND output noise, NTRU_128 (post-gate phase)",
    "samples": int(devs.size),
    "measured_std": measured,
    "measured_std_log2": math.log2(measured),
    "predicted_std": pred,
    "predicted_std_log2": math.log2(pred),
    "ratio": measured / pred,
    "decision_margin_sigma_measured": (ctx.q_int / 16.0) / measured,
    "device": jax.devices()[0].device_kind,
}
print(json.dumps(rec))
with open("/root/repo/NOISE_CHECK_NTRU_r05.json", "w") as f:
    json.dump(rec, f, indent=1)
