// primus_native: exact host-side FHE primitive kernels (C ABI).
//
// The native complement to the JAX framework: bit-exact u64 modular
// arithmetic, negacyclic NTT (identical conventions to the device path:
// minimal primitive 2n-th root, bit-reversed Shoup tables, Harvey lazy
// butterflies — see crates/primus_ntt in the reference for the semantics
// being matched), plan precomputation for large n, and golden-vector
// generation at native speed for the differential test suites.
//
// Everything is plain C ABI for ctypes loading; no external dependencies.
//
// Build: g++ -O2 -shared -fPIC -o libprimus_native.so primus_native.cpp

#include <cstdint>
#include <cstring>

typedef unsigned __int128 u128;
typedef uint64_t u64;
typedef uint32_t u32;

namespace {

inline u64 mulmod(u64 a, u64 b, u64 q) { return (u64)((u128)a * b % q); }

inline u64 powmod(u64 a, u64 e, u64 q) {
    u64 r = 1;
    a %= q;
    while (e) {
        if (e & 1) r = mulmod(r, a, q);
        a = mulmod(a, a, q);
        e >>= 1;
    }
    return r;
}

// Shoup preconditioner floor(w * 2^64 / q).
inline u64 shoup_quot(u64 w, u64 q) { return (u64)(((u128)w << 64) / q); }

// Shoup lazy multiply: y*w mod q in [0, 2q).
inline u64 shoup_mul_lazy(u64 y, u64 w, u64 wq, u64 q) {
    u64 h = (u64)(((u128)y * wq) >> 64);
    return w * y - q * h;
}

u64 reverse_lsbs(u64 v, unsigned bits) {
    u64 r = 0;
    for (unsigned i = 0; i < bits; ++i) r = (r << 1) | ((v >> i) & 1);
    return r;
}

}  // namespace

extern "C" {

// Deterministic minimal primitive 2^log_degree-th root of unity mod prime q
// (the unique minimum over the odd-power orbit — matches the reference's
// try_minimal_primitive_root).  Returns 0 when none exists.
u64 primus_minimal_primitive_root(unsigned log_degree, u64 q) {
    u64 degree = 1ull << log_degree;
    if ((q - 1) % degree != 0) return 0;
    u64 quotient = (q - 1) / degree;
    u64 g = 0;
    for (u64 r = 2; r < q; ++r) {
        u64 w = powmod(r, quotient, q);
        if (powmod(w, degree >> 1, q) == q - 1) {
            g = w;
            break;
        }
    }
    if (!g) return 0;
    u64 gsq = mulmod(g, g, q);
    u64 root = g, cur = g;
    for (u64 i = 0; i < degree; ++i) {
        if (cur < root) root = cur;
        cur = mulmod(cur, gsq, q);
    }
    return root;
}

// Extended-GCD modular inverse; returns 0 when not invertible.
u64 primus_mod_inv(u64 a, u64 q) {
    __int128 old_r = a % q, r = q;
    __int128 old_s = 1, s = 0;
    while (r != 0) {
        __int128 qt = old_r / r;
        __int128 tmp = old_r - qt * r; old_r = r; r = tmp;
        tmp = old_s - qt * s; old_s = s; s = tmp;
    }
    if (old_r != 1) return 0;
    __int128 res = old_s % (__int128)q;
    if (res < 0) res += q;
    return (u64)res;
}

// Builds the full table set for one modulus (all arrays length n unless
// noted): forward/inverse roots in bit-reversed order + Shoup quotients,
// ordinal psi powers (length 2n), and the fused inverse constants
// inv_n / inv_n_w (+ quotients) written into consts[4].
// Returns 0 on success.
int primus_build_tables(unsigned log_n, u64 q,
                        u64* roots, u64* roots_q,
                        u64* inv_roots, u64* inv_roots_q,
                        u64* ordinal, u64* consts) {
    u64 n = 1ull << log_n;
    u64 psi = primus_minimal_primitive_root(log_n + 1, q);
    if (!psi) return 1;
    ordinal[0] = 1;
    for (u64 i = 1; i < 2 * n; ++i) ordinal[i] = mulmod(ordinal[i - 1], psi, q);
    for (u64 i = 0; i < n; ++i) roots[reverse_lsbs(i, log_n)] = ordinal[i];
    inv_roots[0] = 1;
    for (u64 i = 0; i + 1 < n; ++i)
        inv_roots[reverse_lsbs(i, log_n) + 1] = ordinal[2 * n - 1 - i];
    for (u64 i = 0; i < n; ++i) {
        roots_q[i] = shoup_quot(roots[i], q);
        inv_roots_q[i] = shoup_quot(inv_roots[i], q);
    }
    u64 inv_n = primus_mod_inv(n % q, q);
    if (!inv_n) return 2;
    u64 inv_n_w = mulmod(inv_n, inv_roots[n - 1], q);
    consts[0] = inv_n;
    consts[1] = shoup_quot(inv_n, q);
    consts[2] = inv_n_w;
    consts[3] = shoup_quot(inv_n_w, q);
    return 0;
}

// In-place forward NTT (normal order -> bit-reversed), canonical output.
// Lazy [0,4q) internal range, Harvey butterflies, exactly the scalar
// reference semantics.
void primus_forward_ntt(unsigned log_n, u64 q, const u64* roots,
                        const u64* roots_q, u64* v) {
    u64 n = 1ull << log_n;
    u64 two_q = 2 * q;
    u64 t = n >> 1;
    u64 m = 1;
    u64 ri = 1;
    while (m < n) {
        for (u64 j = 0; j < m; ++j) {
            u64 w = roots[ri];
            u64 wq = roots_q[ri];
            ++ri;
            u64 base = 2 * j * t;
            for (u64 k2 = base; k2 < base + t; ++k2) {
                u64 x = v[k2], y = v[k2 + t];
                u64 tx = x < two_q ? x : x - two_q;
                u64 mm = shoup_mul_lazy(y, w, wq, q);
                v[k2] = tx + mm;
                v[k2 + t] = tx + two_q - mm;
            }
        }
        t >>= 1;
        m <<= 1;
    }
    for (u64 i = 0; i < n; ++i) {
        u64 x = v[i];
        if (x >= two_q) x -= two_q;
        if (x >= q) x -= q;
        v[i] = x;
    }
}

// In-place inverse NTT (bit-reversed -> normal order), canonical output,
// with the fused inv_n final stage.
void primus_inverse_ntt(unsigned log_n, u64 q, const u64* inv_roots,
                        const u64* inv_roots_q, const u64* consts, u64* v) {
    u64 n = 1ull << log_n;
    u64 two_q = 2 * q;
    u64 t = 1;
    u64 m = n >> 1;
    u64 ri = 1;
    while (m > 1) {
        for (u64 j = 0; j < m; ++j) {
            u64 w = inv_roots[ri];
            u64 wq = inv_roots_q[ri];
            ++ri;
            u64 base = 2 * j * t;
            for (u64 k2 = base; k2 < base + t; ++k2) {
                u64 x = v[k2], y = v[k2 + t];
                u64 s = x + y;
                v[k2] = s < two_q ? s : s - two_q;
                v[k2 + t] = shoup_mul_lazy(x + two_q - y, w, wq, q);
            }
        }
        t <<= 1;
        m >>= 1;
    }
    u64 half = n >> 1;
    u64 inv_n = consts[0], inv_n_q = consts[1];
    u64 inv_n_w = consts[2], inv_n_w_q = consts[3];
    for (u64 k2 = 0; k2 < half; ++k2) {
        u64 x = v[k2], y = v[k2 + half];
        u64 s = x + y;
        if (s >= two_q) s -= two_q;
        u64 d = x + two_q - y;
        u64 ox = shoup_mul_lazy(s, inv_n, inv_n_q, q);
        u64 oy = shoup_mul_lazy(d, inv_n_w, inv_n_w_q, q);
        v[k2] = ox >= q ? ox - q : ox;
        v[k2 + half] = oy >= q ? oy - q : oy;
    }
}

// Batched negacyclic product c = a * b in Z_q[X]/(X^n+1) via NTT.
// Scratch-free: caller provides tables; a and b are overwritten.
void primus_negacyclic_mul(unsigned log_n, u64 q,
                           const u64* roots, const u64* roots_q,
                           const u64* inv_roots, const u64* inv_roots_q,
                           const u64* consts, u64* a, u64* b, u64* out) {
    u64 n = 1ull << log_n;
    primus_forward_ntt(log_n, q, roots, roots_q, a);
    primus_forward_ntt(log_n, q, roots, roots_q, b);
    for (u64 i = 0; i < n; ++i) out[i] = mulmod(a[i], b[i], q);
    primus_inverse_ntt(log_n, q, inv_roots, inv_roots_q, consts, out);
}

// Barrett-style canonical modular multiply for test vectors.
u64 primus_mulmod(u64 a, u64 b, u64 q) { return mulmod(a, b, q); }
u64 primus_powmod(u64 a, u64 e, u64 q) { return powmod(a, e, q); }
u64 primus_shoup_quot(u64 w, u64 q) { return shoup_quot(w, q); }

}  // extern "C"
