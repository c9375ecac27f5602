// cap_native — host-side acceleration for the cap_tpu framework.
//
// Replaces the role of arkworks' x86 asm field arithmetic on the *host* side
// (witness generation, Merkle maintenance, verifier group ops; the device
// path is JAX/Pallas and does not use this).  Exposed via ctypes from
// cap_tpu/utils/native.py with a transparent pure-Python fallback.
//
// Scope: 4x64-limb Montgomery arithmetic for a runtime-configured 254-bit
// prime, BN254 G1 Jacobian ops + scalar mul, the Rescue permutation with
// runtime-injected constants, and Keccak-f[1600].
//
// Build: make -C native   (g++ -O3 -shared -fPIC, uses unsigned __int128)

#include <cstdint>
#include <cstring>

typedef unsigned __int128 u128;
typedef uint64_t u64;

struct Field {
    u64 p[4];      // modulus, little-endian limbs
    u64 r2[4];     // R^2 mod p
    u64 one[4];    // R mod p (Montgomery 1)
    u64 n0;        // -p^{-1} mod 2^64
};

static Field g_fr, g_fq;

// ---------------------------------------------------------------------------
// 4-limb Montgomery arithmetic
// ---------------------------------------------------------------------------

static inline int geq(const u64* a, const u64* b) {
    for (int i = 3; i >= 0; --i) {
        if (a[i] > b[i]) return 1;
        if (a[i] < b[i]) return 0;
    }
    return 1;
}

static inline void sub_p(u64* a, const u64* p) {
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a[i] - p[i] - borrow;
        a[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
}

static void f_add(const Field& F, const u64* a, const u64* b, u64* out) {
    u128 carry = 0;
    for (int i = 0; i < 4; ++i) {
        u128 s = (u128)a[i] + b[i] + carry;
        out[i] = (u64)s;
        carry = s >> 64;
    }
    if (carry || geq(out, F.p)) sub_p(out, F.p);
}

static void f_sub(const Field& F, const u64* a, const u64* b, u64* out) {
    u128 borrow = 0;
    u64 t[4];
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a[i] - b[i] - borrow;
        t[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
    if (borrow) {
        u128 carry = 0;
        for (int i = 0; i < 4; ++i) {
            u128 s = (u128)t[i] + F.p[i] + carry;
            t[i] = (u64)s;
            carry = s >> 64;
        }
    }
    memcpy(out, t, 32);
}

// CIOS Montgomery multiplication
static void f_mul(const Field& F, const u64* a, const u64* b, u64* out) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; ++i) {
        u128 carry = 0;
        for (int j = 0; j < 4; ++j) {
            u128 cur = (u128)t[j] + (u128)a[i] * b[j] + carry;
            t[j] = (u64)cur;
            carry = cur >> 64;
        }
        u128 cur = (u128)t[4] + carry;
        t[4] = (u64)cur;
        t[5] = (u64)(cur >> 64);

        u64 m = t[0] * F.n0;
        carry = 0;
        u128 c0 = (u128)t[0] + (u128)m * F.p[0];
        carry = c0 >> 64;
        for (int j = 1; j < 4; ++j) {
            u128 c = (u128)t[j] + (u128)m * F.p[j] + carry;
            t[j - 1] = (u64)c;
            carry = c >> 64;
        }
        u128 c4 = (u128)t[4] + carry;
        t[3] = (u64)c4;
        t[4] = t[5] + (u64)(c4 >> 64);
        t[5] = 0;
    }
    memcpy(out, t, 32);
    if (t[4] || geq(out, F.p)) sub_p(out, F.p);
}

static inline void shr1(u64* a) {
    a[0] = (a[0] >> 1) | (a[1] << 63);
    a[1] = (a[1] >> 1) | (a[2] << 63);
    a[2] = (a[2] >> 1) | (a[3] << 63);
    a[3] >>= 1;
}

static inline void add_nored(u64* a, const u64* b, u64* carry_out) {
    u128 carry = 0;
    for (int i = 0; i < 4; ++i) {
        u128 s = (u128)a[i] + b[i] + carry;
        a[i] = (u64)s;
        carry = s >> 64;
    }
    *carry_out = (u64)carry;
}

// Binary extended-GCD modular inverse (plain form in/out; a must be != 0).
// ~5x faster than Fermat for a single 254-bit inversion.
static void f_inv_plain(const Field& F, const u64* a, u64* out) {
    u64 u[4], v[4], x1[4] = {1, 0, 0, 0}, x2[4] = {0, 0, 0, 0};
    memcpy(u, a, 32);
    memcpy(v, F.p, 32);
    auto is_one = [](const u64* t) { return t[0] == 1 && !t[1] && !t[2] && !t[3]; };
    auto halve_mod = [&F](u64* x) {
        if (x[0] & 1) {
            u64 c;
            add_nored(x, F.p, &c);
            shr1(x);
            x[3] |= c << 63;
        } else {
            shr1(x);
        }
    };
    while (!is_one(u) && !is_one(v)) {
        while (!(u[0] & 1)) { shr1(u); halve_mod(x1); }
        while (!(v[0] & 1)) { shr1(v); halve_mod(x2); }
        if (geq(u, v)) {
            u128 borrow = 0;
            for (int i = 0; i < 4; ++i) {
                u128 d = (u128)u[i] - v[i] - borrow;
                u[i] = (u64)d;
                borrow = (d >> 64) ? 1 : 0;
            }
            f_sub(F, x1, x2, x1);
        } else {
            u128 borrow = 0;
            for (int i = 0; i < 4; ++i) {
                u128 d = (u128)v[i] - u[i] - borrow;
                v[i] = (u64)d;
                borrow = (d >> 64) ? 1 : 0;
            }
            f_sub(F, x2, x1, x2);
        }
    }
    memcpy(out, is_one(u) ? x1 : x2, 32);
}

// Inverse in Montgomery form: in aR -> out a^{-1}R.
static void f_inv_mont(const Field& F, const u64* a, u64* out) {
    u64 t[4];
    f_inv_plain(F, a, t);          // (aR)^{-1} = a^{-1} R^{-1}  (plain)
    f_mul(F, t, F.r2, t);          // a^{-1} (plain)
    f_mul(F, t, F.r2, out);        // a^{-1} R  (Montgomery)
}

static void f_pow(const Field& F, const u64* base, const u64* e, u64* out) {
    // 4-bit windowed exponentiation, MSB-first, skipping leading zeros:
    // ~254 squarings + ~63 window muls (vs 256 sqr + ~127 mul bit-serial)
    int top = 3;
    while (top >= 0 && e[top] == 0) --top;
    if (top < 0) { memcpy(out, F.one, 32); return; }
    u64 tbl[16][4];
    memcpy(tbl[0], F.one, 32);
    memcpy(tbl[1], base, 32);
    for (int i = 2; i < 16; ++i) f_mul(F, tbl[i - 1], base, tbl[i]);
    u64 acc[4];
    memcpy(acc, F.one, 32);
    int started = 0;
    for (int limb = top; limb >= 0; --limb) {
        for (int k = 60; k >= 0; k -= 4) {
            unsigned w = (unsigned)((e[limb] >> k) & 0xF);
            if (started) {
                f_mul(F, acc, acc, acc);
                f_mul(F, acc, acc, acc);
                f_mul(F, acc, acc, acc);
                f_mul(F, acc, acc, acc);
            }
            if (w) {
                if (started) f_mul(F, acc, tbl[w], acc);
                else { memcpy(acc, tbl[w], 32); started = 1; }
            }
        }
    }
    memcpy(out, acc, 32);
}

extern "C" {

void cap_field_init(int which, const u64* p, const u64* r2, const u64* one, u64 n0) {
    Field& F = which == 0 ? g_fr : g_fq;
    memcpy(F.p, p, 32);
    memcpy(F.r2, r2, 32);
    memcpy(F.one, one, 32);
    F.n0 = n0;
}

// a,b,out: Montgomery form limbs
void cap_fr_mul(const u64* a, const u64* b, u64* out) { f_mul(g_fr, a, b, out); }
void cap_fr_add(const u64* a, const u64* b, u64* out) { f_add(g_fr, a, b, out); }
void cap_fr_sub(const u64* a, const u64* b, u64* out) { f_sub(g_fr, a, b, out); }
void cap_fr_pow(const u64* a, const u64* e, u64* out) { f_pow(g_fr, a, e, out); }

// ---------------------------------------------------------------------------
// Rescue permutation (state width 4, 12 rounds, runtime constants)
// ---------------------------------------------------------------------------

static u64 g_mds[4][4][4];          // Montgomery
static u64 g_rk[25][4][4];          // Montgomery
static u64 g_alpha_inv[4];          // exponent (plain integer limbs)

void cap_rescue_init(const u64* mds, const u64* round_keys, const u64* alpha_inv) {
    memcpy(g_mds, mds, sizeof(g_mds));
    memcpy(g_rk, round_keys, sizeof(g_rk));
    memcpy(g_alpha_inv, alpha_inv, 32);
}

static inline void sbox5(const u64* x, u64* out) {
    u64 x2[4], x4[4];
    f_mul(g_fr, x, x, x2);
    f_mul(g_fr, x2, x2, x4);
    f_mul(g_fr, x4, x, out);
}

static void mds_key(const u64 st[4][4], const u64 key[4][4], u64 out[4][4]) {
    for (int i = 0; i < 4; ++i) {
        u64 acc[4];
        memcpy(acc, key[i], 32);
        for (int j = 0; j < 4; ++j) {
            u64 t[4];
            f_mul(g_fr, g_mds[i][j], st[j], t);
            f_add(g_fr, acc, t, acc);
        }
        memcpy(out[i], acc, 32);
    }
}

// state: 4 elements x 4 limbs, Montgomery form, in-place.
// Spec Alg 2 RescueWithRoundKeys order: INVERSE S-box first each round,
// then MDS+key, then the forward box, then MDS+key.
void cap_rescue_permute(u64* state_flat) {
    u64 st[4][4], t[4][4];
    memcpy(st, state_flat, sizeof(st));
    for (int i = 0; i < 4; ++i) f_add(g_fr, st[i], g_rk[0][i], st[i]);
    for (int r = 0; r < 12; ++r) {
        for (int i = 0; i < 4; ++i) f_pow(g_fr, st[i], g_alpha_inv, t[i]);
        mds_key(t, g_rk[2 * r + 1], st);
        for (int i = 0; i < 4; ++i) sbox5(st[i], t[i]);
        mds_key(t, g_rk[2 * r + 2], st);
    }
    memcpy(state_flat, st, sizeof(st));
}

// batch: n states, each 16 u64s
void cap_rescue_permute_many(u64* states, int n) {
    for (int i = 0; i < n; ++i) cap_rescue_permute(states + 16 * i);
}

// state: 4 elements x 4 limbs Montgomery; trace: 4 + 12*12 elements out —
// layout [s_init(4)] + per round [u(4) inverse box, v(4) MDS+k1,
// s(4) forward box fused with MDS+k2] — exactly the witness values the
// Rescue circuit gadget creates (plonk/gadgets/rescue.py).
void cap_rescue_trace(const u64* state_flat, u64* trace_out) {
    u64 st[4][4], u[4][4], v[4][4];
    memcpy(st, state_flat, sizeof(st));
    int w = 0;
    for (int i = 0; i < 4; ++i) f_add(g_fr, st[i], g_rk[0][i], st[i]);
    for (int i = 0; i < 4; ++i) { memcpy(trace_out + 4 * w, st[i], 32); ++w; }
    for (int r = 0; r < 12; ++r) {
        for (int i = 0; i < 4; ++i) f_pow(g_fr, st[i], g_alpha_inv, u[i]);
        for (int i = 0; i < 4; ++i) { memcpy(trace_out + 4 * w, u[i], 32); ++w; }
        mds_key(u, g_rk[2 * r + 1], v);
        for (int i = 0; i < 4; ++i) { memcpy(trace_out + 4 * w, v[i], 32); ++w; }
        u64 sb[4][4];
        for (int i = 0; i < 4; ++i) sbox5(v[i], sb[i]);
        mds_key(sb, g_rk[2 * r + 2], st);
        for (int i = 0; i < 4; ++i) { memcpy(trace_out + 4 * w, st[i], 32); ++w; }
    }
}

// ---------------------------------------------------------------------------
// Keyed Rescue PRP + counter-mode key stream (spec Alg 2 / Alg 6)
// ---------------------------------------------------------------------------

static u64 g_keyinj[25][4][4];      // Montgomery key-injection vectors
static int g_have_keyinj = 0;

void cap_rescue_set_keyinj(const u64* inj) {
    memcpy(g_keyinj, inj, sizeof(g_keyinj));
    g_have_keyinj = 1;
}

// spec Alg 2 KeyScheduling: run the key vector through the alternating
// schedule (inverse box on even half-rounds) with key-injection adds.
static void key_scheduling(const u64 key[4][4], u64 rk[25][4][4]) {
    u64 prev[4][4], t[4][4];
    for (int i = 0; i < 4; ++i) f_add(g_fr, key[i], g_keyinj[0][i], prev[i]);
    memcpy(rk[0], prev, sizeof(prev));
    for (int i = 0; i < 24; ++i) {
        if (i % 2 == 0) {
            for (int k = 0; k < 4; ++k) f_pow(g_fr, prev[k], g_alpha_inv, t[k]);
        } else {
            for (int k = 0; k < 4; ++k) sbox5(prev[k], t[k]);
        }
        mds_key(t, g_keyinj[i + 1], prev);
        memcpy(rk[i + 1], prev, sizeof(prev));
    }
}

static void prp_with_keys(const u64 rk[25][4][4], u64 st[4][4]) {
    u64 t[4][4];
    for (int i = 0; i < 4; ++i) f_add(g_fr, st[i], rk[0][i], st[i]);
    for (int r = 0; r < 12; ++r) {
        for (int i = 0; i < 4; ++i) f_pow(g_fr, st[i], g_alpha_inv, t[i]);
        mds_key(t, rk[2 * r + 1], st);
        for (int i = 0; i < 4; ++i) sbox5(st[i], t[i]);
        mds_key(t, rk[2 * r + 2], st);
    }
}

// key4: 4x4 Montgomery; nonces: nblocks x 4 Montgomery (the [i,0,0,0]
// block inputs pre-converted by the caller); out: nblocks x 4 x 4
// Montgomery key-stream values.  Returns 0, or 1 when no key-injection
// table was installed.
int cap_rescue_counter_stream(const u64* key4, const u64* nonces,
                              int nblocks, u64* out) {
    if (!g_have_keyinj) return 1;
    u64 key[4][4], rk[25][4][4];
    memcpy(key, key4, sizeof(key));
    key_scheduling(key, rk);
    for (int b = 0; b < nblocks; ++b) {
        u64 st[4][4];
        memcpy(st[0], nonces + 4 * b, 32);
        memset(st[1], 0, 32 * 3);
        prp_with_keys(rk, st);
        memcpy(out + 16 * b, st, 128);
    }
    return 0;
}

// ---------------------------------------------------------------------------
// Twisted Edwards (Baby Jubjub) over Fr: a*x^2+y^2 = 1+d*x^2*y^2
// ---------------------------------------------------------------------------

static u64 g_te_a[4], g_te_d[4], g_fr_pm2[4];

void cap_te_init(const u64* a_mont, const u64* d_mont) {
    memcpy(g_te_a, a_mont, 32);
    memcpy(g_te_d, d_mont, 32);
    // p - 2 for Fermat inversion
    u64 two[4] = {2, 0, 0, 0};
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
        u128 dd = (u128)g_fr.p[i] - two[i] - borrow;
        g_fr_pm2[i] = (u64)dd;
        borrow = (dd >> 64) ? 1 : 0;
    }
}

struct TEP { u64 x[4], y[4], z[4]; };  // projective, Montgomery

// add-2008-bbjlp projective TE addition (complete for non-square d)
static void te_add(const TEP* p, const TEP* q, TEP* out) {
    u64 A[4], B[4], C[4], D[4], E[4], F[4], G[4], t1[4], t2[4], t3[4];
    f_mul(g_fr, p->z, q->z, A);
    f_mul(g_fr, A, A, B);
    f_mul(g_fr, p->x, q->x, C);
    f_mul(g_fr, p->y, q->y, D);
    f_mul(g_fr, C, D, E);
    f_mul(g_fr, E, g_te_d, E);
    f_sub(g_fr, B, E, F);
    f_add(g_fr, B, E, G);
    f_add(g_fr, p->x, p->y, t1);
    f_add(g_fr, q->x, q->y, t2);
    f_mul(g_fr, t1, t2, t3);
    f_sub(g_fr, t3, C, t3);
    f_sub(g_fr, t3, D, t3);          // (x1+y1)(x2+y2) - C - D
    TEP r;
    f_mul(g_fr, A, F, t1);
    f_mul(g_fr, t1, t3, r.x);
    f_mul(g_fr, C, g_te_a, t2);
    f_sub(g_fr, D, t2, t2);          // D - a*C
    f_mul(g_fr, A, G, t1);
    f_mul(g_fr, t1, t2, r.y);
    f_mul(g_fr, F, G, r.z);
    *out = r;
}

static void te_normalize(const TEP* p, u64* out_xy) {
    u64 zi[4];
    f_inv_mont(g_fr, p->z, zi);
    f_mul(g_fr, p->x, zi, out_xy);
    f_mul(g_fr, p->y, zi, out_xy + 4);
}

// affine Montgomery (x,y) in/out
void cap_te_add(const u64* p1, const u64* p2, u64* out) {
    TEP a, b, r;
    memcpy(a.x, p1, 32); memcpy(a.y, p1 + 4, 32); memcpy(a.z, g_fr.one, 32);
    memcpy(b.x, p2, 32); memcpy(b.y, p2 + 4, 32); memcpy(b.z, g_fr.one, 32);
    te_add(&a, &b, &r);
    te_normalize(&r, out);
}

// pt affine Montgomery (x,y); scalar plain LE u64x4; out affine Montgomery
void cap_te_mul(const u64* pt, const u64* scalar, u64* out) {
    TEP base, acc;
    memcpy(base.x, pt, 32); memcpy(base.y, pt + 4, 32); memcpy(base.z, g_fr.one, 32);
    memset(acc.x, 0, 32);
    memcpy(acc.y, g_fr.one, 32);
    memcpy(acc.z, g_fr.one, 32);     // neutral (0 : 1 : 1)
    for (int limb = 3; limb >= 0; --limb) {
        for (int k = 63; k >= 0; --k) {
            te_add(&acc, &acc, &acc);
            if ((scalar[limb] >> k) & 1) te_add(&acc, &base, &acc);
        }
    }
    te_normalize(&acc, out);
}

// ---------------------------------------------------------------------------
// BN254 G1 Jacobian (x, y, z Montgomery in Fq; z == 0 -> infinity)
// ---------------------------------------------------------------------------

struct Jac { u64 x[4], y[4], z[4]; };

static inline int is_zero4(const u64* a) { return !(a[0] | a[1] | a[2] | a[3]); }

static void jac_double(const Jac* p, Jac* out) {
    if (is_zero4(p->z)) { *out = *p; return; }
    u64 a[4], b[4], c[4], d[4], e[4], f[4], t[4];
    f_mul(g_fq, p->x, p->x, a);           // A = X^2
    f_mul(g_fq, p->y, p->y, b);           // B = Y^2
    f_mul(g_fq, b, b, c);                 // C = B^2
    f_add(g_fq, p->x, b, t);              // (X+B)
    f_mul(g_fq, t, t, d);
    f_sub(g_fq, d, a, d);
    f_sub(g_fq, d, c, d);
    f_add(g_fq, d, d, d);                 // D = 2((X+B)^2 - A - C)
    f_add(g_fq, a, a, e);
    f_add(g_fq, e, a, e);                 // E = 3A
    f_mul(g_fq, e, e, f);                 // F = E^2
    Jac r;
    f_sub(g_fq, f, d, r.x);
    f_sub(g_fq, r.x, d, r.x);             // X3 = F - 2D
    u64 c8[4];
    f_add(g_fq, c, c, c8); f_add(g_fq, c8, c8, c8); f_add(g_fq, c8, c8, c8);
    f_sub(g_fq, d, r.x, t);
    f_mul(g_fq, e, t, r.y);
    f_sub(g_fq, r.y, c8, r.y);            // Y3 = E(D - X3) - 8C
    f_mul(g_fq, p->y, p->z, t);
    f_add(g_fq, t, t, r.z);               // Z3 = 2YZ
    *out = r;
}

static void jac_add(const Jac* p, const Jac* q, Jac* out) {
    if (is_zero4(p->z)) { *out = *q; return; }
    if (is_zero4(q->z)) { *out = *p; return; }
    u64 z1z1[4], z2z2[4], u1[4], u2[4], s1[4], s2[4], t[4];
    f_mul(g_fq, p->z, p->z, z1z1);
    f_mul(g_fq, q->z, q->z, z2z2);
    f_mul(g_fq, p->x, z2z2, u1);
    f_mul(g_fq, q->x, z1z1, u2);
    f_mul(g_fq, p->y, z2z2, s1); f_mul(g_fq, s1, q->z, s1);
    f_mul(g_fq, q->y, z1z1, s2); f_mul(g_fq, s2, p->z, s2);
    if (!memcmp(u1, u2, 32)) {
        if (memcmp(s1, s2, 32)) { memset(out, 0, sizeof(Jac)); out->y[0] = 1; return; }
        jac_double(p, out);
        return;
    }
    u64 h[4], i[4], j[4], rr[4], v[4];
    f_sub(g_fq, u2, u1, h);
    f_add(g_fq, h, h, t);
    f_mul(g_fq, t, t, i);                 // I = (2H)^2
    f_mul(g_fq, h, i, j);                 // J = H*I
    f_sub(g_fq, s2, s1, rr);
    f_add(g_fq, rr, rr, rr);              // r = 2(S2-S1)
    f_mul(g_fq, u1, i, v);                // V = U1*I
    Jac r;
    f_mul(g_fq, rr, rr, r.x);
    f_sub(g_fq, r.x, j, r.x);
    f_sub(g_fq, r.x, v, r.x);
    f_sub(g_fq, r.x, v, r.x);             // X3 = r^2 - J - 2V
    f_sub(g_fq, v, r.x, t);
    f_mul(g_fq, rr, t, r.y);
    u64 s1j[4];
    f_mul(g_fq, s1, j, s1j);
    f_add(g_fq, s1j, s1j, s1j);
    f_sub(g_fq, r.y, s1j, r.y);           // Y3 = r(V-X3) - 2 S1 J
    f_mul(g_fq, p->z, q->z, t);
    f_add(g_fq, t, t, t);
    f_mul(g_fq, t, h, r.z);               // Z3 = 2 Z1 Z2 H
    *out = r;
}

// pt: 12 u64 (x,y,z Montgomery); scalar: 4 u64 plain LE; out: 12 u64
void cap_g1_mul(const u64* pt, const u64* scalar, u64* out) {
    Jac base, acc;
    memcpy(&base, pt, sizeof(Jac));
    memset(&acc, 0, sizeof(Jac));
    acc.y[0] = 1;  // canonical infinity (z == 0)
    for (int limb = 3; limb >= 0; --limb) {
        for (int k = 63; k >= 0; --k) {
            jac_double(&acc, &acc);
            if ((scalar[limb] >> k) & 1) jac_add(&acc, &base, &acc);
        }
    }
    memcpy(out, &acc, sizeof(Jac));
}

void cap_g1_add(const u64* a, const u64* b, u64* out) {
    Jac r;
    jac_add((const Jac*)a, (const Jac*)b, &r);
    memcpy(out, &r, sizeof(Jac));
}

// naive host MSM over jacobian points (small n — verifier-side folds)
void cap_g1_msm(const u64* pts, const u64* scalars, int n, u64* out) {
    Jac acc;
    memset(&acc, 0, sizeof(Jac));
    acc.y[0] = 1;
    for (int i = 0; i < n; ++i) {
        u64 tmp[12];
        cap_g1_mul(pts + 12 * i, scalars + 4 * i, tmp);
        jac_add(&acc, (const Jac*)tmp, &acc);
    }
    memcpy(out, &acc, sizeof(Jac));
}

}  // extern "C" (reopened below)

// Bucket-Pippenger MSM (arkworks VariableBaseMSM role, host tier).  Window
// sums are independent, so they run on worker threads; the caller-visible
// cost is ~(254/c)*(n + 2^c)/nthreads Jacobian adds plus 254 doublings in
// the final fold.  Powers the CPU-suite real proofs (CAP_MSM=host).
#include <thread>
#include <vector>

static inline void jac_inf(Jac* p) { memset(p, 0, sizeof(Jac)); p->y[0] = 1; }

static void pip_window_sum(const u64* pts, const u64* scalars, int n, int c,
                           int w, Jac* out) {
    const u64 mask = (c == 64) ? ~0ull : ((1ull << c) - 1);
    const size_t nb = ((size_t)1 << c) - 1;
    std::vector<Jac> buckets(nb);
    for (size_t b = 0; b < nb; ++b) jac_inf(&buckets[b]);
    const int bit = w * c;
    const int limb = bit >> 6, sh = bit & 63;
    for (int i = 0; i < n; ++i) {
        const u64* s = scalars + 4 * i;
        u64 d = s[limb] >> sh;
        if (sh && limb < 3) d |= s[limb + 1] << (64 - sh);
        d &= mask;
        if (d) jac_add(&buckets[d - 1], (const Jac*)(pts + 12 * i), &buckets[d - 1]);
    }
    Jac running, winsum;
    jac_inf(&running);
    jac_inf(&winsum);
    for (size_t d = nb; d >= 1; --d) {
        jac_add(&running, &buckets[d - 1], &running);
        jac_add(&winsum, &running, &winsum);
    }
    *out = winsum;
}

extern "C" {

// pts: n x 12 u64 (Jacobian Montgomery; z=0 entries are skipped by d==0
// digits only if their scalar is 0 — callers must pre-filter infinities).
// scalars: n x 4 u64 plain LE < r.  out: 12 u64 Jacobian Montgomery.
void cap_g1_msm_pippenger(const u64* pts, const u64* scalars, int n, int c,
                          u64* out) {
    const int windows = (254 + c - 1) / c;
    std::vector<Jac> wsums(windows);
    // respect the process cpuset (multi-host pool workers pin themselves to
    // disjoint cores — hardware_concurrency would oversubscribe the pin)
    unsigned hw = 0;
#ifdef __linux__
    cpu_set_t cs;
    if (sched_getaffinity(0, sizeof(cs), &cs) == 0)
        hw = (unsigned)CPU_COUNT(&cs);
#endif
    if (!hw) hw = std::thread::hardware_concurrency();
    int nthreads = (int)(hw ? hw : 1);
    if (nthreads > windows) nthreads = windows;
    std::vector<std::thread> threads;
    for (int t = 0; t < nthreads; ++t) {
        threads.emplace_back([&, t]() {
            for (int w = t; w < windows; w += nthreads)
                pip_window_sum(pts, scalars, n, c, w, &wsums[w]);
        });
    }
    for (auto& th : threads) th.join();
    Jac acc;
    jac_inf(&acc);
    for (int w = windows - 1; w >= 0; --w) {
        if (!is_zero4(acc.z))
            for (int k = 0; k < c; ++k) jac_double(&acc, &acc);
        jac_add(&acc, &wsums[w], &acc);
    }
    memcpy(out, &acc, sizeof(Jac));
}

// ---------------------------------------------------------------------------
// Witness-tape replayer
//
// Replays the per-shape witness tape recorded by plonk/circuit.py (compiled
// to a u32 bytecode by plonk/tape.py compile_tape) so that per-prove witness
// generation runs at native speed instead of interpreted Python.  The
// reference re-synthesizes its circuit in compiled Rust per prove
// (src/proof/transfer.rs:159-188); this is the TPU build's equivalent.
//
// Bytecode: a stream of u32 words, one instruction per witness variable, in
// variable order.  Field values flow in Montgomery form; `inputs` arrive in
// plain form and the output witness is written back in plain form as 4x u64
// little-endian limbs per variable (bit-compatible with the prover's
// 16x u16 limb view).
// ---------------------------------------------------------------------------

enum TapeOp : uint32_t {
    T_CONST = 0, T_LOAD = 1, T_ADD = 2, T_SUB = 3, T_MUL = 4,
    T_ADDC = 5, T_MULC = 6, T_LC = 7, T_MULADD = 8, T_POW5 = 9,
    T_ROOT5 = 10, T_P5LC = 11, T_NOTV = 12, T_ORV = 13, T_INV0 = 14,
    T_EQZ = 15, T_SEL = 16, T_BIT = 17, T_LTP2 = 18, T_BITIF = 19,
    T_AFF2 = 20, T_TEADD2 = 21, T_SKIP = 22,
};

typedef uint32_t u32;

static inline void to_plain(const u64* mont, u64* plain) {
    // Montgomery reduce: mul by plain 1
    u64 one_plain[4] = {1, 0, 0, 0};
    f_mul(g_fr, mont, one_plain, plain);
}

// returns 0 on success; -1 unknown op; -2 instruction count != n_vars
int cap_tape_replay(const u32* code, long ncode, const u64* consts,
                    const u64* inputs, long n_vars, u64* out) {
    u64* w = new u64[(size_t)n_vars * 4];
    long pc = 0, v = 0;
    int rc = 0;
    while (pc < ncode && v < n_vars) {
        u64* wv = w + 4 * v;
        switch (code[pc]) {
        case T_CONST: memcpy(wv, consts + 4 * code[pc + 1], 32); pc += 2; break;
        case T_LOAD: {
            // convert plain input to Montgomery
            f_mul(g_fr, inputs + 4 * code[pc + 1], g_fr.r2, wv);
            pc += 2; break;
        }
        case T_ADD: f_add(g_fr, w + 4 * code[pc + 1], w + 4 * code[pc + 2], wv); pc += 3; break;
        case T_SUB: f_sub(g_fr, w + 4 * code[pc + 1], w + 4 * code[pc + 2], wv); pc += 3; break;
        case T_MUL: f_mul(g_fr, w + 4 * code[pc + 1], w + 4 * code[pc + 2], wv); pc += 3; break;
        case T_ADDC: f_add(g_fr, w + 4 * code[pc + 1], consts + 4 * code[pc + 2], wv); pc += 3; break;
        case T_MULC: f_mul(g_fr, w + 4 * code[pc + 1], consts + 4 * code[pc + 2], wv); pc += 3; break;
        case T_LC: {
            u32 n = code[pc + 1];
            u64 acc[4], t[4];
            memcpy(acc, consts + 4 * code[pc + 2 + 2 * n], 32);
            for (u32 k = 0; k < n; ++k) {
                f_mul(g_fr, w + 4 * code[pc + 2 + 2 * k], consts + 4 * code[pc + 3 + 2 * k], t);
                f_add(g_fr, acc, t, acc);
            }
            memcpy(wv, acc, 32);
            pc += 3 + 2 * n; break;
        }
        case T_MULADD: {
            u64 t1[4], t2[4];
            f_mul(g_fr, w + 4 * code[pc + 1], w + 4 * code[pc + 2], t1);
            f_mul(g_fr, t1, consts + 4 * code[pc + 5], t1);
            f_mul(g_fr, w + 4 * code[pc + 3], w + 4 * code[pc + 4], t2);
            f_mul(g_fr, t2, consts + 4 * code[pc + 6], t2);
            f_add(g_fr, t1, t2, wv);
            pc += 7; break;
        }
        case T_POW5: sbox5(w + 4 * code[pc + 1], wv); pc += 2; break;
        case T_ROOT5: f_pow(g_fr, w + 4 * code[pc + 1], g_alpha_inv, wv); pc += 2; break;
        case T_P5LC: {
            u32 n = code[pc + 1];
            u64 acc[4], t[4];
            memcpy(acc, consts + 4 * code[pc + 2 + 2 * n], 32);
            for (u32 k = 0; k < n; ++k) {
                sbox5(w + 4 * code[pc + 2 + 2 * k], t);
                f_mul(g_fr, t, consts + 4 * code[pc + 3 + 2 * k], t);
                f_add(g_fr, acc, t, acc);
            }
            memcpy(wv, acc, 32);
            pc += 3 + 2 * n; break;
        }
        case T_NOTV: f_sub(g_fr, g_fr.one, w + 4 * code[pc + 1], wv); pc += 2; break;
        case T_ORV: {
            u64 t[4];
            const u64* a = w + 4 * code[pc + 1];
            const u64* b = w + 4 * code[pc + 2];
            f_mul(g_fr, a, b, t);
            f_add(g_fr, a, b, wv);
            f_sub(g_fr, wv, t, wv);
            pc += 3; break;
        }
        case T_INV0: {
            const u64* a = w + 4 * code[pc + 1];
            if (a[0] == 0 && a[1] == 0 && a[2] == 0 && a[3] == 0) memset(wv, 0, 32);
            else f_inv_mont(g_fr, a, wv);
            pc += 2; break;
        }
        case T_EQZ: {
            const u64* a = w + 4 * code[pc + 1];
            if (a[0] == 0 && a[1] == 0 && a[2] == 0 && a[3] == 0) memcpy(wv, g_fr.one, 32);
            else memset(wv, 0, 32);
            pc += 2; break;
        }
        case T_SEL: {
            const u64* b = w + 4 * code[pc + 1];
            int truthy = !(b[0] == 0 && b[1] == 0 && b[2] == 0 && b[3] == 0);
            memcpy(wv, w + 4 * code[pc + (truthy ? 3 : 2)], 32);
            pc += 4; break;
        }
        case T_BIT: {
            u64 plain[4];
            to_plain(w + 4 * code[pc + 1], plain);
            u32 i = code[pc + 2];
            u64 bit = (plain[i >> 6] >> (i & 63)) & 1;
            if (bit) memcpy(wv, g_fr.one, 32); else memset(wv, 0, 32);
            pc += 3; break;
        }
        case T_LTP2: {
            u64 plain[4];
            to_plain(w + 4 * code[pc + 1], plain);
            u32 nb = code[pc + 2];
            int lt = 1;
            for (int i = 0; i < 4; ++i) {
                u64 limb = plain[i];
                int base = 64 * i;
                if (base >= (int)nb) { if (limb) { lt = 0; break; } }
                else if (base + 64 > (int)nb) {
                    if (limb >> (nb - base)) { lt = 0; break; }
                }
            }
            if (lt) memcpy(wv, g_fr.one, 32); else memset(wv, 0, 32);
            pc += 3; break;
        }
        case T_BITIF: {
            const u64* b = w + 4 * code[pc + 1];
            int truthy = !(b[0] == 0 && b[1] == 0 && b[2] == 0 && b[3] == 0);
            if (!truthy) memset(wv, 0, 32);
            else {
                u64 plain[4];
                to_plain(w + 4 * code[pc + 2], plain);
                u32 i = code[pc + 3];
                u64 bit = (plain[i >> 6] >> (i & 63)) & 1;
                if (bit) memcpy(wv, g_fr.one, 32); else memset(wv, 0, 32);
            }
            pc += 4; break;
        }
        case T_AFF2: {
            const u64* a = w + 4 * code[pc + 1];
            const u64* b = w + 4 * code[pc + 2];
            u64 acc[4], t[4];
            memcpy(acc, consts + 4 * code[pc + 3], 32);
            f_mul(g_fr, consts + 4 * code[pc + 4], a, t);
            f_add(g_fr, acc, t, acc);
            f_mul(g_fr, a, b, t);
            f_mul(g_fr, t, consts + 4 * code[pc + 5], t);
            f_add(g_fr, acc, t, acc);
            f_mul(g_fr, consts + 4 * code[pc + 6], b, t);
            f_add(g_fr, acc, t, wv);
            pc += 7; break;
        }
        case T_TEADD2: {
            TEP a, b, r;
            memcpy(a.x, w + 4 * code[pc + 1], 32);
            memcpy(a.y, w + 4 * code[pc + 2], 32);
            memcpy(a.z, g_fr.one, 32);
            memcpy(b.x, w + 4 * code[pc + 3], 32);
            memcpy(b.y, w + 4 * code[pc + 4], 32);
            memcpy(b.z, g_fr.one, 32);
            te_add(&a, &b, &r);
            u64 xy[8];
            te_normalize(&r, xy);
            memcpy(wv, xy, 32);
            if (v + 1 < n_vars) memcpy(wv + 4, xy + 4, 32);
            pc += 5; break;
        }
        case T_SKIP: pc += 1; break;
        default: rc = -1; goto done;
        }
        ++v;
    }
    if (rc == 0 && (v != n_vars || pc != ncode)) rc = -2;
    // convert to plain form
    if (rc == 0)
        for (long i = 0; i < n_vars; ++i) to_plain(w + 4 * i, out + 4 * i);
done:
    delete[] w;
    return rc;
}

// ---------------------------------------------------------------------------
// Keccak-f[1600]
// ---------------------------------------------------------------------------

static const u64 KRC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL,
};

static const int KROT[5][5] = {
    {0, 36, 3, 41, 18}, {1, 44, 10, 45, 2}, {62, 6, 43, 15, 61},
    {28, 55, 25, 21, 56}, {27, 20, 39, 8, 14},
};

static inline u64 rotl(u64 v, int n) { return n ? (v << n) | (v >> (64 - n)) : v; }

void cap_keccak_f1600(u64* a) {
    for (int round = 0; round < 24; ++round) {
        u64 c[5], d[5], b[25];
        for (int x = 0; x < 5; ++x)
            c[x] = a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20];
        for (int x = 0; x < 5; ++x) d[x] = c[(x + 4) % 5] ^ rotl(c[(x + 1) % 5], 1);
        for (int i = 0; i < 25; ++i) a[i] ^= d[i % 5];
        for (int x = 0; x < 5; ++x)
            for (int y = 0; y < 5; ++y)
                b[y + 5 * ((2 * x + 3 * y) % 5)] = rotl(a[x + 5 * y], KROT[x][y]);
        for (int y = 0; y < 5; ++y)
            for (int x = 0; x < 5; ++x)
                a[x + 5 * y] = b[x + 5 * y] ^ ((~b[(x + 1) % 5 + 5 * y]) & b[(x + 2) % 5 + 5 * y]);
        a[0] ^= KRC[round];
    }
}

// Whole-digest Keccak-256 (Ethereum padding: 0x01 .. 0x80), rate 136 bytes.
// One ctypes call per digest instead of one per permutation — the Solidity
// Fiat-Shamir transcript rehashes its whole running buffer on every
// challenge, so digest cost is on the prove path.
void cap_keccak256(const unsigned char* data, long len, unsigned char* out32) {
    const int rate = 136;
    u64 st[25];
    memset(st, 0, sizeof(st));
    long off = 0;
    while (len - off >= rate) {
        for (int i = 0; i < rate / 8; ++i) {
            u64 w;
            memcpy(&w, data + off + 8 * i, 8);
            st[i] ^= w;
        }
        cap_keccak_f1600(st);
        off += rate;
    }
    unsigned char block[136];
    memset(block, 0, sizeof(block));
    memcpy(block, data + off, len - off);
    block[len - off] ^= 0x01;
    block[rate - 1] ^= 0x80;
    for (int i = 0; i < rate / 8; ++i) {
        u64 w;
        memcpy(&w, block + 8 * i, 8);
        st[i] ^= w;
    }
    cap_keccak_f1600(st);
    memcpy(out32, st, 32);
}


}  // extern "C"

// ---------------------------------------------------------------------------
// BN254 optimal-ate pairing (tower Fq2/Fq6/Fq12, affine Miller loop with
// lines assembled as sparse Fq12 elements, Scott final exponentiation).
//
// Mirrors the algorithm of cap_tpu/crypto/bn254.py (SURVEY.md §2.2 L1
// "pairing for verify"); constants (frobenius gammas, twist frobenius
// coefficients, the BN parameter and ate loop count) are injected from
// Python at init so the C++ holds no curve tables of its own.  ~50x the
// Python pairing; drives PlonkKzgSnark::verify / batch_verify throughput.
// ---------------------------------------------------------------------------

struct F2c { u64 c0[4], c1[4]; };       // Fq[u]/(u^2+1), Montgomery coeffs
struct F6c { F2c c0, c1, c2; };         // Fq2[v]/(v^3 - xi), xi = 9 + u
struct F12c { F6c c0, c1; };            // Fq6[w]/(w^2 - v)

static F2c g_gamma[3][5];               // gamma[e-1][i-1] = xi^(i*(p^e-1)/6)
static F2c g_frob_x, g_frob_y;          // twist frobenius coefficients
static u64 g_bn_x;                      // |BN x| parameter
static int g_ate_bits[70];              // ate loop count, MSB first
static int g_ate_nbits;
static u64 g_fq_nine[4];                // Montgomery 9 in Fq

static inline void f2_add(const F2c* a, const F2c* b, F2c* o) {
    f_add(g_fq, a->c0, b->c0, o->c0); f_add(g_fq, a->c1, b->c1, o->c1);
}
static inline void f2_sub(const F2c* a, const F2c* b, F2c* o) {
    f_sub(g_fq, a->c0, b->c0, o->c0); f_sub(g_fq, a->c1, b->c1, o->c1);
}
static inline void f2_neg(const F2c* a, F2c* o) {
    u64 z[4] = {0, 0, 0, 0};
    f_sub(g_fq, z, a->c0, o->c0); f_sub(g_fq, z, a->c1, o->c1);
}
static inline void f2_conj(const F2c* a, F2c* o) {
    u64 z[4] = {0, 0, 0, 0};
    memcpy(o->c0, a->c0, 32); f_sub(g_fq, z, a->c1, o->c1);
}
static void f2_mul(const F2c* a, const F2c* b, F2c* o) {
    u64 t0[4], t1[4], t2[4], t3[4];
    f_mul(g_fq, a->c0, b->c0, t0);
    f_mul(g_fq, a->c1, b->c1, t1);
    f_add(g_fq, a->c0, a->c1, t2);
    f_add(g_fq, b->c0, b->c1, t3);
    f_mul(g_fq, t2, t3, t2);            // (a0+a1)(b0+b1)
    F2c r;
    f_sub(g_fq, t0, t1, r.c0);          // a0b0 - a1b1
    f_sub(g_fq, t2, t0, r.c1);
    f_sub(g_fq, r.c1, t1, r.c1);        // cross terms
    *o = r;
}
static inline void f2_sq(const F2c* a, F2c* o) { f2_mul(a, a, o); }
static void f2_mul_fq(const F2c* a, const u64* k, F2c* o) {
    f_mul(g_fq, a->c0, k, o->c0); f_mul(g_fq, a->c1, k, o->c1);
}
static void f2_inv(const F2c* a, F2c* o) {
    u64 t0[4], t1[4], z[4] = {0, 0, 0, 0};
    f_mul(g_fq, a->c0, a->c0, t0);
    f_mul(g_fq, a->c1, a->c1, t1);
    f_add(g_fq, t0, t1, t0);            // norm = c0^2 + c1^2
    f_inv_mont(g_fq, t0, t0);
    f_mul(g_fq, a->c0, t0, o->c0);
    f_sub(g_fq, z, a->c1, o->c1);
    f_mul(g_fq, o->c1, t0, o->c1);
}
static void f2_mul_xi(const F2c* a, F2c* o) {  // (9 + u) * a
    F2c t;
    f_mul(g_fq, a->c0, g_fq_nine, t.c0);
    f_sub(g_fq, t.c0, a->c1, t.c0);              // 9 c0 - c1
    f_mul(g_fq, a->c1, g_fq_nine, t.c1);
    f_add(g_fq, t.c1, a->c0, t.c1);              // c0 + 9 c1
    *o = t;
}
static inline int f2_is_zero(const F2c* a) {
    return is_zero4(a->c0) && is_zero4(a->c1);
}
static inline int f2_eq(const F2c* a, const F2c* b) {
    return !memcmp(a, b, sizeof(F2c));
}

static void f6_add(const F6c* a, const F6c* b, F6c* o) {
    f2_add(&a->c0, &b->c0, &o->c0); f2_add(&a->c1, &b->c1, &o->c1);
    f2_add(&a->c2, &b->c2, &o->c2);
}
static void f6_sub(const F6c* a, const F6c* b, F6c* o) {
    f2_sub(&a->c0, &b->c0, &o->c0); f2_sub(&a->c1, &b->c1, &o->c1);
    f2_sub(&a->c2, &b->c2, &o->c2);
}
static void f6_neg(const F6c* a, F6c* o) {
    f2_neg(&a->c0, &o->c0); f2_neg(&a->c1, &o->c1); f2_neg(&a->c2, &o->c2);
}
static void f6_mul(const F6c* a, const F6c* b, F6c* o) {
    F2c t00, t11, t22, t01, t10, t02, t20, t12, t21, x;
    f2_mul(&a->c0, &b->c0, &t00);
    f2_mul(&a->c1, &b->c1, &t11);
    f2_mul(&a->c2, &b->c2, &t22);
    f2_mul(&a->c0, &b->c1, &t01);
    f2_mul(&a->c1, &b->c0, &t10);
    f2_mul(&a->c0, &b->c2, &t02);
    f2_mul(&a->c2, &b->c0, &t20);
    f2_mul(&a->c1, &b->c2, &t12);
    f2_mul(&a->c2, &b->c1, &t21);
    F6c r;
    f2_add(&t12, &t21, &x); f2_mul_xi(&x, &x); f2_add(&t00, &x, &r.c0);
    f2_mul_xi(&t22, &x); f2_add(&t01, &t10, &r.c1); f2_add(&r.c1, &x, &r.c1);
    f2_add(&t02, &t20, &r.c2); f2_add(&r.c2, &t11, &r.c2);
    *o = r;
}
static inline void f6_sq(const F6c* a, F6c* o) { f6_mul(a, a, o); }
static void f6_mul_v(const F6c* a, F6c* o) {    // v * (a0 + a1 v + a2 v^2)
    F6c r;
    f2_mul_xi(&a->c2, &r.c0);
    r.c1 = a->c0; r.c2 = a->c1;
    *o = r;
}
static void f6_inv(const F6c* a, F6c* o) {
    F2c A, B, C, t, den;
    f2_sq(&a->c0, &A); f2_mul(&a->c1, &a->c2, &t); f2_mul_xi(&t, &t);
    f2_sub(&A, &t, &A);                          // A = c0^2 - xi c1 c2
    f2_sq(&a->c2, &B); f2_mul_xi(&B, &B); f2_mul(&a->c0, &a->c1, &t);
    f2_sub(&B, &t, &B);                          // B = xi c2^2 - c0 c1
    f2_sq(&a->c1, &C); f2_mul(&a->c0, &a->c2, &t);
    f2_sub(&C, &t, &C);                          // C = c1^2 - c0 c2
    F2c d1, d2;
    f2_mul(&a->c0, &A, &den);
    f2_mul(&a->c2, &B, &d1); f2_mul_xi(&d1, &d1);
    f2_mul(&a->c1, &C, &d2); f2_mul_xi(&d2, &d2);
    f2_add(&den, &d1, &den); f2_add(&den, &d2, &den);
    f2_inv(&den, &den);
    f2_mul(&A, &den, &o->c0);
    f2_mul(&B, &den, &o->c1);
    f2_mul(&C, &den, &o->c2);
}

static void f12_mul(const F12c* a, const F12c* b, F12c* o) {
    F6c t0, t1, t2, t3;
    f6_mul(&a->c0, &b->c0, &t0);
    f6_mul(&a->c1, &b->c1, &t1);
    F12c r;
    f6_mul_v(&t1, &t2);
    f6_add(&t0, &t2, &r.c0);                     // a0b0 + v a1b1
    f6_add(&a->c0, &a->c1, &t2);
    f6_add(&b->c0, &b->c1, &t3);
    f6_mul(&t2, &t3, &t2);
    f6_sub(&t2, &t0, &t2);
    f6_sub(&t2, &t1, &r.c1);                     // a0b1 + a1b0
    *o = r;
}
static inline void f12_sq(const F12c* a, F12c* o) { f12_mul(a, a, o); }
static void f12_conj(const F12c* a, F12c* o) {   // = frobenius^6
    o->c0 = a->c0; f6_neg(&a->c1, &o->c1);
}
static void f12_inv(const F12c* a, F12c* o) {
    F6c t0, t1;
    f6_sq(&a->c0, &t0);
    f6_sq(&a->c1, &t1); f6_mul_v(&t1, &t1);
    f6_sub(&t0, &t1, &t0);                       // c0^2 - v c1^2
    f6_inv(&t0, &t0);
    f6_mul(&a->c0, &t0, &o->c0);
    f6_mul(&a->c1, &t0, &t1); f6_neg(&t1, &o->c1);
}
static int f12_is_one(const F12c* a) {
    if (memcmp(a->c0.c0.c0, g_fq.one, 32)) return 0;
    if (!is_zero4(a->c0.c0.c1)) return 0;
    return f2_is_zero(&a->c0.c1) && f2_is_zero(&a->c0.c2)
        && f2_is_zero(&a->c1.c0) && f2_is_zero(&a->c1.c1)
        && f2_is_zero(&a->c1.c2);
}

// frobenius^e for e in {1,2,3}: per-w^i coefficient conjugation + gamma.
// tower monomials: w^0 -> c0.c0, w^2 -> c0.c1, w^4 -> c0.c2,
//                  w^1 -> c1.c0, w^3 -> c1.c1, w^5 -> c1.c2
static void f12_frob(const F12c* a, int e, F12c* o) {
    const F2c* g = g_gamma[e - 1];
    F2c t[6];
    const F2c* in[6] = {&a->c0.c0, &a->c1.c0, &a->c0.c1,
                        &a->c1.c1, &a->c0.c2, &a->c1.c2};
    for (int i = 0; i < 6; ++i) {
        if (e & 1) f2_conj(in[i], &t[i]); else t[i] = *in[i];
        if (i > 0) f2_mul(&t[i], &g[i - 1], &t[i]);
    }
    o->c0.c0 = t[0]; o->c1.c0 = t[1]; o->c0.c1 = t[2];
    o->c1.c1 = t[3]; o->c0.c2 = t[4]; o->c1.c2 = t[5];
}

static void f12_pow_u64(const F12c* a, u64 e, F12c* o) {
    F12c acc, base = *a;
    memset(&acc, 0, sizeof(acc));
    memcpy(acc.c0.c0.c0, g_fq.one, 32);          // one
    while (e) {
        if (e & 1) f12_mul(&acc, &base, &acc);
        f12_mul(&base, &base, &base);
        e >>= 1;
    }
    *o = acc;
}

// line through twisted R, S evaluated at P=(xp, yp):
//   l = (-yp) + (m * xp) w + (y1 - m * x1) w^3   with slope m in Fq2
static void line_from_slope(const F2c* m, const F2c* x1, const F2c* y1,
                            const u64* xp, const u64* yp, F12c* o) {
    memset(o, 0, sizeof(F12c));
    u64 z[4] = {0, 0, 0, 0};
    f_sub(g_fq, z, yp, o->c0.c0.c0);             // -yp (Fq embeds at c0.c0.c0)
    f2_mul_fq(m, xp, &o->c1.c0);                 // m * xp at w^1
    F2c t;
    f2_mul(m, x1, &t);
    f2_sub(y1, &t, &o->c1.c1);                   // (y1 - m x1) at w^3
}

// vertical line x = x1 evaluated at P: l = xp - x1 w^2
static void line_vertical(const F2c* x1, const u64* xp, F12c* o) {
    memset(o, 0, sizeof(F12c));
    memcpy(o->c0.c0.c0, xp, 32);
    f2_neg(x1, &o->c0.c1);
}

struct G2Aff { F2c x, y; int inf; };

static void miller_step_line(const G2Aff* r, const G2Aff* s,
                             const u64* xp, const u64* yp, F12c* l,
                             G2Aff* out) {
    // line through r and s (tangent if equal), plus the affine sum
    if (f2_eq(&r->x, &s->x) && !f2_eq(&r->y, &s->y)) {
        line_vertical(&r->x, xp, l);
        out->inf = 1;
        memset(&out->x, 0, sizeof(F2c)); memset(&out->y, 0, sizeof(F2c));
        return;
    }
    F2c m, num, den;
    if (f2_eq(&r->x, &s->x)) {                   // tangent: m = 3x^2 / 2y
        f2_sq(&r->x, &num);
        F2c three;
        f2_add(&num, &num, &three); f2_add(&three, &num, &num);
        f2_add(&r->y, &r->y, &den);
    } else {                                     // chord
        f2_sub(&s->y, &r->y, &num);
        f2_sub(&s->x, &r->x, &den);
    }
    f2_inv(&den, &den);
    f2_mul(&num, &den, &m);
    line_from_slope(&m, &r->x, &r->y, xp, yp, l);
    F2c nx, ny, t;
    f2_sq(&m, &nx);
    f2_sub(&nx, &r->x, &nx); f2_sub(&nx, &s->x, &nx);
    f2_sub(&r->x, &nx, &t);
    f2_mul(&m, &t, &ny);
    f2_sub(&ny, &r->y, &ny);
    out->x = nx; out->y = ny; out->inf = 0;
}

static void g2_frob_aff(const G2Aff* q, G2Aff* o) {
    f2_conj(&q->x, &o->x); f2_mul(&o->x, &g_frob_x, &o->x);
    f2_conj(&q->y, &o->y); f2_mul(&o->y, &g_frob_y, &o->y);
    o->inf = q->inf;
}

static void miller_loop_aff(const G2Aff* q, const u64* xp, const u64* yp,
                            F12c* out) {
    F12c f, l;
    memset(&f, 0, sizeof(f));
    memcpy(f.c0.c0.c0, g_fq.one, 32);
    if (q->inf) { *out = f; return; }
    G2Aff r = *q;
    for (int i = 1; i < g_ate_nbits; ++i) {
        f12_mul(&f, &f, &f);
        miller_step_line(&r, &r, xp, yp, &l, &r);
        f12_mul(&f, &l, &f);
        if (g_ate_bits[i]) {
            miller_step_line(&r, q, xp, yp, &l, &r);
            f12_mul(&f, &l, &f);
        }
    }
    G2Aff q1, q2, nq2;
    g2_frob_aff(q, &q1);
    g2_frob_aff(&q1, &q2);
    nq2 = q2; f2_neg(&q2.y, &nq2.y);
    miller_step_line(&r, &q1, xp, yp, &l, &r);
    f12_mul(&f, &l, &f);
    miller_step_line(&r, &nq2, xp, yp, &l, &r);
    f12_mul(&f, &l, &f);
    *out = f;
}

static void final_exp(const F12c* in, F12c* out) {
    F12c m, t;
    // easy part: f^(p^6-1) then ^(p^2+1)
    f12_inv(in, &t);
    f12_conj(in, &m);
    f12_mul(&m, &t, &m);
    f12_frob(&m, 2, &t);
    f12_mul(&t, &m, &m);
    // hard part (Scott et al. chain, mirrors bn254.py final_exponentiate)
    F12c fx, fx2, fx3, y0, y1, y2, y3, y4, y5, y6, t0, t1;
    f12_pow_u64(&m, g_bn_x, &fx);
    f12_pow_u64(&fx, g_bn_x, &fx2);
    f12_pow_u64(&fx2, g_bn_x, &fx3);
    f12_frob(&m, 1, &y0); f12_frob(&m, 2, &t); f12_mul(&y0, &t, &y0);
    f12_frob(&m, 3, &t); f12_mul(&y0, &t, &y0);
    f12_conj(&m, &y1);
    f12_frob(&fx2, 2, &y2);
    f12_frob(&fx, 1, &y3); f12_conj(&y3, &y3);
    f12_frob(&fx2, 1, &y4); f12_mul(&fx, &y4, &y4); f12_conj(&y4, &y4);
    f12_conj(&fx2, &y5);
    f12_frob(&fx3, 1, &y6); f12_mul(&fx3, &y6, &y6); f12_conj(&y6, &y6);
    f12_sq(&y6, &t0); f12_mul(&t0, &y4, &t0); f12_mul(&t0, &y5, &t0);
    f12_mul(&y3, &y5, &t1); f12_mul(&t1, &t0, &t1);
    f12_mul(&t0, &y2, &t0);
    f12_sq(&t1, &t1); f12_mul(&t1, &t0, &t1); f12_sq(&t1, &t1);
    f12_mul(&t1, &y1, &t0);
    f12_mul(&t1, &y0, &t1);
    f12_sq(&t0, &t0);
    f12_mul(&t0, &t1, out);
}

extern "C" {

// gammas: [3][5] F2 (e=1..3, i=1..5); frob_xy: 2 F2; all Montgomery.
// ate_bits: MSB-first bit array of the ate loop count.
void cap_pairing_init(const u64* gammas, const u64* frob_xy, u64 bn_x,
                      const int* ate_bits, int n_ate_bits, const u64* nine) {
    memcpy(g_gamma, gammas, sizeof(g_gamma));
    memcpy(&g_frob_x, frob_xy, sizeof(F2c));
    memcpy(&g_frob_y, frob_xy + 8, sizeof(F2c));
    g_bn_x = bn_x;
    g_ate_nbits = n_ate_bits;
    for (int i = 0; i < n_ate_bits; ++i) g_ate_bits[i] = ate_bits[i];
    memcpy(g_fq_nine, nine, 32);
}

// g1: n x 8 u64 (x, y Montgomery affine); g2: n x 16 u64 (x.c0 x.c1 y.c0
// y.c1 Montgomery); skip: n ints (1 = identity pair, contribute 1).
// Returns 1 iff prod e(P_i, Q_i) == 1.
int cap_pairing_check(const u64* g1, const u64* g2, const int* skip, int n) {
    F12c acc, f;
    memset(&acc, 0, sizeof(acc));
    memcpy(acc.c0.c0.c0, g_fq.one, 32);
    for (int i = 0; i < n; ++i) {
        if (skip[i]) continue;
        G2Aff q;
        memcpy(&q.x, g2 + 16 * i, 64);
        memcpy(&q.y, g2 + 16 * i + 8, 64);
        q.inf = 0;
        miller_loop_aff(&q, g1 + 8 * i, g1 + 8 * i + 4, &f);
        f12_mul(&acc, &f, &acc);
    }
    final_exp(&acc, &acc);
    return f12_is_one(&acc);
}


}  // extern "C"
