/* Native host curve runtime for marlin_tpu: BLS12-381 G1/G2 group math.
 *
 * The reference reaches ark-ec's fixed-base/variable-base MSMs through
 * every PC::setup / PC::commit call (SURVEY.md §2b row 2); the TPU build
 * keeps large variable-base MSMs on the accelerator (ops/msm.py) and uses
 * this library for the host-side group work that is latency- rather than
 * throughput-bound:
 *   - powers-of-tau SRS generation (G1 and gamma G1 fixed-base powers;
 *     reference PC::setup, src/lib.rs:93)
 *   - negative powers of tau in G2 for the Sonic variant's verifier key
 *     (ark sonic_pc setup emits them; the SRS must not retain tau)
 *   - small variable-base G1 MSMs (verifier-side combines, tiny commits)
 *
 * Field: 6x64-bit-limb Montgomery (CIOS with __uint128_t), Fq2 = Fq[u]/(u^2+1).
 * Points: Jacobian, identity <=> Z == 0.  ABI: canonical little-endian u64
 * limbs at the boundary (no Montgomery leakage), scalars 4x64-bit.
 *
 * Build: cc -O3 -shared -fPIC -o libmarlin_curve.so marlin_curve.c
 */

#include <stddef.h>
#include <stdint.h>
#include <string.h>
#include <stdlib.h>

typedef uint64_t fp[6];
typedef __uint128_t u128;

static const fp FP_P = {0xb9feffffffffaaabULL, 0x1eabfffeb153ffffULL, 0x6730d2a0f6b0f624ULL,
                        0x64774b84f38512bfULL, 0x4b1ba7b6434bacd7ULL, 0x1a0111ea397fe69aULL};
static const fp FP_R2 = {0xf4df1f341c341746ULL, 0x0a76e6a609d104f1ULL, 0x8de5476c4c95b6d5ULL,
                         0x67eb88a9939d83c0ULL, 0x9a793e85b519952dULL, 0x11988fe592cae3aaULL};
static const fp FP_ONE = {0x760900000002fffdULL, 0xebf4000bc40c0002ULL, 0x5f48985753c758baULL,
                          0x77ce585370525745ULL, 0x5c071a97a256ec6dULL, 0x15f65ec3fa80e493ULL};
static const uint64_t FP_NINV = 0x89f3fffcfffcfffdULL;

static void fp_copy(fp r, const fp a) { memcpy(r, a, sizeof(fp)); }
static void fp_zero(fp r) { memset(r, 0, sizeof(fp)); }
static int fp_is_zero(const fp a) {
    uint64_t x = 0;
    for (int i = 0; i < 6; i++) x |= a[i];
    return x == 0;
}
static int fp_eq(const fp a, const fp b) { return memcmp(a, b, sizeof(fp)) == 0; }

static int fp_geq_p(const fp a) {
    for (int i = 5; i >= 0; i--) {
        if (a[i] > FP_P[i]) return 1;
        if (a[i] < FP_P[i]) return 0;
    }
    return 1;
}

static void fp_sub_p(fp a) {
    u128 borrow = 0;
    for (int i = 0; i < 6; i++) {
        u128 d = (u128)a[i] - FP_P[i] - borrow;
        a[i] = (uint64_t)d;
        borrow = (d >> 64) & 1;
    }
}

static void fp_add(fp r, const fp a, const fp b) {
    u128 carry = 0;
    for (int i = 0; i < 6; i++) {
        u128 s = (u128)a[i] + b[i] + carry;
        r[i] = (uint64_t)s;
        carry = s >> 64;
    }
    if (carry || fp_geq_p(r)) fp_sub_p(r);
}

static void fp_sub(fp r, const fp a, const fp b) {
    u128 borrow = 0;
    for (int i = 0; i < 6; i++) {
        u128 d = (u128)a[i] - b[i] - borrow;
        r[i] = (uint64_t)d;
        borrow = (d >> 64) & 1;
    }
    if (borrow) {
        u128 carry = 0;
        for (int i = 0; i < 6; i++) {
            u128 s = (u128)r[i] + FP_P[i] + carry;
            r[i] = (uint64_t)s;
            carry = s >> 64;
        }
    }
}

static void fp_dbl(fp r, const fp a) { fp_add(r, a, a); }

static void fp_neg(fp r, const fp a) {
    if (fp_is_zero(a)) { fp_zero(r); return; }
    fp t;
    fp_copy(t, a);
    u128 borrow = 0;
    for (int i = 0; i < 6; i++) {
        u128 d = (u128)FP_P[i] - t[i] - borrow;
        r[i] = (uint64_t)d;
        borrow = (d >> 64) & 1;
    }
}

/* CIOS Montgomery product */
static void fp_mul(fp r, const fp a, const fp b) {
    uint64_t t[8];
    memset(t, 0, sizeof(t));
    for (int i = 0; i < 6; i++) {
        u128 c = 0;
        for (int j = 0; j < 6; j++) {
            u128 s = (u128)a[i] * b[j] + t[j] + (uint64_t)c;
            t[j] = (uint64_t)s;
            c = s >> 64;
        }
        u128 s = (u128)t[6] + (uint64_t)c;
        t[6] = (uint64_t)s;
        t[7] = (uint64_t)(s >> 64);
        uint64_t m = t[0] * FP_NINV;
        c = ((u128)m * FP_P[0] + t[0]) >> 64;
        for (int j = 1; j < 6; j++) {
            u128 s2 = (u128)m * FP_P[j] + t[j] + (uint64_t)c;
            t[j - 1] = (uint64_t)s2;
            c = s2 >> 64;
        }
        s = (u128)t[6] + (uint64_t)c;
        t[5] = (uint64_t)s;
        t[6] = t[7] + (uint64_t)(s >> 64);
        t[7] = 0;
    }
    if (t[6] || fp_geq_p(t)) fp_sub_p(t);
    memcpy(r, t, sizeof(fp));
}

static void fp_sqr(fp r, const fp a) { fp_mul(r, a, a); }

static void fp_to_mont(fp r, const fp a) { fp_mul(r, a, FP_R2); }
static void fp_from_mont(fp r, const fp a) {
    fp one = {1, 0, 0, 0, 0, 0};
    fp_mul(r, a, one);
}

/* Fermat inversion: a^(p-2); 0 -> 0.  Montgomery in/out. */
static void fp_inv(fp r, const fp a) {
    /* p - 2 */
    fp e;
    fp_copy(e, FP_P);
    e[0] -= 2; /* p is odd and > 2, no borrow */
    fp acc;
    fp_copy(acc, FP_ONE);
    fp base;
    fp_copy(base, a);
    for (int i = 0; i < 381; i++) {
        if ((e[i / 64] >> (i % 64)) & 1) fp_mul(acc, acc, base);
        fp_sqr(base, base);
    }
    if (fp_is_zero(a)) fp_zero(acc);
    fp_copy(r, acc);
}

/* ------------------------------------------------------------------ */
/* Fq2 = Fq[u] / (u^2 + 1) */

typedef struct { fp c0, c1; } fp2;

static void fp2_copy(fp2 *r, const fp2 *a) { *r = *a; }
static void fp2_zero(fp2 *r) { fp_zero(r->c0); fp_zero(r->c1); }
static int fp2_is_zero(const fp2 *a) { return fp_is_zero(a->c0) && fp_is_zero(a->c1); }
static int fp2_eq(const fp2 *a, const fp2 *b) { return fp_eq(a->c0, b->c0) && fp_eq(a->c1, b->c1); }
static void fp2_one(fp2 *r) { fp_copy(r->c0, FP_ONE); fp_zero(r->c1); }

static void fp2_add(fp2 *r, const fp2 *a, const fp2 *b) {
    fp_add(r->c0, a->c0, b->c0);
    fp_add(r->c1, a->c1, b->c1);
}
static void fp2_sub(fp2 *r, const fp2 *a, const fp2 *b) {
    fp_sub(r->c0, a->c0, b->c0);
    fp_sub(r->c1, a->c1, b->c1);
}
static void fp2_dbl(fp2 *r, const fp2 *a) { fp2_add(r, a, a); }
static void fp2_neg(fp2 *r, const fp2 *a) { fp_neg(r->c0, a->c0); fp_neg(r->c1, a->c1); }

static void fp2_mul(fp2 *r, const fp2 *a, const fp2 *b) {
    /* Karatsuba: (a0 b0 - a1 b1, (a0+a1)(b0+b1) - a0 b0 - a1 b1) */
    fp v0, v1, s, t, out0;
    fp_mul(v0, a->c0, b->c0);
    fp_mul(v1, a->c1, b->c1);
    fp_add(s, a->c0, a->c1);
    fp_add(t, b->c0, b->c1);
    fp_sub(out0, v0, v1);
    fp_mul(s, s, t);
    fp_sub(s, s, v0);
    fp_sub(r->c1, s, v1);
    fp_copy(r->c0, out0);
}

static void fp2_sqr(fp2 *r, const fp2 *a) {
    /* (a0+a1)(a0-a1), 2 a0 a1 */
    fp s, d, m;
    fp_add(s, a->c0, a->c1);
    fp_sub(d, a->c0, a->c1);
    fp_mul(m, a->c0, a->c1);
    fp_mul(r->c0, s, d);
    fp_dbl(r->c1, m);
}

static void fp2_inv(fp2 *r, const fp2 *a) {
    /* 1/(a0 + a1 u) = (a0 - a1 u)/(a0^2 + a1^2) */
    fp n0, n1, n, ninv;
    fp_sqr(n0, a->c0);
    fp_sqr(n1, a->c1);
    fp_add(n, n0, n1);
    fp_inv(ninv, n);
    fp_mul(r->c0, a->c0, ninv);
    fp_mul(n1, a->c1, ninv);
    fp_neg(r->c1, n1);
}

/* ------------------------------------------------------------------ */
/* Generic Jacobian group law via macros over the two field types.      */

typedef struct { fp x, y, z; } g1_t;
typedef struct { fp2 x, y, z; } g2_t;

#define DEFINE_GROUP(G, F, f_copy, f_zero, f_is_zero, f_eq, f_one, f_add, f_sub, f_dbl, f_neg, \
                     f_mul, f_sqr, f_inv)                                                      \
    static void G##_set_identity(G##_t *p) {                                                   \
        f_zero(X(p->x));                                                                       \
        f_one(X(p->y));                                                                        \
        f_zero(X(p->z));                                                                       \
    }                                                                                          \
    static int G##_is_identity(const G##_t *p) { return f_is_zero(X(p->z)); }                  \
    static void G##_double(G##_t *r, const G##_t *p) {                                         \
        if (G##_is_identity(p) || f_is_zero(X(p->y))) {                                        \
            G##_set_identity(r);                                                               \
            return;                                                                            \
        }                                                                                      \
        F a, b, c, d, e, f0, t, x3, y3, z3;                                                    \
        f_sqr(X(a), X(p->x));                                                                  \
        f_sqr(X(b), X(p->y));                                                                  \
        f_sqr(X(c), X(b));                                                                     \
        f_add(X(t), X(p->x), X(b));                                                            \
        f_sqr(X(t), X(t));                                                                     \
        f_sub(X(t), X(t), X(a));                                                               \
        f_sub(X(t), X(t), X(c));                                                               \
        f_dbl(X(d), X(t));                                                                     \
        f_dbl(X(e), X(a));                                                                     \
        f_add(X(e), X(e), X(a));                                                               \
        f_sqr(X(f0), X(e));                                                                    \
        f_dbl(X(t), X(d));                                                                     \
        f_sub(X(x3), X(f0), X(t));                                                             \
        f_dbl(X(t), X(c));                                                                     \
        f_dbl(X(t), X(t));                                                                     \
        f_dbl(X(t), X(t));                                                                     \
        f_sub(X(y3), X(d), X(x3));                                                             \
        f_mul(X(y3), X(e), X(y3));                                                             \
        f_sub(X(y3), X(y3), X(t));                                                             \
        f_mul(X(z3), X(p->y), X(p->z));                                                        \
        f_dbl(X(z3), X(z3));                                                                   \
        f_copy(X(r->x), X(x3));                                                                \
        f_copy(X(r->y), X(y3));                                                                \
        f_copy(X(r->z), X(z3));                                                                \
    }                                                                                          \
    static void G##_add(G##_t *r, const G##_t *p, const G##_t *q) {                            \
        if (G##_is_identity(p)) {                                                              \
            *r = *q;                                                                           \
            return;                                                                            \
        }                                                                                      \
        if (G##_is_identity(q)) {                                                              \
            *r = *p;                                                                           \
            return;                                                                            \
        }                                                                                      \
        F z1z1, z2z2, u1, u2, s1, s2, h, i, j, rr, v, t, x3, y3, z3;                           \
        f_sqr(X(z1z1), X(p->z));                                                               \
        f_sqr(X(z2z2), X(q->z));                                                               \
        f_mul(X(u1), X(p->x), X(z2z2));                                                        \
        f_mul(X(u2), X(q->x), X(z1z1));                                                        \
        f_mul(X(s1), X(p->y), X(q->z));                                                        \
        f_mul(X(s1), X(s1), X(z2z2));                                                          \
        f_mul(X(s2), X(q->y), X(p->z));                                                        \
        f_mul(X(s2), X(s2), X(z1z1));                                                          \
        f_sub(X(h), X(u2), X(u1));                                                             \
        f_sub(X(rr), X(s2), X(s1));                                                            \
        if (f_is_zero(X(h))) {                                                                 \
            if (f_is_zero(X(rr))) {                                                            \
                G##_double(r, p);                                                              \
                return;                                                                        \
            }                                                                                  \
            G##_set_identity(r);                                                               \
            return;                                                                            \
        }                                                                                      \
        f_dbl(X(t), X(h));                                                                     \
        f_sqr(X(i), X(t));                                                                     \
        f_mul(X(j), X(h), X(i));                                                               \
        f_dbl(X(rr), X(rr));                                                                   \
        f_mul(X(v), X(u1), X(i));                                                              \
        f_sqr(X(x3), X(rr));                                                                   \
        f_sub(X(x3), X(x3), X(j));                                                             \
        f_dbl(X(t), X(v));                                                                     \
        f_sub(X(x3), X(x3), X(t));                                                             \
        f_sub(X(y3), X(v), X(x3));                                                             \
        f_mul(X(y3), X(rr), X(y3));                                                            \
        f_mul(X(t), X(s1), X(j));                                                              \
        f_dbl(X(t), X(t));                                                                     \
        f_sub(X(y3), X(y3), X(t));                                                             \
        f_add(X(z3), X(p->z), X(q->z));                                                        \
        f_sqr(X(z3), X(z3));                                                                   \
        f_sub(X(z3), X(z3), X(z1z1));                                                          \
        f_sub(X(z3), X(z3), X(z2z2));                                                          \
        f_mul(X(z3), X(z3), X(h));                                                             \
        f_copy(X(r->x), X(x3));                                                                \
        f_copy(X(r->y), X(y3));                                                                \
        f_copy(X(r->z), X(z3));                                                                \
    }

/* fp "one" needs a shim matching f_one(dst) */
static void fp_copy_one(fp r) { fp_copy(r, FP_ONE); }
static void fp2_one_shim(fp2 *r) { fp2_one(r); }

/* X() adapts lvalue syntax: fp is an array (decays to pointer), fp2 needs & */
#define X(v) (v)
DEFINE_GROUP(g1, fp, fp_copy, fp_zero, fp_is_zero, fp_eq, fp_copy_one, fp_add, fp_sub,
             fp_dbl, fp_neg, fp_mul, fp_sqr, fp_inv)
#undef X

#define X(v) (&(v))
DEFINE_GROUP(g2, fp2, fp2_copy, fp2_zero, fp2_is_zero, fp2_eq, fp2_one_shim, fp2_add, fp2_sub,
             fp2_dbl, fp2_neg, fp2_mul, fp2_sqr, fp2_inv)
#undef X

/* ------------------------------------------------------------------ */
/* boundary conversions (canonical LE u64 limbs <-> Montgomery)        */

static void g1_from_affine_limbs(g1_t *p, const uint64_t *xy /*12*/, int infinity) {
    if (infinity) { g1_set_identity(p); return; }
    fp_to_mont(p->x, xy);
    fp_to_mont(p->y, xy + 6);
    fp_copy(p->z, FP_ONE);
}

static void g2_from_affine_limbs(g2_t *p, const uint64_t *xy /*24*/, int infinity) {
    if (infinity) { g2_set_identity(p); return; }
    fp_to_mont(p->x.c0, xy);
    fp_to_mont(p->x.c1, xy + 6);
    fp_to_mont(p->y.c0, xy + 12);
    fp_to_mont(p->y.c1, xy + 18);
    fp2_one(&p->z);
}

/* batch-normalize n G1 points to affine canonical limbs; out[i*12..],
 * inf flag written to out_inf[i].  Montgomery-trick shared inversion. */
static void g1_batch_to_affine(const g1_t *pts, size_t n, uint64_t *out, uint8_t *out_inf) {
    fp *prefix = (fp *)malloc(sizeof(fp) * (n + 1));
    fp_copy(prefix[0], FP_ONE);
    for (size_t i = 0; i < n; i++) {
        if (fp_is_zero(pts[i].z)) fp_copy(prefix[i + 1], prefix[i]);
        else fp_mul(prefix[i + 1], prefix[i], pts[i].z);
    }
    fp inv_all;
    fp_inv(inv_all, prefix[n]);
    for (size_t ii = n; ii-- > 0;) {
        if (fp_is_zero(pts[ii].z)) {
            out_inf[ii] = 1;
            memset(out + ii * 12, 0, 12 * sizeof(uint64_t));
            continue;
        }
        fp zinv, zinv2, t;
        fp_mul(zinv, inv_all, prefix[ii]);
        fp_mul(inv_all, inv_all, pts[ii].z);
        out_inf[ii] = 0;
        fp_sqr(zinv2, zinv);
        fp_mul(t, pts[ii].x, zinv2);
        fp_from_mont(t, t);
        memcpy(out + ii * 12, t, sizeof(fp));
        fp_mul(zinv2, zinv2, zinv);
        fp_mul(t, pts[ii].y, zinv2);
        fp_from_mont(t, t);
        memcpy(out + ii * 12 + 6, t, sizeof(fp));
    }
    free(prefix);
}

static void g2_batch_to_affine(const g2_t *pts, size_t n, uint64_t *out, uint8_t *out_inf) {
    fp2 *prefix = (fp2 *)malloc(sizeof(fp2) * (n + 1));
    fp2_one(&prefix[0]);
    for (size_t i = 0; i < n; i++) {
        if (fp2_is_zero(&pts[i].z)) prefix[i + 1] = prefix[i];
        else fp2_mul(&prefix[i + 1], &prefix[i], &pts[i].z);
    }
    fp2 inv_all;
    fp2_inv(&inv_all, &prefix[n]);
    for (size_t ii = n; ii-- > 0;) {
        if (fp2_is_zero(&pts[ii].z)) {
            out_inf[ii] = 1;
            memset(out + ii * 24, 0, 24 * sizeof(uint64_t));
            continue;
        }
        fp2 zinv, zinv2, t;
        fp2_mul(&zinv, &inv_all, &prefix[ii]);
        fp2_mul(&inv_all, &inv_all, &pts[ii].z);
        out_inf[ii] = 0;
        fp2_sqr(&zinv2, &zinv);
        fp2_mul(&t, &pts[ii].x, &zinv2);
        fp c;
        fp_from_mont(c, t.c0); memcpy(out + ii * 24, c, sizeof(fp));
        fp_from_mont(c, t.c1); memcpy(out + ii * 24 + 6, c, sizeof(fp));
        fp2_mul(&zinv2, &zinv2, &zinv);
        fp2_mul(&t, &pts[ii].y, &zinv2);
        fp_from_mont(c, t.c0); memcpy(out + ii * 24 + 12, c, sizeof(fp));
        fp_from_mont(c, t.c1); memcpy(out + ii * 24 + 18, c, sizeof(fp));
    }
    free(prefix);
}

/* ------------------------------------------------------------------ */
/* fixed-base windowed powers:  out[i] = scalars[i] * base              */

#define FB_WINDOW 8
#define FB_TSIZE (1 << FB_WINDOW) /* 256; entries 1..255 used */
#define FB_NWIN ((256 + FB_WINDOW - 1) / FB_WINDOW)

/* scalars: n x 4 u64 (canonical, < r).  out: n x 12 u64 affine + inf[n]. */
void marlin_g1_fixed_powers(const uint64_t *base_xy, const uint64_t *scalars, size_t n,
                            uint64_t *out, uint8_t *out_inf) {
    g1_t base;
    g1_from_affine_limbs(&base, base_xy, 0);
    /* table[w][d] = d * 2^(8w) * base, d in 1..255 */
    g1_t (*table)[FB_TSIZE] = malloc(sizeof(g1_t) * FB_NWIN * FB_TSIZE);
    g1_t row_base = base;
    for (int w = 0; w < FB_NWIN; w++) {
        g1_set_identity(&table[w][0]);
        table[w][1] = row_base;
        for (int d = 2; d < FB_TSIZE; d++) g1_add(&table[w][d], &table[w][d - 1], &row_base);
        for (int b = 0; b < FB_WINDOW; b++) g1_double(&row_base, &row_base);
    }
    g1_t *acc = (g1_t *)malloc(sizeof(g1_t) * n);
    for (size_t i = 0; i < n; i++) {
        g1_t s;
        g1_set_identity(&s);
        const uint64_t *sc = scalars + i * 4;
        for (int w = 0; w < FB_NWIN; w++) {
            int bit = w * FB_WINDOW;
            int limb = bit / 64, off = bit % 64;
            uint64_t d = (sc[limb] >> off);
            if (off > 64 - FB_WINDOW && limb + 1 < 4) d |= sc[limb + 1] << (64 - off);
            d &= (FB_TSIZE - 1);
            if (d) g1_add(&s, &s, &table[w][d]);
        }
        acc[i] = s;
    }
    g1_batch_to_affine(acc, n, out, out_inf);
    free(acc);
    free(table);
}

void marlin_g2_fixed_powers(const uint64_t *base_xy, const uint64_t *scalars, size_t n,
                            uint64_t *out, uint8_t *out_inf) {
    g2_t base;
    g2_from_affine_limbs(&base, base_xy, 0);
    g2_t (*table)[FB_TSIZE] = malloc(sizeof(g2_t) * FB_NWIN * FB_TSIZE);
    g2_t row_base = base;
    for (int w = 0; w < FB_NWIN; w++) {
        g2_set_identity(&table[w][0]);
        table[w][1] = row_base;
        for (int d = 2; d < FB_TSIZE; d++) g2_add(&table[w][d], &table[w][d - 1], &row_base);
        for (int b = 0; b < FB_WINDOW; b++) g2_double(&row_base, &row_base);
    }
    g2_t *acc = (g2_t *)malloc(sizeof(g2_t) * n);
    for (size_t i = 0; i < n; i++) {
        g2_t s;
        g2_set_identity(&s);
        const uint64_t *sc = scalars + i * 4;
        for (int w = 0; w < FB_NWIN; w++) {
            int bit = w * FB_WINDOW;
            int limb = bit / 64, off = bit % 64;
            uint64_t d = (sc[limb] >> off);
            if (off > 64 - FB_WINDOW && limb + 1 < 4) d |= sc[limb + 1] << (64 - off);
            d &= (FB_TSIZE - 1);
            if (d) g2_add(&s, &s, &table[w][d]);
        }
        acc[i] = s;
    }
    g2_batch_to_affine(acc, n, out, out_inf);
    free(acc);
    free(table);
}

/* ------------------------------------------------------------------ */
/* variable-base G1 MSM (Pippenger).  points: n x 12 canonical affine   */
/* (inf[i] nonzero = identity), scalars n x 4.  out: 12 + inf flag.     */

void marlin_g1_msm(const uint64_t *points, const uint8_t *inf, const uint64_t *scalars, size_t n,
                   uint64_t *out, uint8_t *out_inf) {
    int log2n = 0;
    { size_t m = n; while (m >>= 1) log2n++; }
    int c = log2n - 3;
    if (c < 2) c = 2;
    if (c > 16) c = 16;
    int nwin = (256 + c - 1) / c;
    size_t nb = (size_t)1 << c;
    g1_t *pts = (g1_t *)malloc(sizeof(g1_t) * n);
    for (size_t i = 0; i < n; i++) g1_from_affine_limbs(&pts[i], points + i * 12, inf && inf[i]);
    /* windows are independent (rayon's parallel MSM splits the same way):
       each thread owns one window's bucket array and produces its partial
       sum; the 2^(cw) scaling + final accumulation happen afterwards. */
    g1_t *wsum = (g1_t *)malloc(sizeof(g1_t) * nwin);
#pragma omp parallel for schedule(dynamic) if (n >= 512)
    for (int w = 0; w < nwin; w++) {
        g1_t *buckets = (g1_t *)malloc(sizeof(g1_t) * nb);
        for (size_t b = 0; b < nb; b++) g1_set_identity(&buckets[b]);
        for (size_t i = 0; i < n; i++) {
            const uint64_t *sc = scalars + i * 4;
            int bit = w * c;
            int limb = bit / 64, off = bit % 64;
            if (limb >= 4) continue;
            uint64_t d = sc[limb] >> off;
            if (off > 64 - c && limb + 1 < 4) d |= sc[limb + 1] << (64 - off);
            d &= (nb - 1);
            if (d) g1_add(&buckets[d], &buckets[d], &pts[i]);
        }
        g1_t running, acc;
        g1_set_identity(&running);
        g1_set_identity(&acc);
        for (size_t b = nb - 1; b >= 1; b--) {
            g1_add(&running, &running, &buckets[b]);
            g1_add(&acc, &acc, &running);
        }
        wsum[w] = acc;
        free(buckets);
    }
    g1_t total;
    g1_set_identity(&total);
    for (int w = nwin - 1; w >= 0; w--) {
        for (int b = 0; b < c; b++) g1_double(&total, &total);
        g1_add(&total, &total, &wsum[w]);
    }
    g1_batch_to_affine(&total, 1, out, out_inf);
    free(wsum);
    free(pts);
}

/* single G2 scalar mul (verifier-side helper): out affine canonical */
void marlin_g2_mul(const uint64_t *base_xy, const uint64_t *scalar /*4*/, uint64_t *out,
                   uint8_t *out_inf) {
    g2_t base, acc;
    g2_from_affine_limbs(&base, base_xy, 0);
    g2_set_identity(&acc);
    for (int i = 255; i >= 0; i--) {
        g2_double(&acc, &acc);
        if ((scalar[i / 64] >> (i % 64)) & 1) g2_add(&acc, &acc, &base);
    }
    g2_batch_to_affine(&acc, 1, out, out_inf);
}

/* single G1 scalar mul */
void marlin_g1_mul(const uint64_t *base_xy, const uint64_t *scalar /*4*/, uint64_t *out,
                   uint8_t *out_inf) {
    g1_t base, acc;
    g1_from_affine_limbs(&base, base_xy, 0);
    g1_set_identity(&acc);
    for (int i = 255; i >= 0; i--) {
        g1_double(&acc, &acc);
        if ((scalar[i / 64] >> (i % 64)) & 1) g1_add(&acc, &acc, &base);
    }
    g1_batch_to_affine(&acc, 1, out, out_inf);
}
