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

/* Straus/wNAF (w=5) for small batches: one shared doubling chain plus a
 * 16-entry odd-multiple table per point.  ~n*(15 + 43) adds + 256 doubles
 * versus windowed-bucket's ~n*60 + windows*buckets combine — the combine
 * overhead dominates exactly in the verifier's ~25-point regime
 * (PC::check_combinations commitment/witness accumulations). */
static void g1_msm_straus(const g1_t *pts, const uint64_t *scalars, size_t n, g1_t *total) {
    const int W = 5, TAB = 16; /* odd multiples 1P..31P */
    g1_t *tab = (g1_t *)malloc(sizeof(g1_t) * n * TAB);
    int8_t *naf = (int8_t *)malloc(n * 320);
    memset(naf, 0, n * 320);
    int maxbit = 0;
    for (size_t i = 0; i < n; i++) {
        g1_t twice;
        tab[i * TAB] = pts[i];
        g1_double(&twice, &pts[i]);
        for (int k = 1; k < TAB; k++) g1_add(&tab[i * TAB + k], &tab[i * TAB + k - 1], &twice);
        /* wNAF recode: scalar as 4 LE u64 limbs */
        uint64_t e[5] = {scalars[i * 4], scalars[i * 4 + 1], scalars[i * 4 + 2],
                         scalars[i * 4 + 3], 0};
        int pos = 0;
        while (pos < 300) {
            int limb = pos / 64, off = pos % 64;
            uint64_t word = e[limb] >> off;
            if (off && limb + 1 < 5) word |= e[limb + 1] << (64 - off);
            if (!(word & 1)) {
                if (!(e[0] | e[1] | e[2] | e[3] | e[4])) break;
                pos++;
                continue;
            }
            int d = (int)(word & ((1u << (W + 1)) - 1)); /* low W+1 bits */
            if (d >= (1 << W)) d -= (1 << (W + 1));      /* centered odd digit */
            naf[i * 320 + pos] = (int8_t)d;
            if (pos > maxbit) maxbit = pos;
            /* e -= d << pos */
            if (d > 0) {
                uint64_t bor = 0, sub = (uint64_t)d << off;
                for (int l = limb; l < 5; l++) {
                    u128 dd = (u128)e[l] - (l == limb ? sub : (l == limb + 1 && off ? ((uint64_t)d >> (64 - off)) : 0)) - bor;
                    e[l] = (uint64_t)dd;
                    bor = (dd >> 64) & 1;
                }
            } else {
                uint64_t car = 0, add = (uint64_t)(-d) << off;
                for (int l = limb; l < 5; l++) {
                    u128 ss = (u128)e[l] + (l == limb ? add : (l == limb + 1 && off ? ((uint64_t)(-d) >> (64 - off)) : 0)) + car;
                    e[l] = (uint64_t)ss;
                    car = (uint64_t)(ss >> 64);
                }
            }
            pos += W;
        }
    }
    g1_set_identity(total);
    for (int b = maxbit; b >= 0; b--) {
        g1_double(total, total);
        for (size_t i = 0; i < n; i++) {
            int d = naf[i * 320 + b];
            if (!d) continue;
            if (d > 0) {
                g1_add(total, total, &tab[i * TAB + (d - 1) / 2]);
            } else {
                g1_t neg = tab[i * TAB + (-d - 1) / 2];
                fp_neg(neg.y, neg.y);
                g1_add(total, total, &neg);
            }
        }
    }
    free(tab);
    free(naf);
}

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
    if (n < 64) {
        /* verifier-size batches: Straus/wNAF beats windowed buckets */
        g1_t total;
        g1_msm_straus(pts, scalars, n, &total);
        g1_batch_to_affine(&total, 1, out, out_inf);
        free(pts);
        return;
    }
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

/* ------------------------------------------------------------------ */
/* Pairing: Fq6/Fq12 tower, ate Miller loop in twist coordinates, and  */
/* the final exponentiation.  Mirrors fields/host_pairing.py op-for-op */
/* (the reference reaches pairings only through PC::check_combinations,*/
/* reference src/lib.rs:413-423); outputs are bit-identical to the     */
/* Python tower so the parity test can compare raw Fq12 values.        */
/* Tower: Fq2 = Fq[u]/(u^2+1), Fq6 = Fq2[v]/(v^3 - xi), xi = u+1,      */
/* Fq12 = Fq6[w]/(w^2 - v).                                            */

typedef struct { fp2 c0, c1, c2; } fp6;
typedef struct { fp6 c0, c1; } fp12;

/* xi = 1 + u:  (a0 - a1, a0 + a1) */
static void fp2_mul_by_xi(fp2 *r, const fp2 *a) {
    fp t0, t1;
    fp_sub(t0, a->c0, a->c1);
    fp_add(t1, a->c0, a->c1);
    fp_copy(r->c0, t0);
    fp_copy(r->c1, t1);
}

static void fp2_mul_fp(fp2 *r, const fp2 *a, const fp s) {
    fp_mul(r->c0, a->c0, s);
    fp_mul(r->c1, a->c1, s);
}

static void fp2_conj(fp2 *r, const fp2 *a) {
    fp_copy(r->c0, a->c0);
    fp_neg(r->c1, a->c1);
}

static void fp6_zero(fp6 *r) { fp2_zero(&r->c0); fp2_zero(&r->c1); fp2_zero(&r->c2); }
static void fp6_one(fp6 *r) { fp2_one(&r->c0); fp2_zero(&r->c1); fp2_zero(&r->c2); }

static void fp6_add(fp6 *r, const fp6 *a, const fp6 *b) {
    fp2_add(&r->c0, &a->c0, &b->c0);
    fp2_add(&r->c1, &a->c1, &b->c1);
    fp2_add(&r->c2, &a->c2, &b->c2);
}
static void fp6_sub(fp6 *r, const fp6 *a, const fp6 *b) {
    fp2_sub(&r->c0, &a->c0, &b->c0);
    fp2_sub(&r->c1, &a->c1, &b->c1);
    fp2_sub(&r->c2, &a->c2, &b->c2);
}
static void fp6_neg(fp6 *r, const fp6 *a) {
    fp2_neg(&r->c0, &a->c0);
    fp2_neg(&r->c1, &a->c1);
    fp2_neg(&r->c2, &a->c2);
}

static void fp6_mul(fp6 *r, const fp6 *a, const fp6 *b) {
    /* Karatsuba (Toom-style) — host_pairing.fq6_mul */
    fp2 t0, t1, t2, s, t, u_;
    fp2_mul(&t0, &a->c0, &b->c0);
    fp2_mul(&t1, &a->c1, &b->c1);
    fp2_mul(&t2, &a->c2, &b->c2);
    fp2 c0, c1, c2;
    /* c0 = t0 + xi*((a1+a2)(b1+b2) - t1 - t2) */
    fp2_add(&s, &a->c1, &a->c2);
    fp2_add(&t, &b->c1, &b->c2);
    fp2_mul(&u_, &s, &t);
    fp2_sub(&u_, &u_, &t1);
    fp2_sub(&u_, &u_, &t2);
    fp2_mul_by_xi(&u_, &u_);
    fp2_add(&c0, &t0, &u_);
    /* c1 = (a0+a1)(b0+b1) - t0 - t1 + xi*t2 */
    fp2_add(&s, &a->c0, &a->c1);
    fp2_add(&t, &b->c0, &b->c1);
    fp2_mul(&u_, &s, &t);
    fp2_sub(&u_, &u_, &t0);
    fp2_sub(&u_, &u_, &t1);
    fp2 xt2;
    fp2_mul_by_xi(&xt2, &t2);
    fp2_add(&c1, &u_, &xt2);
    /* c2 = (a0+a2)(b0+b2) - t0 - t2 + t1 */
    fp2_add(&s, &a->c0, &a->c2);
    fp2_add(&t, &b->c0, &b->c2);
    fp2_mul(&u_, &s, &t);
    fp2_sub(&u_, &u_, &t0);
    fp2_sub(&u_, &u_, &t2);
    fp2_add(&c2, &u_, &t1);
    r->c0 = c0; r->c1 = c1; r->c2 = c2;
}

static void fp6_sqr(fp6 *r, const fp6 *a) {
    /* CH-SQR2 — host_pairing.fq6_sqr */
    fp2 s0, s1, s2, s3, s4, t;
    fp2_sqr(&s0, &a->c0);
    fp2_mul(&s1, &a->c0, &a->c1);
    fp2_dbl(&s1, &s1);
    fp2_sub(&t, &a->c0, &a->c1);
    fp2_add(&t, &t, &a->c2);
    fp2_sqr(&s2, &t);
    fp2_mul(&s3, &a->c1, &a->c2);
    fp2_dbl(&s3, &s3);
    fp2_sqr(&s4, &a->c2);
    fp2 c0, c1, c2;
    fp2_mul_by_xi(&t, &s3);
    fp2_add(&c0, &s0, &t);
    fp2_mul_by_xi(&t, &s4);
    fp2_add(&c1, &s1, &t);
    fp2_add(&c2, &s1, &s2);
    fp2_add(&c2, &c2, &s3);
    fp2_sub(&c2, &c2, &s0);
    fp2_sub(&c2, &c2, &s4);
    r->c0 = c0; r->c1 = c1; r->c2 = c2;
}

static void fp6_mul_by_v(fp6 *r, const fp6 *a) {
    fp2 t;
    fp2_mul_by_xi(&t, &a->c2);
    fp2 a0 = a->c0, a1 = a->c1;
    r->c0 = t; r->c1 = a0; r->c2 = a1;
}

static void fp6_inv(fp6 *r, const fp6 *a) {
    fp2 c0, c1, c2, t, u_;
    fp2_sqr(&c0, &a->c0);
    fp2_mul(&t, &a->c1, &a->c2);
    fp2_mul_by_xi(&t, &t);
    fp2_sub(&c0, &c0, &t);
    fp2_sqr(&c1, &a->c2);
    fp2_mul_by_xi(&c1, &c1);
    fp2_mul(&t, &a->c0, &a->c1);
    fp2_sub(&c1, &c1, &t);
    fp2_sqr(&c2, &a->c1);
    fp2_mul(&t, &a->c0, &a->c2);
    fp2_sub(&c2, &c2, &t);
    fp2_mul(&t, &a->c2, &c1);
    fp2_mul(&u_, &a->c1, &c2);
    fp2_add(&t, &t, &u_);
    fp2_mul_by_xi(&t, &t);
    fp2_mul(&u_, &a->c0, &c0);
    fp2_add(&t, &t, &u_);
    fp2_inv(&t, &t);
    fp2_mul(&r->c0, &c0, &t);
    fp2_mul(&r->c1, &c1, &t);
    fp2_mul(&r->c2, &c2, &t);
}

static void fp12_one(fp12 *r) { fp6_one(&r->c0); fp6_zero(&r->c1); }
static int fp12_is_one(const fp12 *a) {
    fp12 one;
    fp12_one(&one);
    return memcmp(a, &one, sizeof(fp12)) == 0;
}

static void fp12_mul(fp12 *r, const fp12 *a, const fp12 *b) {
    fp6 t0, t1, s, t, c0, c1;
    fp6_mul(&t0, &a->c0, &b->c0);
    fp6_mul(&t1, &a->c1, &b->c1);
    fp6_mul_by_v(&c0, &t1);
    fp6_add(&c0, &c0, &t0);
    fp6_add(&s, &a->c0, &a->c1);
    fp6_add(&t, &b->c0, &b->c1);
    fp6_mul(&c1, &s, &t);
    fp6_sub(&c1, &c1, &t0);
    fp6_sub(&c1, &c1, &t1);
    r->c0 = c0; r->c1 = c1;
}

static void fp12_sqr(fp12 *r, const fp12 *a) {
    /* complex method over Fq6 — host_pairing.fq12_sqr */
    fp6 v0, t, c0, c1;
    fp6_mul(&v0, &a->c0, &a->c1);
    fp6_mul_by_v(&t, &a->c1);
    fp6_add(&t, &a->c0, &t);
    fp6 s;
    fp6_add(&s, &a->c0, &a->c1);
    fp6_mul(&t, &s, &t);
    fp6_sub(&t, &t, &v0);
    fp6_mul_by_v(&c0, &v0);
    fp6_sub(&c0, &t, &c0);
    fp6_add(&c1, &v0, &v0);
    r->c0 = c0; r->c1 = c1;
}

static void fp12_inv(fp12 *r, const fp12 *a) {
    fp6 n0, n1, n, ninv;
    fp6_sqr(&n0, &a->c0);
    fp6_sqr(&n1, &a->c1);
    fp6_mul_by_v(&n1, &n1);
    fp6_sub(&n, &n0, &n1);
    fp6_inv(&ninv, &n);
    fp6_mul(&r->c0, &a->c0, &ninv);
    fp6_mul(&n1, &a->c1, &ninv);
    fp6_neg(&r->c1, &n1);
}

static void fp12_conj(fp12 *r, const fp12 *a) {
    r->c0 = a->c0;
    fp6_neg(&r->c1, &a->c1);
}

/* Frobenius gamma constants: gamma[j][i] = (xi^((q-1)/3))^i * (xi^((q-1)/6))^j,
 * derived at first use (no copied tables): the exponents come from dividing
 * p-1 by 3 and 6 with limb long division. */
static fp2 FROB_GAMMA[2][3];
static int FROB_READY = 0;

static void limbs_divn(uint64_t *r, const fp a, uint64_t d) {
    u128 rem = 0;
    for (int i = 5; i >= 0; i--) {
        u128 cur = (rem << 64) | a[i];
        r[i] = (uint64_t)(cur / d);
        rem = cur % d;
    }
}

static void fp2_pow_limbs(fp2 *r, const fp2 *a, const uint64_t *e, int nbits) {
    fp2 acc, base;
    fp2_one(&acc);
    base = *a;
    for (int i = 0; i < nbits; i++) {
        if ((e[i / 64] >> (i % 64)) & 1) fp2_mul(&acc, &acc, &base);
        fp2_sqr(&base, &base);
    }
    *r = acc;
}

static void frob_init(void) {
    if (FROB_READY) return;
    fp pm1;
    fp_copy(pm1, FP_P);
    pm1[0] -= 1; /* p odd: no borrow */
    uint64_t e3[6], e6[6];
    limbs_divn(e3, pm1, 3);
    limbs_divn(e6, pm1, 6);
    fp2 xi;
    fp_copy(xi.c0, FP_ONE);
    fp_copy(xi.c1, FP_ONE);
    fp2 fv, fw;
    fp2_pow_limbs(&fv, &xi, e3, 381);
    fp2_pow_limbs(&fw, &xi, e6, 381);
    for (int j = 0; j < 2; j++)
        for (int i = 0; i < 3; i++) {
            fp2 t;
            fp2_one(&t);
            for (int k = 0; k < i; k++) fp2_mul(&t, &t, &fv);
            for (int k = 0; k < j; k++) fp2_mul(&t, &t, &fw);
            FROB_GAMMA[j][i] = t;
        }
    FROB_READY = 1;
}

static void fp12_frob(fp12 *r, const fp12 *a) {
    frob_init();
    const fp2 *src[2][3] = {{&a->c0.c0, &a->c0.c1, &a->c0.c2},
                            {&a->c1.c0, &a->c1.c1, &a->c1.c2}};
    fp2 *dst[2][3] = {{&r->c0.c0, &r->c0.c1, &r->c0.c2},
                      {&r->c1.c0, &r->c1.c1, &r->c1.c2}};
    for (int j = 0; j < 2; j++)
        for (int i = 0; i < 3; i++) {
            fp2 t;
            fp2_conj(&t, src[j][i]);
            fp2_mul(dst[j][i], &t, &FROB_GAMMA[j][i]);
        }
}

/* sparse line through psi(T) with twist slope lam, evaluated at P=(xp,yp),
 * scaled by xi (killed by the easy final exp) — host_pairing._sparse_line:
 * slots (w^0, w^3, w^5):  a = xi*yp, b = lam*xT - yT, c = -xp*lam. */
static void sparse_line(fp2 *a, fp2 *b, fp2 *c, const fp2 *lam, const fp2 *xt, const fp2 *yt,
                        const fp xp, const fp yp) {
    /* xi = 1 + u, so xi*yp = (yp, yp) */
    fp_copy(a->c0, yp);
    fp_copy(a->c1, yp);
    fp2_mul(b, lam, xt);
    fp2_sub(b, b, yt);
    fp nxp;
    fp_neg(nxp, xp);
    fp2_mul_fp(c, lam, nxp);
}

/* f * ((a,0,0),(0,b,c)) — host_pairing._mul_by_sparse */
static void mul_by_sparse(fp12 *f, const fp2 *a, const fp2 *b, const fp2 *c) {
    fp6 a6, bc6, t0, t1, s, u_, c0, c1;
    fp6_zero(&a6);
    a6.c0 = *a;
    fp6_zero(&bc6);
    bc6.c1 = *b;
    bc6.c2 = *c;
    /* t0 = f0 * a (component-wise fq2 mul) */
    fp2_mul(&t0.c0, &f->c0.c0, a);
    fp2_mul(&t0.c1, &f->c0.c1, a);
    fp2_mul(&t0.c2, &f->c0.c2, a);
    fp6_mul(&t1, &f->c1, &bc6);
    fp6_mul_by_v(&c0, &t1);
    fp6_add(&c0, &c0, &t0);
    fp6_add(&s, &f->c0, &f->c1);
    fp6_add(&u_, &a6, &bc6);
    fp6_mul(&c1, &s, &u_);
    fp6_sub(&c1, &c1, &t0);
    fp6_sub(&c1, &c1, &t1);
    f->c0 = c0; f->c1 = c1;
}

/* ate loop parameter |x| for BLS12-381 (x is negative: conjugate after) */
static const uint64_t BLS_X_ABS = 0xd201000000010000ULL;
#define BLS_X_BITS 64

/* Miller loop f_{|x|, psi(Q)}(P): G2 arithmetic in affine twist coords
 * (one Fq2 inversion per step, exactly like host_pairing.miller_loop). */
static void miller_loop_c(fp12 *f, const fp xp, const fp yp, const fp2 *xq, const fp2 *yq) {
    fp2 xt = *xq, yt = *yq;
    fp12_one(f);
    int top = 63;
    while (!((BLS_X_ABS >> top) & 1)) top--;
    for (int i = top - 1; i >= 0; i--) {
        /* doubling step: lam = 3 xt^2 / (2 yt) */
        fp2 lam, num, den, a, b, c, x3, y3, t;
        fp2_sqr(&num, &xt);
        fp2_add(&t, &num, &num);
        fp2_add(&num, &t, &num);
        fp2_dbl(&den, &yt);
        fp2_inv(&den, &den);
        fp2_mul(&lam, &num, &den);
        sparse_line(&a, &b, &c, &lam, &xt, &yt, xp, yp);
        fp2_sqr(&x3, &lam);
        fp2_dbl(&t, &xt);
        fp2_sub(&x3, &x3, &t);
        fp2_sub(&t, &xt, &x3);
        fp2_mul(&y3, &lam, &t);
        fp2_sub(&y3, &y3, &yt);
        xt = x3; yt = y3;
        fp12_sqr(f, f);
        mul_by_sparse(f, &a, &b, &c);
        if ((BLS_X_ABS >> i) & 1) {
            /* addition step: lam = (yq - yt) / (xq - xt) */
            fp2_sub(&num, yq, &yt);
            fp2_sub(&den, xq, &xt);
            fp2_inv(&den, &den);
            fp2_mul(&lam, &num, &den);
            sparse_line(&a, &b, &c, &lam, &xt, &yt, xp, yp);
            fp2_sqr(&x3, &lam);
            fp2_sub(&x3, &x3, &xt);
            fp2_sub(&x3, &x3, xq);
            fp2_sub(&t, &xt, &x3);
            fp2_mul(&y3, &lam, &t);
            fp2_sub(&y3, &y3, &yt);
            xt = x3; yt = y3;
            mul_by_sparse(f, &a, &b, &c);
        }
    }
    /* x < 0: conjugate (Frobenius^6) */
    fp12_conj(f, f);
}

/* final exponentiation: easy part then the base-q digit decomposition of
 * (q^4 - q^2 + 1)/r with one shared square chain — host_pairing.
 * `hard_digits`: 4 digits x 6 LE u64 limbs, supplied by the caller
 * (host_pairing derives them numerically; no hand-copied chain). */
static void final_exp_c(fp12 *r, const fp12 *f, const uint64_t *hard_digits) {
    fp12 m, t, u_;
    /* easy: m = conj(f) * inv(f); m = frob^2(m) * m */
    fp12_conj(&t, f);
    fp12_inv(&u_, f);
    fp12_mul(&m, &t, &u_);
    fp12_frob(&t, &m);
    fp12_frob(&t, &t);
    fp12_mul(&m, &t, &m);
    /* hard: shared square chain over the 4 digits */
    fp12 acc[4], sq;
    for (int i = 0; i < 4; i++) fp12_one(&acc[i]);
    sq = m;
    int maxbits = 0;
    for (int i = 0; i < 4; i++)
        for (int b = 383; b >= 0; b--)
            if ((hard_digits[i * 6 + b / 64] >> (b % 64)) & 1) {
                if (b + 1 > maxbits) maxbits = b + 1;
                break;
            }
    for (int b = 0; b < maxbits; b++) {
        for (int i = 0; i < 4; i++)
            if ((hard_digits[i * 6 + b / 64] >> (b % 64)) & 1) fp12_mul(&acc[i], &acc[i], &sq);
        fp12_sqr(&sq, &sq);
    }
    fp12 out = acc[0];
    for (int i = 1; i < 4; i++) {
        fp12 ti = acc[i];
        for (int k = 0; k < i; k++) fp12_frob(&ti, &ti);
        fp12_mul(&out, &out, &ti);
    }
    *r = out;
}

/* ---- BLS12-381-specific final exponentiation (x-chain) -------------------
 * Exact decomposition of the hard exponent (verified against the generic
 * digit chain in tests/test_native_pairing.py):
 *     h = (q^4 - q^2 + 1)/r = u·(x + q)·(x^2 + q^2 - 1) + 1,
 *     u = (x - 1)^2 / 3        (x ≡ 1 mod 3 for BLS12-381)
 * so f^h needs one 127-bit exponentiation plus three |x|-exponentiations
 * (|x| has Hamming weight 6) instead of the 4-digit 381-bit shared chain
 * (~384 squarings + ~750 multiplications -> ~315 squarings + ~70
 * multiplications).  All intermediates lie in the cyclotomic subgroup
 * (the easy part enforces m^(q^6+1) = 1), where inversion is conjugation. */
/* Granger-Scott cyclotomic squaring.  For unitary z = A + Bw + Cw^2 over
 * Fq4 = Fq2[y]/(y^2 - ξ)  (A = (c0.c0, c1.c1), B = (c1.c0, c0.c2),
 * C = (c0.c1, c1.c2); y = w^3):
 *     z^2 = (3A^2 - 2Ā) + (3yC^2 + 2B̄)w + (3B^2 - 2C̄)w^2
 * — verified numerically against the generic tower squaring (see
 * tests/test_native_pairing.py).  3 Fq4 squarings ≈ half a generic
 * fp12_sqr. */
typedef struct { fp2 c0, c1; } fp4;

static void fp4_sqr(fp4 *r, const fp4 *a) {
    /* (a0^2 + ξ a1^2, 2 a0 a1) */
    fp2 t, s0, s1;
    fp2_mul(&t, &a->c0, &a->c1);
    fp2_sqr(&s0, &a->c0);
    fp2_sqr(&s1, &a->c1);
    fp2_mul_by_xi(&s1, &s1);
    fp2_add(&r->c0, &s0, &s1);
    fp2_dbl(&r->c1, &t);
}

static void fp4_muly(fp4 *r, const fp4 *a) {
    fp2 t;
    fp2_mul_by_xi(&t, &a->c1);
    r->c1 = a->c0;
    r->c0 = t;
}

static void fp12_cyclo_sqr(fp12 *r, const fp12 *z) {
    fp4 A = {0}, B = {0}, C = {0}, A2, B2, C2, yC2;
    A.c0 = z->c0.c0; A.c1 = z->c1.c1;
    B.c0 = z->c1.c0; B.c1 = z->c0.c2;
    C.c0 = z->c0.c1; C.c1 = z->c1.c2;
    fp4_sqr(&A2, &A);
    fp4_sqr(&B2, &B);
    fp4_sqr(&C2, &C);
    fp4_muly(&yC2, &C2);
    fp2 t;
#define CY_OUT(dst0, dst1, sq, orig_c0, orig_c1, sign)                                   \
    do {                                                                                 \
        /* dst = 3*sq sign 2*conj(orig); conj flips the y (c1) component */              \
        fp2_dbl(&t, &(sq).c0);                                                           \
        fp2_add(&t, &t, &(sq).c0);                                                       \
        fp2 o0 = orig_c0, o1 = orig_c1, d;                                               \
        fp2_dbl(&d, &o0);                                                                \
        if (sign > 0) fp2_add(&(dst0), &t, &d);                                          \
        else fp2_sub(&(dst0), &t, &d);                                                   \
        fp2_dbl(&t, &(sq).c1);                                                           \
        fp2_add(&t, &t, &(sq).c1);                                                       \
        fp2_dbl(&d, &o1);                                                                \
        if (sign > 0) fp2_sub(&(dst1), &t, &d);                                          \
        else fp2_add(&(dst1), &t, &d);                                                   \
    } while (0)
    /* A' = 3A^2 - 2Ā : conj(A) = (A.c0, -A.c1) so c0 gets -2A.c0, c1 gets +2A.c1 */
    CY_OUT(r->c0.c0, r->c1.c1, A2, A.c0, A.c1, -1);
    /* B' = 3yC^2 + 2B̄ : c0 gets +2B.c0, c1 gets -2B.c1 */
    CY_OUT(r->c1.c0, r->c0.c2, yC2, B.c0, B.c1, +1);
    /* C' = 3B^2 - 2C̄ */
    CY_OUT(r->c0.c1, r->c1.c2, B2, C.c0, C.c1, -1);
#undef CY_OUT
}

static void fp12_pow_u128_cyclo(fp12 *r, const fp12 *m, unsigned __int128 e) {
    fp12 acc;
    int started = 0;
    for (int b = 127; b >= 0; b--) {
        if (started) fp12_cyclo_sqr(&acc, &acc);
        if ((uint64_t)((e >> b) & 1)) {
            if (started) fp12_mul(&acc, &acc, m);
            else { acc = *m; started = 1; }
        }
    }
    if (!started) fp12_one(&acc);
    *r = acc;
}

static void final_exp_x(fp12 *r, const fp12 *f) {
    fp12 m, t, u_;
    /* easy part: m = (conj(f)/f)^(q^2+1) — identical to final_exp_c */
    fp12_conj(&t, f);
    fp12_inv(&u_, f);
    fp12_mul(&m, &t, &u_);
    fp12_frob(&t, &m);
    fp12_frob(&t, &t);
    fp12_mul(&m, &t, &m);
    /* hard part */
    unsigned __int128 xm1 = (unsigned __int128)BLS_X_ABS + 1; /* |x - 1|, x < 0 */
    unsigned __int128 u = xm1 * xm1 / 3;
    fp12 a, b, c, t2;
    fp12_pow_u128_cyclo(&a, &m, u); /* (x-1)^2 > 0: no sign fixup */
    /* b = a^(x+q) = conj(a^|x|) · frob(a) */
    fp12_pow_u128_cyclo(&t2, &a, (unsigned __int128)BLS_X_ABS);
    fp12_conj(&t2, &t2);
    fp12_frob(&b, &a);
    fp12_mul(&b, &b, &t2);
    /* c = b^(x^2+q^2-1) = b^(x^2) · frob^2(b) · conj(b) */
    fp12_pow_u128_cyclo(&t2, &b, (unsigned __int128)BLS_X_ABS);
    fp12_pow_u128_cyclo(&t2, &t2, (unsigned __int128)BLS_X_ABS); /* (-x)^2 = x^2 */
    fp12_frob(&c, &b);
    fp12_frob(&c, &c);
    fp12_mul(&c, &c, &t2);
    fp12_conj(&t2, &b);
    fp12_mul(&c, &c, &t2);
    fp12_mul(r, &c, &m);
}

/* boundary: canonical LE u64 <-> Montgomery fp12.  Layout matches the
 * Python tuple nesting ((c00,c01,c02),(c10,c11,c12)), each fq2 (a0,a1),
 * each fq 6 limbs: 72 u64 total. */
static void fp12_from_limbs(fp12 *r, const uint64_t *in) {
    fp2 *slots[6] = {&r->c0.c0, &r->c0.c1, &r->c0.c2, &r->c1.c0, &r->c1.c1, &r->c1.c2};
    for (int s = 0; s < 6; s++) {
        fp_to_mont(slots[s]->c0, in + s * 12);
        fp_to_mont(slots[s]->c1, in + s * 12 + 6);
    }
}

static void fp12_to_limbs(uint64_t *out, const fp12 *a) {
    const fp2 *slots[6] = {&a->c0.c0, &a->c0.c1, &a->c0.c2, &a->c1.c0, &a->c1.c1, &a->c1.c2};
    for (int s = 0; s < 6; s++) {
        fp t;
        fp_from_mont(t, slots[s]->c0);
        memcpy(out + s * 12, t, sizeof(fp));
        fp_from_mont(t, slots[s]->c1);
        memcpy(out + s * 12 + 6, t, sizeof(fp));
    }
}

/* Miller loop over canonical affine inputs; out: 72 canonical u64. */
void marlin_miller_loop(const uint64_t *p_xy /*12*/, uint8_t p_inf, const uint64_t *q_xy /*24*/,
                        uint8_t q_inf, uint64_t *out) {
    fp12 f;
    if (p_inf || q_inf) {
        fp12_one(&f);
    } else {
        fp xp, yp;
        fp_to_mont(xp, p_xy);
        fp_to_mont(yp, p_xy + 6);
        fp2 xq, yq;
        fp_to_mont(xq.c0, q_xy);
        fp_to_mont(xq.c1, q_xy + 6);
        fp_to_mont(yq.c0, q_xy + 12);
        fp_to_mont(yq.c1, q_xy + 18);
        miller_loop_c(&f, xp, yp, &xq, &yq);
    }
    fp12_to_limbs(out, &f);
}

/* final exponentiation over a canonical Fq12; out: 72 canonical u64. */
void marlin_final_exp(const uint64_t *f_limbs /*72*/, const uint64_t *hard_digits /*24*/,
                      uint64_t *out) {
    fp12 f, r;
    fp12_from_limbs(&f, f_limbs);
    final_exp_c(&r, &f, hard_digits);
    fp12_to_limbs(out, &r);
}

/* x-chain final exponentiation (production path; digit-chain entry above
 * is kept as the differential-test oracle). */
void marlin_final_exp_x(const uint64_t *f_limbs /*72*/, uint64_t *out) {
    fp12 f, r;
    fp12_from_limbs(&f, f_limbs);
    final_exp_x(&r, &f);
    fp12_to_limbs(out, &r);
}

/* ------------------------------------------------------------------ */
/* Prepared pairings: the verifier's G2 arguments are fixed per key, so
 * the twist-coordinate loop (including every Fq2 inversion) runs ONCE at
 * preparation and each verify replays only sparse multiplications —
 * ark-ec's G2Prepared.  A prepared table stores, per Miller step, the
 * slope lam and mu = lam*xT - yT (2 Fq2 = 24 canonical u64). */

/* number of Miller steps for BLS_X_ABS: doubles + adds */
int marlin_g2_prepare_nsteps(void) {
    int top = 63;
    while (!((BLS_X_ABS >> top) & 1)) top--;
    int steps = 0;
    for (int i = top - 1; i >= 0; i--) {
        steps++;
        if ((BLS_X_ABS >> i) & 1) steps++;
    }
    return steps;
}

/* q_xy: 24 canonical u64 affine twist point.  out: nsteps x 24 canonical
 * u64 (lam.c0, lam.c1, mu.c0, mu.c1). */
void marlin_g2_prepare(const uint64_t *q_xy, uint64_t *out) {
    fp2 xq, yq, xt, yt;
    fp_to_mont(xq.c0, q_xy);
    fp_to_mont(xq.c1, q_xy + 6);
    fp_to_mont(yq.c0, q_xy + 12);
    fp_to_mont(yq.c1, q_xy + 18);
    xt = xq;
    yt = yq;
    int top = 63;
    while (!((BLS_X_ABS >> top) & 1)) top--;
    size_t w = 0;
    fp c;
#define EMIT(lam_, mu_)                                                        \
    do {                                                                       \
        fp_from_mont(c, (lam_).c0); memcpy(out + w, c, sizeof(fp)); w += 6;    \
        fp_from_mont(c, (lam_).c1); memcpy(out + w, c, sizeof(fp)); w += 6;    \
        fp_from_mont(c, (mu_).c0);  memcpy(out + w, c, sizeof(fp)); w += 6;    \
        fp_from_mont(c, (mu_).c1);  memcpy(out + w, c, sizeof(fp)); w += 6;    \
    } while (0)
    for (int i = top - 1; i >= 0; i--) {
        fp2 lam, mu, num, den, x3, y3, t;
        /* doubling step */
        fp2_sqr(&num, &xt);
        fp2_add(&t, &num, &num);
        fp2_add(&num, &t, &num);
        fp2_dbl(&den, &yt);
        fp2_inv(&den, &den);
        fp2_mul(&lam, &num, &den);
        fp2_mul(&mu, &lam, &xt);
        fp2_sub(&mu, &mu, &yt);
        EMIT(lam, mu);
        fp2_sqr(&x3, &lam);
        fp2_dbl(&t, &xt);
        fp2_sub(&x3, &x3, &t);
        fp2_sub(&t, &xt, &x3);
        fp2_mul(&y3, &lam, &t);
        fp2_sub(&y3, &y3, &yt);
        xt = x3;
        yt = y3;
        if ((BLS_X_ABS >> i) & 1) {
            /* addition step */
            fp2_sub(&num, &yq, &yt);
            fp2_sub(&den, &xq, &xt);
            fp2_inv(&den, &den);
            fp2_mul(&lam, &num, &den);
            fp2_mul(&mu, &lam, &xt);
            fp2_sub(&mu, &mu, &yt);
            EMIT(lam, mu);
            fp2_sqr(&x3, &lam);
            fp2_sub(&x3, &x3, &xt);
            fp2_sub(&x3, &x3, &xq);
            fp2_sub(&t, &xt, &x3);
            fp2_mul(&y3, &lam, &t);
            fp2_sub(&y3, &y3, &yt);
            xt = x3;
            yt = y3;
        }
    }
#undef EMIT
}

/* prod_i e(P_i, Q_i) == 1 over PREPARED G2 tables, merged Miller loops
 * (one shared square chain — line values are bit-identical to the
 * unprepared path, so the merged product agrees after the easy exp).
 * coeffs: k x nsteps x 24 canonical u64. */
int marlin_multi_pairing_prepared(const uint64_t *g1s, const uint8_t *g1_inf,
                                  const uint64_t *coeffs, size_t k,
                                  const uint64_t *hard_digits) {
    int nsteps = marlin_g2_prepare_nsteps();
    fp *xps = (fp *)malloc(sizeof(fp) * k);
    fp *yps = (fp *)malloc(sizeof(fp) * k);
    uint8_t *skip = (uint8_t *)malloc(k);
    for (size_t j = 0; j < k; j++) {
        skip[j] = g1_inf && g1_inf[j];
        if (!skip[j]) {
            fp_to_mont(xps[j], g1s + j * 12);
            fp_to_mont(yps[j], g1s + j * 12 + 6);
        }
    }
    fp12 f;
    fp12_one(&f);
    int top = 63;
    while (!((BLS_X_ABS >> top) & 1)) top--;
    size_t step = 0;
    for (int i = top - 1; i >= 0; i--) {
        fp12_sqr(&f, &f);
        for (size_t j = 0; j < k; j++) {
            if (skip[j]) continue;
            const uint64_t *cf = coeffs + (j * nsteps + step) * 24;
            fp2 lam, mu, a, b, cc;
            fp_to_mont(lam.c0, cf);
            fp_to_mont(lam.c1, cf + 6);
            fp_to_mont(mu.c0, cf + 12);
            fp_to_mont(mu.c1, cf + 18);
            fp_copy(a.c0, yps[j]);
            fp_copy(a.c1, yps[j]);
            b = mu;
            fp nxp;
            fp_neg(nxp, xps[j]);
            fp2_mul_fp(&cc, &lam, nxp);
            mul_by_sparse(&f, &a, &b, &cc);
        }
        step++;
        if ((BLS_X_ABS >> i) & 1) {
            for (size_t j = 0; j < k; j++) {
                if (skip[j]) continue;
                const uint64_t *cf = coeffs + (j * nsteps + step) * 24;
                fp2 lam, mu, a, b, cc;
                fp_to_mont(lam.c0, cf);
                fp_to_mont(lam.c1, cf + 6);
                fp_to_mont(mu.c0, cf + 12);
                fp_to_mont(mu.c1, cf + 18);
                fp_copy(a.c0, yps[j]);
                fp_copy(a.c1, yps[j]);
                b = mu;
                fp nxp;
                fp_neg(nxp, xps[j]);
                fp2_mul_fp(&cc, &lam, nxp);
                mul_by_sparse(&f, &a, &b, &cc);
            }
            step++;
        }
    }
    free(xps);
    free(yps);
    free(skip);
    /* x < 0: conjugate the merged product (automorphism distributes) */
    fp12_conj(&f, &f);
    fp12 r;
    (void)hard_digits; /* x-chain path; digit chain kept for the test oracle */
    final_exp_x(&r, &f);
    return fp12_is_one(&r);
}

/* prod_i e(P_i, Q_i) == 1 with one shared final exponentiation.
 * g1s: k x 12 canonical affine, g2s: k x 24; returns 1 iff the product
 * pairs to one. */
int marlin_multi_pairing(const uint64_t *g1s, const uint8_t *g1_inf, const uint64_t *g2s,
                         const uint8_t *g2_inf, size_t k, const uint64_t *hard_digits) {
    fp12 f, t;
    fp12_one(&f);
    for (size_t i = 0; i < k; i++) {
        if ((g1_inf && g1_inf[i]) || (g2_inf && g2_inf[i])) continue;
        fp xp, yp;
        fp_to_mont(xp, g1s + i * 12);
        fp_to_mont(yp, g1s + i * 12 + 6);
        fp2 xq, yq;
        fp_to_mont(xq.c0, g2s + i * 24);
        fp_to_mont(xq.c1, g2s + i * 24 + 6);
        fp_to_mont(yq.c0, g2s + i * 24 + 12);
        fp_to_mont(yq.c1, g2s + i * 24 + 18);
        miller_loop_c(&t, xp, yp, &xq, &yq);
        fp12_mul(&f, &f, &t);
    }
    fp12 r;
    (void)hard_digits;
    final_exp_x(&r, &f);
    return fp12_is_one(&r);
}
