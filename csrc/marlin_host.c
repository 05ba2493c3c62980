/* Native host runtime for marlin_tpu: transcript primitives.
 *
 * The reference's transcript stack is native Rust (`blake2`, `rand_chacha`
 * — SURVEY.md §2b rows 8-9); this is the C equivalent, exposed to Python
 * via ctypes (snark/native.py).  Implements:
 *   - BLAKE2s-256 (RFC 7693, unkeyed)
 *   - ChaCha20 block function (djb variant, 64-bit counter, zero nonce —
 *     matching rand_chacha's ChaChaRng stream)
 *   - a fused Fiat-Shamir step: seed' = BLAKE2s(input || seed)
 *
 * Build: cc -O2 -shared -fPIC -o libmarlin_host.so marlin_host.c
 */

#include <stddef.h>
#include <stdint.h>
#include <string.h>

/* ------------------------------------------------------------------ */
/* BLAKE2s                                                             */

static const uint32_t blake2s_iv[8] = {
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
};

static const uint8_t blake2s_sigma[10][16] = {
    {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
    {14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3},
    {11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4},
    {7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8},
    {9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13},
    {2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9},
    {12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11},
    {13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10},
    {6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5},
    {10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0},
};

static inline uint32_t rotr32(uint32_t x, int c) {
    return (x >> c) | (x << (32 - c));
}

typedef struct {
    uint32_t h[8];
    uint64_t t;
    uint8_t buf[64];
    size_t buflen;
} blake2s_state;

static void blake2s_compress(blake2s_state *S, const uint8_t block[64], int last) {
    uint32_t m[16], v[16];
    for (int i = 0; i < 16; i++) {
        m[i] = (uint32_t)block[4 * i] | ((uint32_t)block[4 * i + 1] << 8) |
               ((uint32_t)block[4 * i + 2] << 16) | ((uint32_t)block[4 * i + 3] << 24);
    }
    for (int i = 0; i < 8; i++) v[i] = S->h[i];
    for (int i = 0; i < 8; i++) v[i + 8] = blake2s_iv[i];
    v[12] ^= (uint32_t)(S->t & 0xFFFFFFFF);
    v[13] ^= (uint32_t)(S->t >> 32);
    if (last) v[14] = ~v[14];

#define G(r, i, a, b, c, d)                          \
    do {                                             \
        a = a + b + m[blake2s_sigma[r][2 * i]];      \
        d = rotr32(d ^ a, 16);                       \
        c = c + d;                                   \
        b = rotr32(b ^ c, 12);                       \
        a = a + b + m[blake2s_sigma[r][2 * i + 1]];  \
        d = rotr32(d ^ a, 8);                        \
        c = c + d;                                   \
        b = rotr32(b ^ c, 7);                        \
    } while (0)

    for (int r = 0; r < 10; r++) {
        G(r, 0, v[0], v[4], v[8], v[12]);
        G(r, 1, v[1], v[5], v[9], v[13]);
        G(r, 2, v[2], v[6], v[10], v[14]);
        G(r, 3, v[3], v[7], v[11], v[15]);
        G(r, 4, v[0], v[5], v[10], v[15]);
        G(r, 5, v[1], v[6], v[11], v[12]);
        G(r, 6, v[2], v[7], v[8], v[13]);
        G(r, 7, v[3], v[4], v[9], v[14]);
    }
#undef G
    for (int i = 0; i < 8; i++) S->h[i] ^= v[i] ^ v[i + 8];
}

static void blake2s_init(blake2s_state *S) {
    memset(S, 0, sizeof(*S));
    for (int i = 0; i < 8; i++) S->h[i] = blake2s_iv[i];
    /* parameter block: digest_length=32, fanout=1, depth=1 */
    S->h[0] ^= 0x01010000 ^ 32;
}

static void blake2s_update(blake2s_state *S, const uint8_t *in, size_t inlen) {
    while (inlen > 0) {
        if (S->buflen == 64) {
            /* more data follows, so this buffered block is not the last */
            S->t += 64;
            blake2s_compress(S, S->buf, 0);
            S->buflen = 0;
        }
        size_t take = 64 - S->buflen;
        if (take > inlen) take = inlen;
        memcpy(S->buf + S->buflen, in, take);
        S->buflen += take;
        in += take;
        inlen -= take;
    }
}

static void blake2s_final(blake2s_state *S, uint8_t out[32]) {
    S->t += S->buflen;
    memset(S->buf + S->buflen, 0, 64 - S->buflen);
    blake2s_compress(S, S->buf, 1);
    for (int i = 0; i < 8; i++) {
        out[4 * i] = (uint8_t)(S->h[i]);
        out[4 * i + 1] = (uint8_t)(S->h[i] >> 8);
        out[4 * i + 2] = (uint8_t)(S->h[i] >> 16);
        out[4 * i + 3] = (uint8_t)(S->h[i] >> 24);
    }
}

void marlin_blake2s256(const uint8_t *in, size_t inlen, uint8_t out[32]) {
    blake2s_state S;
    blake2s_init(&S);
    blake2s_update(&S, in, inlen);
    blake2s_final(&S, out);
}

/* ------------------------------------------------------------------ */
/* ChaCha20 (djb variant: 64-bit counter, 64-bit zero nonce)           */

static inline uint32_t rotl32(uint32_t x, int c) {
    return (x << c) | (x >> (32 - c));
}

void marlin_chacha20_block(const uint8_t key[32], uint64_t counter, uint8_t out[64]) {
    uint32_t st[16];
    uint32_t x[16];
    st[0] = 0x61707865; st[1] = 0x3320646E; st[2] = 0x79622D32; st[3] = 0x6B206574;
    for (int i = 0; i < 8; i++) {
        st[4 + i] = (uint32_t)key[4 * i] | ((uint32_t)key[4 * i + 1] << 8) |
                    ((uint32_t)key[4 * i + 2] << 16) | ((uint32_t)key[4 * i + 3] << 24);
    }
    st[12] = (uint32_t)(counter & 0xFFFFFFFF);
    st[13] = (uint32_t)(counter >> 32);
    st[14] = 0;
    st[15] = 0;
    memcpy(x, st, sizeof(st));

#define QR(a, b, c, d)                    \
    do {                                  \
        x[a] += x[b]; x[d] = rotl32(x[d] ^ x[a], 16); \
        x[c] += x[d]; x[b] = rotl32(x[b] ^ x[c], 12); \
        x[a] += x[b]; x[d] = rotl32(x[d] ^ x[a], 8);  \
        x[c] += x[d]; x[b] = rotl32(x[b] ^ x[c], 7);  \
    } while (0)

    for (int i = 0; i < 10; i++) {
        QR(0, 4, 8, 12); QR(1, 5, 9, 13); QR(2, 6, 10, 14); QR(3, 7, 11, 15);
        QR(0, 5, 10, 15); QR(1, 6, 11, 12); QR(2, 7, 8, 13); QR(3, 4, 9, 14);
    }
#undef QR

    for (int i = 0; i < 16; i++) {
        uint32_t v = x[i] + st[i];
        out[4 * i] = (uint8_t)v;
        out[4 * i + 1] = (uint8_t)(v >> 8);
        out[4 * i + 2] = (uint8_t)(v >> 16);
        out[4 * i + 3] = (uint8_t)(v >> 24);
    }
}

/* Fused Fiat-Shamir absorb: seed' = BLAKE2s(input || seed)
 * (reference src/rng.rs:71-79). */
void marlin_fs_absorb(const uint8_t *input, size_t inlen, uint8_t seed[32]) {
    uint8_t tmp[32];
    blake2s_state S;
    blake2s_init(&S);
    blake2s_update(&S, input, inlen);
    blake2s_update(&S, seed, 32);
    blake2s_final(&S, tmp);
    memcpy(seed, tmp, 32);
}
