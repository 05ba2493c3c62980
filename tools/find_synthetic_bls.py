#!/usr/bin/env python
"""Search for a synthetic BLS12 curve whose Fr has LOW 2-adicity.

The reference benches MNT4/6-753 whose Fr is not highly 2-adic, forcing
ark-poly's MixedRadix domain path (benches/bench.rs:5-11; SURVEY §2b
curve-configs row).  Those exact parameter sets are unobtainable offline,
so this constructs a *pairing-enabled* curve with the same defining
property — Fr 2-adicity 13 with a 3^3 small subgroup — so the FULL stack
(curve, pairing, PC, driver) exercises mixed-radix domains end-to-end
(VERDICT r3 next-round item 5).

Family polynomials (same as BLS12-381/377):
    r = x^4 - x^2 + 1,  q = (x-1)^2 r / 3 + x,  t = x + 1,
    #E(Fq) = q + 1 - t = ((x-1)^2/3) * r.

Search constraints on x:
    x ≡ 1 (mod 3)         family divisibility
    x ≡ 2^12+1 (mod 2^13) -> v2(r-1) = v2(x-1)+v2(x+1) = 12+1 = 13
    x ≡ 1 (mod 27)        -> v3(r-1) = 3 (mixed-radix small subgroup)
    r, q prime; q 379-382 bit (same limb shapes as BLS12-381).

NOTE x ≡ 1 mod 4096 forces q ≡ 1 mod 4 (like BLS12-377, whose x ≡ 1 mod
2^46), so Fq2 uses the smallest non-residue d (u^2 = d), NOT u^2 = -1,
and square roots use generic Tonelli-Shanks.

Emits the full constant block for marlin_tpu/fields/synthetic_lowadic.py
with every constant derived from x (the tests re-derive them).
"""

import math
import random
import sys


def is_prime(n, rounds=44):
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    rng = random.Random(0xC0FFEE)
    for _ in range(rounds):
        a = rng.randrange(2, n - 1)
        y = pow(a, d, n)
        if y in (1, n - 1):
            continue
        for _ in range(s - 1):
            y = y * y % n
            if y == n - 1:
                break
        else:
            return False
    return True


def v(p, n):
    k = 0
    while n % p == 0:
        n //= p
        k += 1
    return k


def factor(n):
    """Full factorization (Pollard rho; inputs here are <= 130-bit)."""
    if n == 1:
        return {}
    if is_prime(n):
        return {n: 1}
    out = {}
    small = n
    for p in range(2, 10000):
        while small % p == 0:
            out[p] = out.get(p, 0) + 1
            small //= p
    def rho(m):
        if m % 2 == 0:
            return 2
        rng = random.Random(m)
        while True:
            c = rng.randrange(1, m)
            f = lambda z: (z * z + c) % m
            t = h = rng.randrange(2, m)
            d = 1
            while d == 1:
                t = f(t)
                h = f(f(h))
                d = math.gcd(abs(t - h), m)
            if d != m:
                return d
    stack = [small] if small > 1 else []
    while stack:
        m = stack.pop()
        if m == 1:
            continue
        if is_prime(m):
            out[m] = out.get(m, 0) + 1
            continue
        d = rho(m)
        stack += [d, m // d]
    return out


def search(start_hi=0xD2010000):
    # x with the CRT-fixed residue: x ≡ 4097 mod 8192, x ≡ 1 mod 27
    mod = 8192 * 27
    base = next(z for z in range(mod) if z % 8192 == 4097 and z % 27 == 1)
    x0 = (start_hi << 32)
    x = x0 - (x0 % mod) + base
    tried = 0
    while True:
        tried += 1
        if tried % 200000 == 0:
            print(f"  ... {tried} candidates", file=sys.stderr, flush=True)
        x += mod
        r = x**4 - x**2 + 1
        if not is_prime(r, rounds=2):
            continue
        q = (x - 1) ** 2 * r // 3 + x
        if not (379 <= q.bit_length() <= 382) or r.bit_length() > 255:
            continue
        if not is_prime(q, rounds=2):
            continue
        if is_prime(r) and is_prime(q):
            return x, r, q, tried


def sqrt_mod(a, q, nonres=None):
    """Tonelli-Shanks square root mod prime q (None if non-square)."""
    a %= q
    if a == 0:
        return 0
    if pow(a, (q - 1) // 2, q) != 1:
        return None
    s = v(2, q - 1)
    m = (q - 1) >> s
    if nonres is None:
        z = 2
        while pow(z, (q - 1) // 2, q) == 1:
            z += 1
    else:
        z = nonres % q
    c = pow(z, m, q)
    t = pow(a, m, q)
    r_ = pow(a, (m + 1) // 2, q)
    big_m = s
    while t != 1:
        i, tt = 0, t
        while tt != 1:
            tt = tt * tt % q
            i += 1
        b = pow(c, 1 << (big_m - i - 1), q)
        big_m = i
        r_ = r_ * b % q
        c = b * b % q
        t = t * c % q
    return r_


class Fq2:
    """Minimal Fq2 = Fq[u]/(u^2 - d) helper for the derivation."""

    def __init__(self, q, d):
        self.q, self.d = q, d % q

    def mul(self, a, b):
        q, d = self.q, self.d
        return ((a[0] * b[0] + d * a[1] * b[1]) % q, (a[0] * b[1] + a[1] * b[0]) % q)

    def pow(self, a, e):
        out, base = (1, 0), a
        while e:
            if e & 1:
                out = self.mul(out, base)
            base = self.mul(base, base)
            e >>= 1
        return out

    def inv(self, a):
        q, d = self.q, self.d
        n = pow((a[0] * a[0] - d * a[1] * a[1]) % q, -1, q)
        return (a[0] * n % q, (-a[1]) * n % q)

    def is_square(self, a):
        return self.pow(a, (self.q * self.q - 1) // 2) == (1, 0)

    def sqrt(self, a, nonres):
        """Tonelli-Shanks in Fq2 (group order q^2 - 1)."""
        if a == (0, 0):
            return (0, 0)
        if not self.is_square(a):
            return None
        n = self.q * self.q - 1
        s = v(2, n)
        m = n >> s
        c = self.pow(nonres, m)
        t = self.pow(a, m)
        r_ = self.pow(a, (m + 1) // 2)
        big_m = s
        while t != (1, 0):
            i, tt = 0, t
            while tt != (1, 0):
                tt = self.mul(tt, tt)
                i += 1
            b = self.pow(c, 1 << (big_m - i - 1))
            big_m = i
            r_ = self.mul(r_, b)
            c = self.mul(b, b)
            t = self.mul(t, c)
        return r_


def ec_add(P1, P2, q):
    if P1 is None:
        return P2
    if P2 is None:
        return P1
    (x1, y1), (x2, y2) = P1, P2
    if x1 == x2:
        if (y1 + y2) % q == 0:
            return None
        lam = (3 * x1 * x1) * pow(2 * y1, -1, q) % q
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, q) % q
    x3 = (lam * lam - x1 - x2) % q
    return (x3, (lam * (x1 - x3) - y1) % q)


def ec_mul(k, P, q):
    R_, A = None, P
    while k:
        if k & 1:
            R_ = ec_add(R_, A, q)
        A = ec_add(A, A, q)
        k >>= 1
    return R_


def ec2_add(P1, P2, F):
    if P1 is None:
        return P2
    if P2 is None:
        return P1
    (x1, y1), (x2, y2) = P1, P2
    q = F.q
    if x1 == x2:
        if tuple((a + b) % q for a, b in zip(y1, y2)) == (0, 0):
            return None
        num = F.mul((3 % q, 0), F.mul(x1, x1))
        lam = F.mul(num, F.inv(tuple(2 * c % q for c in y1)))
    else:
        dx = tuple((a - b) % q for a, b in zip(x2, x1))
        dy = tuple((a - b) % q for a, b in zip(y2, y1))
        lam = F.mul(dy, F.inv(dx))
    x3 = tuple(
        (a - b - c) % q for a, b, c in zip(F.mul(lam, lam), x1, x2)
    )
    y3 = tuple(
        (a - b) % q
        for a, b in zip(F.mul(lam, tuple((u - w) % q for u, w in zip(x1, x3))), y1)
    )
    return (x3, y3)


def ec2_mul(k, P, F):
    R_, A = None, P
    while k:
        if k & 1:
            R_ = ec2_add(R_, A, F)
        A = ec2_add(A, A, F)
        k >>= 1
    return R_


def main():
    import os

    known = os.environ.get("SYNTH_X")
    if known:
        x = int(known, 0)
        r = x**4 - x**2 + 1
        q = (x - 1) ** 2 * r // 3 + x
        assert is_prime(r) and is_prime(q)
        tried = 0
    else:
        x, r, q, tried = search()
    print(f"x = {hex(x)}  (tried {tried} candidates)")
    print(f"r bits = {r.bit_length()}, q bits = {q.bit_length()}")
    print(f"v2(r-1) = {v(2, r - 1)}, v3(r-1) = {v(3, r - 1)}, q mod 4 = {q % 4}")
    assert v(2, r - 1) == 13 and v(3, r - 1) == 3

    # FR generator: r - 1 = x^2 (x-1)(x+1), all factors <= ~128-bit ->
    # full factorization is cheap, so verify true primitivity
    fac = {}
    for part, mult in ((x, 2), (x - 1, 1), (x + 1, 1)):
        for p, k in factor(part).items():
            fac[p] = fac.get(p, 0) + k * mult
    assert math.prod(p**k for p, k in fac.items()) == r - 1
    for g in range(2, 1000):
        if all(pow(g, (r - 1) // p, r) != 1 for p in fac):
            fr_gen = g
            break
    print(f"FR_GENERATOR = {fr_gen}  (primitive; r-1 factors: {sorted(fac)})")

    # Fq2 non-residue: smallest |d|
    for d in [-1, -2, -3, -5, -7, -11, -13, -17, 2, 3, 5, 7, 11, 13, 17]:
        if pow(d % q, (q - 1) // 2, q) == q - 1:
            nr2 = d
            break
    print(f"FQ2_NONRESIDUE = {nr2}")
    F = Fq2(q, nr2)

    # xi for Fq6 = Fq2[v]/(v^3 - xi): non-square AND non-cube in Fq2
    def is_cube(a):
        if (q * q - 1) % 3:
            return True
        return F.pow(a, (q * q - 1) // 3) == (1, 0)

    xi = None
    for a, b in [(0, 1), (1, 1), (2, 1), (1, 2), (3, 1), (1, 3), (2, 3), (3, 2)]:
        cand = (a % q, b % q)
        if not F.is_square(cand) and not is_cube(cand):
            xi = (a, b)
            break
    print(f"FQ6_NONRESIDUE = {xi}  (non-square, non-cube in Fq2)")
    # a Fq2 non-square for Tonelli (xi works since it's a non-square)
    f2_nonres = (xi[0] % q, xi[1] % q)

    # curve b: sample a point, require full-order annihilation
    cof = (x - 1) ** 2 // 3
    nE = q + 1 - (x + 1)
    assert nE == cof * r

    def on_curve_pt(b):
        for xc in range(1, 500):
            y = sqrt_mod(xc**3 + b, q, nonres=nr2)
            if y is not None:
                return (xc, y)
        return None

    B = G = None
    for b in range(1, 50):
        P1 = on_curve_pt(b)
        if P1 is None:
            continue
        if ec_mul(nE, P1, q) is None:
            G0 = ec_mul(cof, P1, q)
            if G0 is not None and ec_mul(r, G0, q) is None:
                B, G = b, G0
                break
    print(f"CURVE_B = {B}")
    print(f"G1 = {G}")

    # twist type: E'(Fq2): y^2 = x^3 + b' with b' = B*xi (M) or B/xi (D);
    # the right one has r | #E'.  #E'_M + #E'_D = 2(q^2 + 1) - (t^2 - 2q)...
    # just test by annihilation: #E'(correct) = q^2 + 1 - (t^2 - 2q)... use
    # n_twist = q^2 + 1 - tw_t where tw_t in {t2 - 3f, (t2 +- 3f)/... } —
    # simplest: try both candidate orders by point annihilation.
    t_ = x + 1
    f2 = (t_ * t_ - 4 * q)
    # #E(Fq2) = q^2 + 1 - (t^2 - 2q)
    n2 = q * q + 1 - (t_ * t_ - 2 * q)
    # the two sextic twists have orders q^2 + 1 - (3f - t)/2 ... avoid the
    # closed form: candidate orders are the divisors of the known family
    # value; for BLS12, the correct twist order is (q^2 - q + 1) ... use
    # annihilation by h_tw * r with h_tw = n_cand // r for both conventions.
    def twist_point(bt):
        for xc in range(1, 200):
            for xc1 in range(0, 4):
                xx = (xc % q, xc1 % q)
                rhs_x = F.mul(F.mul(xx, xx), xx)
                rhs = ((rhs_x[0] + bt[0]) % q, (rhs_x[1] + bt[1]) % q)
                yy = F.sqrt(rhs, f2_nonres)
                if yy is not None:
                    return (xx, yy)
        return None

    xi_inv = F.inv((xi[0] % q, xi[1] % q))
    candidates = {
        "M": F.mul((B % q, 0), (xi[0] % q, xi[1] % q)),
        "D": F.mul((B % q, 0), xi_inv),
    }
    twist_type = b_twist = g2 = None
    for ttype, bt in candidates.items():
        P2 = twist_point(bt)
        if P2 is None:
            continue
        # correct twist satisfies r | #E'.  Sextic twists of E/Fq2: with
        # T = t^2 - 2q (trace of E over Fq2) and F2 = t*f where
        # t^2 - 4q = -3 f^2 (CM discriminant -3, BLS family), the two
        # degree-6 twist traces are (±T ± 3*F2)/2 — test all sign
        # choices by r-divisibility + point annihilation.
        fsq = t_ * t_ - 4 * q
        ff = math.isqrt((-fsq) // 3)
        assert -3 * ff * ff == fsq, "CM equation failed"
        T2 = t_ * t_ - 2 * q
        F2 = t_ * ff
        tws = {(sT * T2 + s3 * 3 * F2) // 2 for sT in (1, -1) for s3 in (1, -1)}
        for tw in sorted(tws):
            n_cand = q * q + 1 - tw
            if n_cand <= 0 or n_cand % r:
                continue
            if ec2_mul(n_cand, P2, F) is None:
                cof2 = n_cand // r
                G2c = ec2_mul(cof2, P2, F)
                if G2c is not None and ec2_mul(r, G2c, F) is None:
                    twist_type, b_twist, g2 = ttype, bt, G2c
                    break
        if twist_type:
            break
    print(f"TWIST_TYPE = {twist_type!r}")
    print(f"CURVE_B_TWIST = {b_twist}")
    print(f"G2 = {g2}")

    print()
    print("# ---- emitted constants (synthetic_lowadic.py) ----")
    print(f"BLS_X = {hex(x)}")
    print(f"R_MODULUS = {hex(r)}")
    print(f"Q_MODULUS = {hex(q)}")
    print(f"FR_GENERATOR = {fr_gen}")
    print(f"FQ2_NONRESIDUE = {nr2}")
    print(f"FQ6_NONRESIDUE = {xi}")
    print(f"CURVE_B = {B}")
    print(f"G1_X = {G[0]}")
    print(f"G1_Y = {G[1]}")
    print(f"TWIST_TYPE = {twist_type!r}")
    print(f"CURVE_B_TWIST = {b_twist}")
    print(f"G2_X = {g2[0]}")
    print(f"G2_Y = {g2[1]}")


if __name__ == "__main__":
    main()
