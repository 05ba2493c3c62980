#!/usr/bin/env python
"""Search for a synthetic BLS12 curve whose Fr has LOW 2-adicity.

The reference benches MNT4/6-753 whose Fr is not highly 2-adic, forcing
ark-poly's MixedRadix domain path (benches/bench.rs:5-11; SURVEY §2b
curve-configs row).  Those exact parameter sets are unobtainable offline,
so this constructs a *pairing-enabled* curve with the same defining
property — Fr 2-adicity ~13 with a 3^s small subgroup — so the FULL stack
(curve, pairing, PC, driver) exercises mixed-radix domains end-to-end
(VERDICT r3 next-round item 5).

Family polynomials (same as BLS12-381/377):
    r = x^4 - x^2 + 1,  q = (x-1)^2 r / 3 + x,  t = x + 1,
    #E(Fq) = q + 1 - t = ((x-1)^2/3) * r.

Search constraints on x:
    x ≡ 1 (mod 3)       family divisibility (and the exact final-exp
                         x-decomposition h = u(x+q)(x^2+q^2-1)+1)
    x ≡ 2^12+1 (mod 2^13) -> v2(r-1) = v2(x-1)+v2(x+1) = 12+1 = 13
    x ≡ 1 (mod 27)      -> v3(r-1) >= 3 (mixed-radix small subgroup)
    r, q prime; q ≡ 3 (mod 4) (Fq2 = Fq[u]/(u^2+1))
    x sized so q is 381-bit (same limb shapes as BLS12-381).

Emits the full constant block for marlin_tpu/fields/synthetic_lowadic.py.
"""

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


def search(start_hi=0xD2010000):
    # x = hi * 2^32 + lo with the CRT-fixed residue mod (2^13 * 27 * 3)
    # congruences: x ≡ 4097 mod 8192, x ≡ 1 mod 27 (covers mod 3)
    mod = 8192 * 27
    # CRT solve
    base = next(
        z for z in range(0, mod) if z % 8192 == 4097 and z % 27 == 1
    )
    x0 = (start_hi << 32)
    x = x0 - (x0 % mod) + base
    tried = 0
    while True:
        tried += 1
        x += mod
        r = x**4 - x**2 + 1
        if not is_prime(r, rounds=2):  # cheap prefilter
            continue
        q = (x - 1) ** 2 * r // 3 + x
        if q % 4 != 3:
            continue
        if not (379 <= q.bit_length() <= 382) or r.bit_length() > 256:
            continue
        if not is_prime(q, rounds=2):
            continue
        if is_prime(r) and is_prime(q):  # full-strength confirmation
            return x, r, q, tried


def main():
    x, r, q, tried = search()
    print(f"x = {hex(x)}  (tried {tried} candidates)")
    print(f"r bits = {r.bit_length()}, q bits = {q.bit_length()}")
    print(f"v2(r-1) = {v(2, r - 1)}, v3(r-1) = {v(3, r - 1)}")
    assert v(2, r - 1) == 13

    # Fr generator: smallest g with g^((r-1)/p) != 1 for all prime p | r-1
    # (full factorization of a 255-bit r-1 is infeasible; use the standard
    # partial check on small primes + the big cofactor being... instead,
    # verify primitivity probabilistically against the known small factors
    # and certify order divisibility only for the 2^13*3^s part we USE.)
    r1 = r - 1
    small = []
    m = r1
    for p in [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53]:
        k = v(p, m)
        if k:
            small.append((p, k))
            m //= p**k
    print("small factors of r-1:", small, " residual bits:", m.bit_length())

    # we only need an element of exact order 2^13 * 3^s — find g whose
    # power has full 2- and 3-order (sufficient for domain roots)
    for g in range(2, 200):
        ok2 = pow(g, r1 // 2, r) != 1
        ok3 = pow(g, r1 // 3, r) != 1
        if ok2 and ok3:
            gen = g
            break
    print(f"FR root base (2,3-primitive): {gen}")

    # Fq2 nonresidue: q ≡ 3 mod 4 -> -1 is a nonresidue
    assert pow(q - 1, (q - 1) // 2, q) == q - 1
    # tower xi = u + 1 must be a non-square and non-cube in Fq2.
    # check via the norm: xi = a + bu, N(xi) = a^2 + b^2 (u^2 = -1);
    # xi is a square in Fq2 iff N(xi)^((q-1)/2) == 1
    for a, b in [(1, 1), (2, 1), (1, 2), (3, 1), (1, 3), (2, 3)]:
        norm = (a * a + b * b) % q
        sq = pow(norm, (q - 1) // 2, q) == 1
        cube_ok = True
        if (q * q - 1) % 3 == 0:
            # xi non-cube in Fq2 iff xi^((q^2-1)/3) != 1; compute in Fq2
            e = (q * q - 1) // 3
            c0, c1 = a % q, b % q
            x0, x1 = 1, 0
            base0, base1 = c0, c1
            ee = e
            while ee:
                if ee & 1:
                    x0, x1 = (x0 * base0 - x1 * base1) % q, (x0 * base1 + x1 * base0) % q
                base0, base1 = (base0 * base0 - base1 * base1) % q, (2 * base0 * base1) % q
                ee >>= 1
            cube_ok = not (x0 == 1 and x1 == 0)
        if (not sq) and cube_ok:
            print(f"xi = {a} + {b}u  (non-square, non-cube in Fq2)")
            break
    else:
        print("no small xi found", file=sys.stderr)

    # curve b: try small b, sample a point, annihilate by #E = cofactor*r
    cof = (x - 1) ** 2 // 3
    nE = q + 1 - (x + 1)
    assert nE == cof * r

    def on_curve_pt(b):
        for xc in range(1, 200):
            rhs = (xc**3 + b) % q
            if pow(rhs, (q - 1) // 2, q) == 1:
                y = pow(rhs, (q + 1) // 4, q)  # q ≡ 3 mod 4
                return xc, y
        return None

    def ec_mul(k, P, b_):
        # affine double-and-add (None = infinity)
        def add(P1, P2):
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

        R_, A = None, P
        while k:
            if k & 1:
                R_ = add(R_, A)
            A = add(A, A)
            k >>= 1
        return R_

    for b in range(1, 30):
        P = on_curve_pt(b)
        if P is None:
            continue
        if ec_mul(nE, P, b) is None and ec_mul(r, ec_mul(cof, P, b), b) is None:
            G = ec_mul(cof, P, b)
            if G is not None:
                print(f"CURVE_B = {b}")
                print(f"G1 = {G}")
                break
    else:
        print("no small b found", file=sys.stderr)
        return

    print()
    print("# ---- emitted constants ----")
    print(f"BLS_X = {hex(x)}")
    print(f"R_MODULUS = {hex(r)}")
    print(f"Q_MODULUS = {hex(q)}")
    print(f"CURVE_B = {b}")
    print(f"G1_X = {G[0]}")
    print(f"G1_Y = {G[1]}")


if __name__ == "__main__":
    main()
