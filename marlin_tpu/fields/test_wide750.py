"""Synthetic 750-bit low-2-adicity scalar field (Fr-only test config).

The reference benches MNT4-753 / MNT6-753 — 753-bit fields whose Fr has
low 2-adicity, forcing ark-poly's MixedRadix domain path
(benches/bench.rs:5-11,161-175).  Those exact parameter sets are not
obtainable in this offline image (README "Curves"), so this config proves
the same *machinery* at the same scale: a ~750-bit modulus (48 sixteen-bit
limbs — double the 24-limb widest live curve) whose Fr forces the
mixed-radix NTT for every protocol-sized domain (2-adicity 13, small
subgroup 3^4).

Construction (re-derived from first principles in
tests/test_wide750.py): the least k >= 2^749/M, k odd, 3 ∤ k, with
r = k*M + 1 prime for M = 2^13 * 3^4.  r = 2^749 + 853,648,385 * M + ...;
exactly: r - 1 = 2^13 * 3^4 * t with t odd, 3 ∤ t.

This is an **Fr-only** configuration: it has no curve, no pairing, no PC
layer.  It drives the AHP (reference layer 2, src/ahp/ — which never
touches curve points, SURVEY.md §1 row 2), the 48-limb Montgomery field
kernels, and the mixed-radix NTT end-to-end.
"""

# r = k * (2^13 * 3^4) + 1, 750 bits, prime (64-round Miller-Rabin), with
# exactly 2-adicity 13 and 3-adicity 4; re-verified in tests/test_wide750.py
R_MODULUS = 0x20000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000032E2A001

# 7^((r-1)/2^13) has exact order 2^13 and 7^((r-1)/(2^13*3^4)) exact order
# 2^13*3^4 (both checked in tests); 7 is the subgroup-structure generator
# the domain machinery needs (full-group generation is not protocol-relevant)
FR_GENERATOR = 7

FR_TWO_ADICITY = 13
FR_TWO_ADIC_ROOT_OF_UNITY = pow(FR_GENERATOR, (R_MODULUS - 1) >> FR_TWO_ADICITY, R_MODULUS)

FR_SMALL_SUBGROUP_BASE = 3
FR_SMALL_SUBGROUP_ADICITY = 4
FR_LARGE_SUBGROUP_ROOT_OF_UNITY = pow(
    FR_GENERATOR,
    (R_MODULUS - 1)
    // ((1 << FR_TWO_ADICITY) * FR_SMALL_SUBGROUP_BASE**FR_SMALL_SUBGROUP_ADICITY),
    R_MODULUS,
)

# Montgomery radix 2^768 -> 48 sixteen-bit device limbs
FR_BITS = 750
FR_BYTES = 96
FR_MONT_R = (1 << 768) % R_MODULUS
FR_MONT_R2 = (FR_MONT_R * FR_MONT_R) % R_MODULUS
FR_MONT_INV = pow(-R_MODULUS, -1, 1 << 768)

CURVE_NAME = "test_wide750"
