"""Fiat-Shamir transcript tests: native C library vs pure-Python reference,
ChaCha20 vs RFC test vector, sampling determinism."""

import hashlib
import struct

from marlin_tpu.fields import bls12_381 as P
from marlin_tpu.snark import fs as fs_mod
from marlin_tpu.snark import native
from marlin_tpu.snark.fs import ChaCha20Rng, FiatShamirRng, _chacha_block

import pytest

pytestmark = pytest.mark.smoke


def test_chacha_block_djb_zero_key():
    # djb ChaCha20, key=0, counter=0, nonce=0: well-known first block
    block = _chacha_block((0,) * 8, 0)
    raw = struct.pack("<16I", *block)
    assert raw[:16].hex() == "76b8e0ada0f13d90405d6ae55386bd28"


def test_native_matches_python():
    if not native.available():
        import pytest

        pytest.skip("native host library unavailable")
    for data in [b"", b"abc", b"x" * 63, b"y" * 64, b"z" * 65, b"w" * 1000]:
        assert native.blake2s256(data) == hashlib.blake2s(data).digest()
    seed = hashlib.blake2s(b"seed").digest()
    assert native.fs_absorb(b"msg", seed) == hashlib.blake2s(b"msg" + seed).digest()
    for counter in [0, 1, 2**33]:
        raw = native.chacha20_block(seed, counter)
        py = struct.pack("<16I", *_chacha_block(struct.unpack("<8I", seed), counter))
        assert raw == py


def test_fs_determinism_and_sensitivity():
    a = FiatShamirRng(b"hello")
    b = FiatShamirRng(b"hello")
    assert a.rand_fr() == b.rand_fr()
    c = FiatShamirRng(b"hellp")
    assert FiatShamirRng(b"hello").rand_fr() != c.rand_fr()
    # absorb changes the stream
    d = FiatShamirRng(b"hello")
    d.absorb(b"more")
    assert d.rand_fr() != FiatShamirRng(b"hello").rand_fr()


def test_rand_fr_in_range():
    rng = FiatShamirRng(b"range")
    for _ in range(20):
        v = rng.rand_fr()
        assert 0 <= v < P.R_MODULUS


def test_rand_u128_order():
    # u128 = low u64 then high u64 (rand's Standard impl)
    rng1 = FiatShamirRng(b"u128")
    v = rng1.rand_u128()
    rng2 = FiatShamirRng(b"u128")
    lo = rng2.rng.next_u64()
    hi = rng2.rng.next_u64()
    assert v == (hi << 64) | lo
