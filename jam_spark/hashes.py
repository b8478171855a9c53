"""Hash functions with bit-exact parity to jam-rs's hash layer.

The reference (``/root/reference/src/hash_functions.rs``) exposes four hash
primitives, selected by ``(algo, kmer_size)``:

* ``xxhash3(&[u8]) -> u64``       — xxh3_64, arbitrary byte input (k >= 32 path)
* ``xxhash3_u64(u64) -> u64``     — xxh3_64 over the 8 big-endian bytes
* ``ahash(u64) -> u64``           — simplified ahash-fallback (default, k < 32)
* ``murmur3(&[u8]) -> u64``       — murmur3 x64_128 low 64 bits, seed 42

This module re-implements all four from their public specifications
(xxHash spec / XXH3 reference implementation, MurmurHash3 public domain
code, ahash-fallback arithmetic quoted verbatim in the reference at
``src/hash_functions.rs:23-27``), and is verified against the golden
vectors committed in the reference's unit tests
(``src/hash_functions.rs:84-106``).

Two implementation tiers:

* **Scalar** (Python ints): exact, any length — used for golden tests,
  the pure-Python oracle, and rare long tokens.
* **Vectorized** (numpy uint64): used inside pandas/Arrow UDFs — covers
  ``ahash``/``xxh3_u64`` on u64 arrays and ``xxh3_64`` for byte strings
  of length <= 16 (which covers essentially all word tokens).

No code is copied from the reference; the ahash constants are the two
public constants the reference derives from pi digits.
"""

from __future__ import annotations

import numpy as np

M64 = (1 << 64) - 1
M32 = (1 << 32) - 1

# --- XXH3 public constants (xxHash specification) ---
PRIME32_1 = 0x9E3779B1
PRIME32_2 = 0x85EBCA77
PRIME32_3 = 0xC2B2AE3D
PRIME64_1 = 0x9E3779B185EBCA87
PRIME64_2 = 0xC2B2AE3D27D4EB4F
PRIME64_3 = 0x165667B19E3779F9
PRIME64_4 = 0x85EBCA77C2B2AE63
PRIME64_5 = 0x27D4EB2F165667C5
PRIME_MX1 = 0x165667919E3779F9
PRIME_MX2 = 0x9FB21C651E98DF25

KSECRET = bytes.fromhex(
    "b8fe6c3923a44bbe7c01812cf721ad1c"
    "ded46de9839097db7240a4a4b7b3671f"
    "cb79e64eccc0e578825ad07dccff7221"
    "b8084674f743248ee03590e6813a264c"
    "3c2852bb91c300cb88d0658b1b532ea3"
    "71644897a20df94e3819ef46a9deacd8"
    "a8fa763fe39c343ff9dcbbc7c70b4f1d"
    "8a51e04bcdb45931c89f7ec9d9787364"
    "eac5ac8334d3ebc3c581a0fffa1363eb"
    "170ddd51b7f0da49d316552629d4689e"
    "2b16be587d47a1fc8ff8b8d17ad031ce"
    "45cb3a8f951604286afd7fbcabb4b407"
)
assert len(KSECRET) == 192

# ahash-fallback constants (reference src/hash_functions.rs:5-6; derived
# from pi digits, stated in the public ahash crate).
AHASH_KEY1 = 0xE121_19C4_114F_22A7
AHASH_ROT = 0x60E5 & 63  # rust rotate_left takes shift mod 64
AHASH_MULT = 6364136223846793005


def _r64(b: bytes, off: int) -> int:
    return int.from_bytes(b[off : off + 8], "little")


def _r32(b: bytes, off: int) -> int:
    return int.from_bytes(b[off : off + 4], "little")


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M64


def _swap32(x: int) -> int:
    return int.from_bytes((x & M32).to_bytes(4, "little"), "big")


def _swap64(x: int) -> int:
    return int.from_bytes((x & M64).to_bytes(8, "little"), "big")


def _mul128_fold64(a: int, b: int) -> int:
    p = a * b
    return ((p & M64) ^ (p >> 64)) & M64


def _xxh64_avalanche(h: int) -> int:
    h &= M64
    h ^= h >> 33
    h = (h * PRIME64_2) & M64
    h ^= h >> 29
    h = (h * PRIME64_3) & M64
    h ^= h >> 32
    return h


def _xxh3_avalanche(h: int) -> int:
    h &= M64
    h ^= h >> 37
    h = (h * PRIME_MX1) & M64
    h ^= h >> 32
    return h


def _rrmxmx(h: int, length: int) -> int:
    h ^= _rotl64(h, 49) ^ _rotl64(h, 24)
    h = (h * PRIME_MX2) & M64
    h ^= (h >> 35) + length
    h &= M64
    h = (h * PRIME_MX2) & M64
    h ^= h >> 28
    return h


def _mix16(data: bytes, doff: int, secret: bytes, soff: int, seed: int) -> int:
    lo = _r64(data, doff) ^ ((_r64(secret, soff) + seed) & M64)
    hi = _r64(data, doff + 8) ^ ((_r64(secret, soff + 8) - seed) & M64)
    return _mul128_fold64(lo, hi)


def xxh3_64(data: bytes, seed: int = 0) -> int:
    """XXH3 64-bit, default secret. Parity with xxhash_rust's xxh3_64.

    Golden: xxh3_64(b"AAAAAAAAAAA") == 0x92994E9987384EE2
    (reference src/hash_functions.rs:84-86).
    """
    n = len(data)
    sec = KSECRET
    if n == 0:
        return _xxh64_avalanche(
            (seed ^ _r64(sec, 56) ^ _r64(sec, 64)) & M64
        )
    if n <= 3:
        c1, c2, c3 = data[0], data[n >> 1], data[n - 1]
        combined = ((c1 << 16) | (c2 << 24) | c3 | (n << 8)) & M32
        bitflip = ((_r32(sec, 0) ^ _r32(sec, 4)) + seed) & M64
        return _xxh64_avalanche(combined ^ bitflip)
    if n <= 8:
        s = (seed ^ (_swap32(seed & M32) << 32)) & M64
        in1 = _r32(data, 0)
        in2 = _r32(data, n - 4)
        bitflip = ((_r64(sec, 8) ^ _r64(sec, 16)) - s) & M64
        input64 = (in2 + (in1 << 32)) & M64
        return _rrmxmx(input64 ^ bitflip, n)
    if n <= 16:
        bf1 = ((_r64(sec, 24) ^ _r64(sec, 32)) + seed) & M64
        bf2 = ((_r64(sec, 40) ^ _r64(sec, 48)) - seed) & M64
        lo = _r64(data, 0) ^ bf1
        hi = _r64(data, n - 8) ^ bf2
        acc = (n + _swap64(lo) + hi + _mul128_fold64(lo, hi)) & M64
        return _xxh3_avalanche(acc)
    if n <= 128:
        acc = (n * PRIME64_1) & M64
        if n > 32:
            if n > 64:
                if n > 96:
                    acc = (acc + _mix16(data, 48, sec, 96, seed)) & M64
                    acc = (acc + _mix16(data, n - 64, sec, 112, seed)) & M64
                acc = (acc + _mix16(data, 32, sec, 64, seed)) & M64
                acc = (acc + _mix16(data, n - 48, sec, 80, seed)) & M64
            acc = (acc + _mix16(data, 16, sec, 32, seed)) & M64
            acc = (acc + _mix16(data, n - 32, sec, 48, seed)) & M64
        acc = (acc + _mix16(data, 0, sec, 0, seed)) & M64
        acc = (acc + _mix16(data, n - 16, sec, 16, seed)) & M64
        return _xxh3_avalanche(acc)
    if n <= 240:
        acc = (n * PRIME64_1) & M64
        for i in range(8):
            acc = (acc + _mix16(data, 16 * i, sec, 16 * i, seed)) & M64
        acc = _xxh3_avalanche(acc)
        for i in range(8, n // 16):
            acc = (acc + _mix16(data, 16 * i, sec, 16 * (i - 8) + 3, seed)) & M64
        acc = (acc + _mix16(data, n - 16, sec, 136 - 17, seed)) & M64
        return _xxh3_avalanche(acc)
    return _xxh3_long(data, _custom_secret(seed))


def _custom_secret(seed: int) -> bytes:
    """XXH3_initCustomSecret: the long-input path with seed != 0 runs the
    seedless algorithm over a derived secret — kSecret with +seed/-seed
    applied to alternating 8-byte lanes (public XXH3 spec / xxhash.h
    XXH3_INIT_ACC..XXH3_initCustomSecret). No external golden vector was
    available in this sandbox for the seeded >240B path (no network, no
    xxhash module, no crate cache); the derivation below is the complete
    spec transform, and the pipeline itself only ever uses seed 0 (the
    seeded path exists to close the API, not as a hot path)."""
    if seed == 0:
        return KSECRET
    out = bytearray(192)
    for i in range(12):
        lo = (_r64(KSECRET, 16 * i) + seed) & M64
        hi = (_r64(KSECRET, 16 * i + 8) - seed) & M64
        out[16 * i : 16 * i + 8] = lo.to_bytes(8, "little")
        out[16 * i + 8 : 16 * i + 16] = hi.to_bytes(8, "little")
    return bytes(out)


def _xxh3_long(data: bytes, sec: bytes = None) -> int:
    n = len(data)
    if sec is None:
        sec = KSECRET
    acc = [
        PRIME32_3, PRIME64_1, PRIME64_2, PRIME64_3,
        PRIME64_4, PRIME32_2, PRIME64_5, PRIME32_1,
    ]
    nb_stripes_per_block = (192 - 64) // 8  # 16
    block_len = 64 * nb_stripes_per_block  # 1024
    nb_blocks = (n - 1) // block_len

    def accumulate(stripe_off: int, secret_off: int) -> None:
        for i in range(8):
            dv = _r64(data, stripe_off + 8 * i)
            dk = dv ^ _r64(sec, secret_off + 8 * i)
            acc[i ^ 1] = (acc[i ^ 1] + dv) & M64
            acc[i] = (acc[i] + (dk & M32) * (dk >> 32)) & M64

    def scramble() -> None:
        for i in range(8):
            a = acc[i]
            a ^= a >> 47
            a ^= _r64(sec, 192 - 64 + 8 * i)
            acc[i] = (a * PRIME32_1) & M64

    for b in range(nb_blocks):
        for s in range(nb_stripes_per_block):
            accumulate(b * block_len + 64 * s, 8 * s)
        scramble()

    off = nb_blocks * block_len
    nb_stripes = (n - 1 - off) // 64
    for s in range(nb_stripes):
        accumulate(off + 64 * s, 8 * s)
    accumulate(n - 64, 192 - 64 - 7)

    result = (n * PRIME64_1) & M64
    for i in range(4):
        result = (
            result
            + _mul128_fold64(
                acc[2 * i] ^ _r64(sec, 11 + 16 * i),
                acc[2 * i + 1] ^ _r64(sec, 11 + 16 * i + 8),
            )
        ) & M64
    return _xxh3_avalanche(result)


def xxh3_u64(kmer: int) -> int:
    """Reference ``xxhash3_u64``: xxh3_64 over big-endian bytes of the u64.

    Golden: xxh3_u64(0x0AAAAAAAAAAAAAAA) == 5855080426738543665
    (src/hash_functions.rs:98-101).
    """
    return xxh3_64((kmer & M64).to_bytes(8, "big"))


def ahash_u64(kmer: int) -> int:
    """Reference ``ahash`` (simplified ahash-fallback, src/hash_functions.rs:23-27).

    Golden: ahash_u64(0x0AAAAAAAAAAAAAAA) == 6369629604220809163.
    """
    temp = ((kmer ^ AHASH_KEY1) & M64) * AHASH_MULT
    temp2 = (temp & M64) ^ (temp >> 64)
    return _rotl64(temp2 & M64, AHASH_ROT)


# --- XXH64 (classic xxHash, public spec) ---
# Used by the JVM-native sketch mode: Spark's built-in ``xxhash64``
# SQL function is XXH64 with seed 42 over the value's bytes; this scalar
# implementation gives the oracle bit-parity with it.

_P64_1 = PRIME64_1
_P64_2 = PRIME64_2
_P64_3 = PRIME64_3
_P64_4 = PRIME64_4
_P64_5 = PRIME64_5


def _xxh64_round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P64_2) & M64
    acc = _rotl64(acc, 31)
    return (acc * _P64_1) & M64


def _xxh64_merge_round(acc: int, val: int) -> int:
    acc ^= _xxh64_round(0, val)
    return (acc * _P64_1 + _P64_4) & M64


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64. Default seed 42 = Spark's ``xxhash64`` SQL function."""
    n = len(data)
    if n >= 32:
        v1 = (seed + _P64_1 + _P64_2) & M64
        v2 = (seed + _P64_2) & M64
        v3 = seed & M64
        v4 = (seed - _P64_1) & M64
        i = 0
        while i <= n - 32:
            v1 = _xxh64_round(v1, _r64(data, i))
            v2 = _xxh64_round(v2, _r64(data, i + 8))
            v3 = _xxh64_round(v3, _r64(data, i + 16))
            v4 = _xxh64_round(v4, _r64(data, i + 24))
            i += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
        ) & M64
        h = _xxh64_merge_round(h, v1)
        h = _xxh64_merge_round(h, v2)
        h = _xxh64_merge_round(h, v3)
        h = _xxh64_merge_round(h, v4)
    else:
        h = (seed + _P64_5) & M64
        i = 0
    h = (h + n) & M64
    while i <= n - 8:
        h ^= _xxh64_round(0, _r64(data, i))
        h = (_rotl64(h, 27) * _P64_1 + _P64_4) & M64
        i += 8
    if i <= n - 4:
        h ^= (_r32(data, i) * _P64_1) & M64
        h = (_rotl64(h, 23) * _P64_2 + _P64_3) & M64
        i += 4
    while i < n:
        h ^= (data[i] * _P64_5) & M64
        h = (_rotl64(h, 11) * _P64_1) & M64
        i += 1
    h ^= h >> 33
    h = (h * _P64_2) & M64
    h ^= h >> 29
    h = (h * _P64_3) & M64
    h ^= h >> 32
    return h


# --- MurmurHash3 x64_128 (public domain algorithm, Austin Appleby) ---

def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & M64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & M64
    k ^= k >> 33
    return k


def murmur3_x64_128_low64(data: bytes, seed: int = 42) -> int:
    """Low 64 bits of MurmurHash3 x64_128 — parity with reference ``murmur3``
    (fastmurmur3 with seed 42, src/hash_functions.rs:31-38).

    Golden: murmur3(b"AAAAAAAAAAA") == 7773142420371383521.
    """
    n = len(data)
    h1 = seed & M64
    h2 = seed & M64
    c1 = 0x87C37B91114253D5
    c2 = 0x4CF5AD432745937F
    nblocks = n // 16
    for i in range(nblocks):
        k1 = _r64(data, i * 16)
        k2 = _r64(data, i * 16 + 8)
        k1 = (k1 * c1) & M64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & M64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & M64
        h1 = (h1 * 5 + 0x52DCE729) & M64
        k2 = (k2 * c2) & M64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * c1) & M64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & M64
        h2 = (h2 * 5 + 0x38495AB5) & M64
    tail = data[nblocks * 16 :]
    k1 = 0
    k2 = 0
    tl = len(tail)
    if tl > 8:
        for i in range(tl - 1, 7, -1):
            k2 = (k2 << 8) | tail[i]
        k2 = (k2 * c2) & M64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * c1) & M64
        h2 ^= k2
    if tl > 0:
        for i in range(min(tl, 8) - 1, -1, -1):
            k1 = (k1 << 8) | tail[i]
        k1 = (k1 * c1) & M64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & M64
        h1 ^= k1
    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & M64
    h2 = (h2 + h1) & M64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & M64
    # h2 = (h2 + h1) — not needed for the low 64 bits
    return h1


def murmur3_u64(kmer: int) -> int:
    """Reference ``murmur3_u64``: murmur3 over big-endian bytes.

    Golden: murmur3_u64(0x0AAAAAAAAAAAAAAA) == 442865051503200633.
    """
    return murmur3_x64_128_low64((kmer & M64).to_bytes(8, "big"))


# =====================================================================
# Vectorized (numpy) tier — the pandas-UDF hot path.
# All arrays are np.uint64; arithmetic wraps mod 2^64 like the scalar tier.
# =====================================================================

_U64 = np.uint64
_U32MASK = _U64(M32)


def _np_mulhi(a: np.ndarray, b: np.ndarray | int) -> np.ndarray:
    """High 64 bits of u64*u64 via 32-bit limbs (wrap-free)."""
    b = np.asarray(b, dtype=_U64)
    al = a & _U32MASK
    ah = a >> _U64(32)
    bl = b & _U32MASK
    bh = b >> _U64(32)
    lo_lo = al * bl
    hi_lo = ah * bl
    lo_hi = al * bh
    hi_hi = ah * bh
    cross = (lo_lo >> _U64(32)) + (hi_lo & _U32MASK) + lo_hi
    return hi_hi + (hi_lo >> _U64(32)) + (cross >> _U64(32))


def _np_rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U64(r)) | (x >> _U64(64 - r))


def _np_swap32(x: np.ndarray) -> np.ndarray:
    """Byteswap the low 32 bits of each u64 (result fits in 32 bits)."""
    x = x & _U32MASK
    return (
        ((x & _U64(0xFF)) << _U64(24))
        | ((x & _U64(0xFF00)) << _U64(8))
        | ((x >> _U64(8)) & _U64(0xFF00))
        | ((x >> _U64(24)) & _U64(0xFF))
    )


def ahash_u64_np(h: np.ndarray) -> np.ndarray:
    """Vectorized reference ``ahash``; bit-equal to :func:`ahash_u64`."""
    h = np.asarray(h, dtype=_U64)
    x = h ^ _U64(AHASH_KEY1)
    lo = x * _U64(AHASH_MULT)
    hi = _np_mulhi(x, AHASH_MULT)
    t = lo ^ hi
    return _np_rotl(t, AHASH_ROT)


_XXH3_48_BITFLIP = _U64((_r64(KSECRET, 8) ^ _r64(KSECRET, 16)) & M64)
_PRIME_MX2_U = _U64(PRIME_MX2)


def xxh3_u64_np(kmer: np.ndarray) -> np.ndarray:
    """Vectorized reference ``xxhash3_u64`` (xxh3 of the 8 BE bytes,
    i.e. the 4-8 byte path of XXH3 with seed 0); bit-equal to
    :func:`xxh3_u64`. In-place ops: minimal temporaries so the pandas-UDF
    hot loop stays allocation-light under many parallel workers."""
    k = np.asarray(kmer, dtype=_U64)
    # big-endian byte image read as two little-endian u32s
    in1 = _np_swap32(k >> _U64(32))  # bytes [0..4)
    h = _np_swap32(k)  # bytes [4..8)
    in1 <<= _U64(32)
    h += in1
    h ^= _XXH3_48_BITFLIP
    t = h << _U64(49)
    t |= h >> _U64(15)  # rotl 49
    np.left_shift(h, _U64(24), out=in1)
    in1 |= h >> _U64(40)  # rotl 24
    t ^= in1
    h ^= t
    h *= _PRIME_MX2_U
    np.right_shift(h, _U64(35), out=t)
    t += _U64(8)
    h ^= t
    h *= _PRIME_MX2_U
    np.right_shift(h, _U64(28), out=t)
    h ^= t
    return h


def murmur3_u64_np(kmer: np.ndarray) -> np.ndarray:
    """Vectorized reference ``murmur3_u64`` (x64_128 low64, seed 42,
    8-byte big-endian input ⇒ single tail block path)."""
    k = np.asarray(kmer, dtype=_U64)
    c1 = _U64(0x87C37B91114253D5)
    c2 = _U64(0x4CF5AD432745937F)
    h1 = _U64(42)
    h2 = _U64(42)
    # tail: 8 bytes big-endian; k1 accumulates tail[7]..tail[0] -> swap64
    k1 = _np_byteswap64(k)
    k1 = k1 * c1
    k1 = _np_rotl(k1, 31)
    k1 = k1 * c2
    h1 = h1 ^ k1
    h1 = h1 ^ _U64(8)
    h2 = h2 ^ _U64(8)
    h1 = h1 + h2
    h2 = h2 + h1
    h1 = _np_fmix64(h1)
    h2 = _np_fmix64(h2)
    h1 = h1 + h2
    return h1


def _np_byteswap64(x: np.ndarray) -> np.ndarray:
    return np.asarray(x, dtype=_U64).byteswap()


def _np_fmix64(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> _U64(33))
    k = k * _U64(0xFF51AFD7ED558CCD)
    k = k ^ (k >> _U64(33))
    k = k * _U64(0xC4CEB9FE1A85EC53)
    k = k ^ (k >> _U64(33))
    return k


# --- vectorized xxh3_64 for short byte strings (tokens), len 0..16 ---

_B0_3 = _U64((_r32(KSECRET, 0) ^ _r32(KSECRET, 4)) & M64)
_B9_16_1 = _U64((_r64(KSECRET, 24) ^ _r64(KSECRET, 32)) & M64)
_B9_16_2 = _U64((_r64(KSECRET, 40) ^ _r64(KSECRET, 48)) & M64)
_EMPTY_HASH = None  # computed lazily


def _np_xxh64_avalanche(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> _U64(33))
    h = h * _U64(PRIME64_2)
    h = h ^ (h >> _U64(29))
    h = h * _U64(PRIME64_3)
    h = h ^ (h >> _U64(32))
    return h


def _np_xxh3_avalanche(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> _U64(37))
    h = h * _U64(PRIME_MX1)
    h = h ^ (h >> _U64(32))
    return h


def _np_mul128_fold64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a * b) ^ _np_mulhi(a, b)


def xxh3_64_short_np(mat: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Vectorized XXH3-64 (seed 0) for byte strings of length 0..16.

    ``mat`` is an (n, >=16) uint8 matrix of zero-padded inputs; ``lengths``
    the true lengths. Bit-equal to :func:`xxh3_64` on each row.

    Implementation reads each row as two little-endian u64 words and
    derives the offset reads (len-4 / len-8) with per-element shifts —
    no 2D index gathers, so temporaries stay O(n) words.
    """
    n = mat.shape[0]
    lengths = np.asarray(lengths, dtype=np.int64)
    out = np.zeros(n, dtype=_U64)
    sub16 = np.ascontiguousarray(mat[:, :16])
    w = sub16.view("<u8")
    w0 = w[:, 0]
    w1 = w[:, 1]

    m0 = lengths == 0
    if m0.any():
        global _EMPTY_HASH
        if _EMPTY_HASH is None:
            _EMPTY_HASH = xxh3_64(b"")
        out[m0] = _U64(_EMPTY_HASH)

    m13 = (lengths >= 1) & (lengths <= 3)
    if m13.any():
        ln = lengths[m13]
        sub = mat[m13]
        r = np.arange(sub.shape[0])
        c1 = sub[r, 0].astype(_U64)
        c2 = sub[r, ln >> 1].astype(_U64)
        c3 = sub[r, ln - 1].astype(_U64)
        combined = (c1 << _U64(16)) | (c2 << _U64(24)) | c3 | (
            ln.astype(_U64) << _U64(8)
        )
        out[m13] = _np_xxh64_avalanche(combined ^ _B0_3)

    m48 = (lengths >= 4) & (lengths <= 8)
    if m48.any():
        ln = lengths[m48].astype(_U64)
        lw0 = w0[m48]
        in1 = lw0 & _U32MASK  # read32 at offset 0
        sh = (ln - _U64(4)) * _U64(8)  # offset (len-4) ∈ [0,4] → sh ≤ 32
        in2 = (lw0 >> sh) & _U32MASK
        input64 = in2 + (in1 << _U64(32))
        h = input64 ^ _XXH3_48_BITFLIP
        h = h ^ (_np_rotl(h, 49) ^ _np_rotl(h, 24))
        h = h * _PRIME_MX2_U
        h = h ^ ((h >> _U64(35)) + ln)
        h = h * _PRIME_MX2_U
        out[m48] = h ^ (h >> _U64(28))

    m916 = (lengths >= 9) & (lengths <= 16)
    if m916.any():
        ln = lengths[m916].astype(_U64)
        lw0 = w0[m916]
        lw1 = w1[m916]
        lo = lw0 ^ _B9_16_1
        # read64 at offset (len-8) ∈ [1,8]: stitch across the two words;
        # clamp the shift pair to stay < 64 and fix the off==8 rows after
        sh = (ln - _U64(8)) * _U64(8)  # ∈ [8,64]
        shc = np.minimum(sh, _U64(56))
        hi_raw = (lw0 >> shc) | (lw1 << (_U64(64) - shc))
        hi_raw = np.where(sh == _U64(64), lw1, hi_raw)
        hi = hi_raw ^ _B9_16_2
        acc = (
            ln
            + _np_byteswap64(lo)
            + hi
            + _np_mul128_fold64(lo, hi)
        )
        out[m916] = _np_xxh3_avalanche(acc)

    return out


def hash_tokens(tokens: "list[bytes] | np.ndarray") -> np.ndarray:
    """xxh3_64 each byte-string token; vectorized for len<=16, scalar
    fallback for longer tokens. Returns uint64 array."""
    n = len(tokens)
    lengths = np.fromiter((len(t) for t in tokens), dtype=np.int64, count=n)
    out = np.zeros(n, dtype=_U64)
    short = lengths <= 16
    if short.any():
        idx = np.where(short)[0]
        mat = np.zeros((len(idx), 24), dtype=np.uint8)
        for row, i in enumerate(idx):
            t = tokens[i]
            mat[row, : len(t)] = np.frombuffer(t, dtype=np.uint8)
        out[idx] = xxh3_64_short_np(mat, lengths[idx])
    if (~short).any():
        for i in np.where(~short)[0]:
            out[i] = xxh3_64(tokens[i])
    return out
