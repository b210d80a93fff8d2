"""Field specification for the TPU limb engine.

TPU-first data model (SURVEY.md §7): field elements are structure-of-arrays
`uint32[..., L]` tensors of 15-bit little-endian limbs, held in Montgomery
form with R = 2^(15*L).

Why 15-bit limbs in u32 lanes: the TPU VPU has no 64-bit integer multiply,
so limb products must be exact in uint32.  15-bit digits leave one bit of
*lazy headroom*: sums of a few field elements keep digits <= 2^15 + eps
after a single cheap fold pass (no carry chain), and (2^15 + eps)^2 still
fits u32 — so additions in the hot point/NTT kernels cost one vector add,
with full carry resolution (Kogge-Stone) needed only at canonical
boundaries.  See fields/fp.py for the exact bound ledger.

Range regime: R >= 64*p (one limb above the minimum), values live in
[0, 8p) between reductions, Montgomery mul accepts inputs < 8p and returns
< 2p.  Covers the `ark-ff` behavior consumed by the reference
(SURVEY.md §2.2 row "Prime-field arithmetic").
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import numpy as np

LIMB_BITS = 15
LIMB_MASK = (1 << LIMB_BITS) - 1


def int_to_limbs(v: int, n_limbs: int) -> Tuple[int, ...]:
    assert v >= 0
    out = []
    for _ in range(n_limbs):
        out.append(v & LIMB_MASK)
        v >>= LIMB_BITS
    assert v == 0, "value does not fit"
    return tuple(out)


def limbs_to_int(limbs) -> int:
    v = 0
    for i, l in enumerate(limbs):
        v += int(l) << (LIMB_BITS * i)
    return v


@dataclasses.dataclass(frozen=True)
class FpSpec:
    name: str
    modulus: int
    n_limbs: int
    # tuples so the spec is hashable (usable as a static jit argument)
    p_limbs: Tuple[int, ...]
    two_p_limbs: Tuple[int, ...]
    four_p_limbs: Tuple[int, ...]
    eight_p_limbs: Tuple[int, ...]
    n0inv: int  # -p^-1 mod 2^LIMB_BITS
    r_mod_p: int
    r2_mod_p: int
    r_limbs: Tuple[int, ...]  # R mod p (standard form), as limbs
    r2_limbs: Tuple[int, ...]
    one_mont: Tuple[int, ...]  # R mod p == Montgomery form of 1

    @property
    def R(self) -> int:
        return 1 << (LIMB_BITS * self.n_limbs)

    def to_mont_int(self, v: int) -> int:
        return v * self.R % self.modulus

    def from_mont_int(self, v: int) -> int:
        return v * pow(self.R, self.modulus - 2, self.modulus) % self.modulus


@functools.lru_cache(maxsize=None)
def make_spec(modulus: int, name: str = "fp") -> FpSpec:
    bits = modulus.bit_length()
    n_limbs = (bits + LIMB_BITS - 1) // LIMB_BITS
    # lazy-range regime requires 64p <= R (see module docstring)
    while 64 * modulus > (1 << (LIMB_BITS * n_limbs)):
        n_limbs += 1
    R = 1 << (LIMB_BITS * n_limbs)
    n0inv = (-pow(modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
    r_mod_p = R % modulus
    r2_mod_p = R * R % modulus
    return FpSpec(
        name=name,
        modulus=modulus,
        n_limbs=n_limbs,
        p_limbs=int_to_limbs(modulus, n_limbs),
        two_p_limbs=int_to_limbs(2 * modulus, n_limbs),
        four_p_limbs=int_to_limbs(4 * modulus, n_limbs),
        eight_p_limbs=int_to_limbs(8 * modulus, n_limbs),
        n0inv=n0inv,
        r_mod_p=r_mod_p,
        r2_mod_p=r2_mod_p,
        r_limbs=int_to_limbs(r_mod_p, n_limbs),
        r2_limbs=int_to_limbs(r2_mod_p, n_limbs),
        one_mont=int_to_limbs(r_mod_p, n_limbs),
    )


# -- host-side batch codecs (numpy-accelerated) ------------------------------


def encode(values, spec: FpSpec, mont: bool = True) -> np.ndarray:
    """python ints -> uint32[L, N] 15-bit limbs (Montgomery by default),
    limb-major (limb axis leads; elements on the trailing axis).

    Vectorized: ints -> fixed-width little-endian bytes -> bit-unpack ->
    15-bit group repack.
    """
    n = len(values)
    L = spec.n_limbs
    p, R = spec.modulus, spec.R
    nbits = LIMB_BITS * L
    # 2 spare bytes so every 15-bit field can be read as an aligned-free
    # 3-byte little-endian window
    nbytes = (nbits + 7) // 8 + 2
    if mont:
        buf = b"".join((v * R % p).to_bytes(nbytes, "little") for v in values)
    else:
        buf = b"".join((v % p).to_bytes(nbytes, "little") for v in values)
    u8 = np.frombuffer(buf, dtype=np.uint8).reshape(n, nbytes).astype(np.uint32)
    out = np.empty((L, n), dtype=np.uint32)
    for i in range(L):
        byte0, sh = divmod(LIMB_BITS * i, 8)
        window = (
            u8[:, byte0]
            | (u8[:, byte0 + 1] << 8)
            | (u8[:, byte0 + 2] << 16)
        )
        out[i] = (window >> sh) & LIMB_MASK
    return out


def decode(arr: np.ndarray, spec: FpSpec, mont: bool = True):
    """uint32[L, *batch] limb-major limbs -> list of python ints
    (canonical, [0, p)), batch flattened row-major.

    Accepts lazy/redundant digit encodings (any u32 digits)."""
    arr = np.asarray(arr, dtype=np.uint64)
    flat = arr.reshape(arr.shape[0], -1)
    L, n = flat.shape
    p = spec.modulus
    rinv = pow(spec.R, p - 2, p) if mont else 1
    # resolve lazy u32 digits to exact 15-bit digits with a vectorized
    # carry pass (carry < 2^17 stays exact in u64)
    digits = np.empty((L + 2, n), dtype=np.uint64)
    carry = np.zeros(n, dtype=np.uint64)
    for i in range(L):
        acc = flat[i] + carry
        digits[i] = acc & LIMB_MASK
        carry = acc >> LIMB_BITS
    digits[L] = carry & LIMB_MASK
    digits[L + 1] = carry >> LIMB_BITS
    # pack exact digits into little-endian bytes (3-byte windows never
    # collide once digits are exact: OR is carry-free)
    nbytes = (LIMB_BITS * (L + 2) + 7) // 8 + 2
    u8 = np.zeros((n, nbytes), dtype=np.uint32)
    for i in range(L + 2):
        byte0, sh = divmod(LIMB_BITS * i, 8)
        window = digits[i].astype(np.uint32) << sh
        u8[:, byte0] |= window & 0xFF
        u8[:, byte0 + 1] |= (window >> 8) & 0xFF
        u8[:, byte0 + 2] |= (window >> 16) & 0xFF
    buf = u8.astype(np.uint8).tobytes()
    out = []
    for j in range(n):
        v = int.from_bytes(buf[j * nbytes : (j + 1) * nbytes], "little") % p
        if mont:
            v = v * rinv % p
        out.append(v)
    return out
