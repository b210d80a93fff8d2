"""Field specification for the TPU limb engine.

TPU-first data model (SURVEY.md §7): field elements are structure-of-arrays
`uint32[..., L]` tensors of 16-bit little-endian limbs, held in Montgomery
form with R = 2^(16*L).  The engine keeps values in the redundant range
[0, 2p) — closed under mont_mul when 4p <= R (true for every supported
field) — so conditional subtractions happen only at explicit
normalization points.

Why 16-bit limbs in u32 lanes: the TPU VPU has no 64-bit integer multiply;
16x16 products are exact in u32, and column accumulations of up to 2*L
split products stay far below 2^32 (see mont_mul_limbs in fp.py for the
bound arithmetic).  Covers the `ark-ff` behavior consumed by the reference
(SURVEY.md §2.2 row "Prime-field arithmetic").
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import numpy as np

LIMB_BITS = 16
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
    n0inv: int  # -p^-1 mod 2^16
    nprime: int  # -p^-1 mod R (full-width, for non-interleaved REDC)
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
    # redundant-form closure requires 4p <= R; bump limb count if the
    # modulus is too close to R (not the case for any registered field,
    # but keep the engine generic).
    while 4 * modulus > (1 << (LIMB_BITS * n_limbs)):
        n_limbs += 1
    # lane-friendly: round the limb count up to a multiple of 8 only when
    # close; keep exact for now (last axis is the limb axis, batch axis is
    # the lane axis).
    R = 1 << (LIMB_BITS * n_limbs)
    n0inv = (-pow(modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
    nprime = (-pow(modulus, -1, R)) % R
    r_mod_p = R % modulus
    r2_mod_p = R * R % modulus
    return FpSpec(
        name=name,
        modulus=modulus,
        n_limbs=n_limbs,
        p_limbs=int_to_limbs(modulus, n_limbs),
        two_p_limbs=int_to_limbs(2 * modulus, n_limbs + 1),
        n0inv=n0inv,
        nprime=nprime,
        r_mod_p=r_mod_p,
        r2_mod_p=r2_mod_p,
        r_limbs=int_to_limbs(r_mod_p, n_limbs),
        r2_limbs=int_to_limbs(r2_mod_p, n_limbs),
        one_mont=int_to_limbs(r_mod_p, n_limbs),
    )


# -- host-side batch codecs (numpy) ----------------------------------------


def encode(values, spec: FpSpec, mont: bool = True) -> np.ndarray:
    """python ints -> uint32[N, L] limbs (Montgomery form by default)."""
    nbytes = spec.n_limbs * 2
    R, p = spec.R, spec.modulus
    buf = bytearray(len(values) * nbytes)
    for i, v in enumerate(values):
        v = v % p
        if mont:
            v = v * R % p
        buf[i * nbytes : (i + 1) * nbytes] = v.to_bytes(nbytes, "little")
    u16 = np.frombuffer(bytes(buf), dtype="<u2").reshape(len(values), spec.n_limbs)
    return u16.astype(np.uint32)


def decode(arr: np.ndarray, spec: FpSpec, mont: bool = True):
    """uint32[..., L] limbs -> list of python ints (canonical, [0, p))."""
    arr = np.asarray(arr)
    flat = arr.reshape(-1, arr.shape[-1]).astype("<u2")
    raw = flat.tobytes()
    nbytes = spec.n_limbs * 2
    p = spec.modulus
    rinv = pow(spec.R, p - 2, p) if mont else 1
    out = []
    for i in range(flat.shape[0]):
        v = int.from_bytes(raw[i * nbytes : (i + 1) * nbytes], "little") % p
        if mont:
            v = v * rinv % p
        out.append(v)
    return out
