"""Deterministic RNG plumbing for setup/prove randomness.

The reference threads an `ark_std::rand::Rng` through setup and prove
(generator.rs:26-32, prover.rs:146-147).  We use a seeded PRNG with
rejection sampling for uniform field elements; cryptographic-quality
randomness can be swapped in by passing an `os.urandom`-backed seed.
"""

from __future__ import annotations

import random


class Rng:
    def __init__(self, seed: int = 0):
        self._r = random.Random(seed)

    def field_element(self, modulus: int) -> int:
        """Uniform in [0, modulus) via rejection sampling."""
        bits = modulus.bit_length()
        while True:
            v = self._r.getrandbits(bits)
            if v < modulus:
                return v

    def nonzero_field_element(self, modulus: int) -> int:
        while True:
            v = self.field_element(modulus)
            if v != 0:
                return v

    def u64(self) -> int:
        return self._r.getrandbits(64)
