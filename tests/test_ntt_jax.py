"""Device NTT vs. exact reference domain (bit-exact)."""

import random

import numpy as np
import pytest
import jax.numpy as jnp

from groth16_tpu.curves.params import get_curve
from groth16_tpu.fields.spec import decode, encode
from groth16_tpu.ntt import NttDomain, powers
from groth16_tpu.ref.domain import RefDomain


@pytest.mark.parametrize("name", ["bls12_377", "bn254"])
@pytest.mark.parametrize("n", [8, 256])
def test_ntt_matches_reference(name, n):
    c = get_curve(name)
    d = NttDomain(c.fr, n)
    rd = RefDomain(c.fr, n)
    assert d.size == rd.size and d.group_gen == rd.group_gen

    rng = random.Random(n)
    coeffs = [rng.randrange(c.r) for _ in range(n)]
    a = jnp.asarray(encode(coeffs, d.spec))

    assert decode(np.asarray(d.fft(a)), d.spec) == rd.fft(coeffs)
    assert decode(np.asarray(d.ifft(a)), d.spec) == rd.ifft(coeffs)

    coset = rd.get_coset(c.fr.generator)
    assert decode(np.asarray(d.coset_fft(a)), d.spec) == coset.fft(coeffs)
    assert decode(np.asarray(d.coset_ifft(a)), d.spec) == coset.ifft(coeffs)

    # roundtrip on device only
    rt = d.coset_ifft(d.coset_fft(a))
    assert decode(np.asarray(rt), d.spec) == coeffs


def test_powers_table():
    c = get_curve("bn254")
    d = NttDomain(c.fr, 16)
    w = powers(d.spec, 5, 16)
    assert decode(np.asarray(w), d.spec) == [pow(5, k, c.r) for k in range(16)]
