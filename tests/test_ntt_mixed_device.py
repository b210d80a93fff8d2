"""Device mixed-radix NTT vs. the exact engine.

ark-poly's GeneralEvaluationDomain falls back to mixed-radix domains for
low-2-adicity scalar fields (the MNT6 regime; consumed at
/root/reference/src/r1cs_to_qap.rs:201-234 and exercised by
benches/bench.rs:154-155 at 2^20).  The device realization peels the odd
prime factors as generalized DIF stages, then runs the power-of-two tail
through the radix-2 core (ntt/ntt.py:_ntt_core_mixed).
"""

import random

import numpy as np
import pytest
import jax.numpy as jnp

from groth16_tpu.curves.params import FieldParams, get_curve
from groth16_tpu.fields.spec import decode, encode
from groth16_tpu.ntt import NttDomain
from groth16_tpu.ref.domain import RefDomain

# p - 1 = 2^2 * 3^2 * 5 : tiny 2-adicity forces mixed sizes early
F181 = FieldParams("t181.Fr", 181, 2)


@pytest.mark.parametrize("n_req", [5, 7, 10, 13, 21, 35, 41])
def test_mixed_device_matches_reference_small(n_req):
    d = NttDomain(F181, n_req)
    rd = RefDomain(F181, n_req)
    assert d.size == rd.size and d.group_gen == rd.group_gen
    if d.size & (d.size - 1):
        assert d.radixes, d.size

    rng = random.Random(n_req)
    coeffs = [rng.randrange(181) for _ in range(d.size)]
    a = jnp.asarray(encode(coeffs, d.spec))

    assert decode(np.asarray(d.fft(a)), d.spec) == rd.fft(coeffs)
    assert decode(np.asarray(d.ifft(a)), d.spec) == rd.ifft(coeffs)

    coset = rd.get_coset(F181.generator)
    assert decode(np.asarray(d.coset_fft(a)), d.spec) == coset.fft(coeffs)
    assert decode(np.asarray(d.coset_ifft(a)), d.spec) == coset.ifft(coeffs)

    rt = d.coset_ifft(d.coset_fft(a))
    assert decode(np.asarray(rt), d.spec) == coeffs


def test_mnt6_mixed_device_beyond_two_adicity():
    """MNT6-298 Fr past its 2-adicity (17): the domain the reference's
    MNT6 bench hits at scale.  Full exact-NTT comparison is prohibitive
    in Python at n = 143360, so: device roundtrip + spot-check a few
    evaluations against direct polynomial evaluation."""
    c = get_curve("mnt6_298")
    n_req = (1 << 17) + 1
    d = NttDomain(c.fr, n_req)
    rd = RefDomain(c.fr, n_req)
    assert d.size == rd.size == 143360  # 2^12 * 5 * 7
    assert d.group_gen == rd.group_gen
    assert d.radixes == (7, 5)

    p = c.fr.modulus
    rng = random.Random(99)
    # sparse coefficients keep direct evaluation cheap
    nz = {rng.randrange(d.size): rng.randrange(p) for _ in range(40)}
    coeffs = [nz.get(i, 0) for i in range(d.size)]
    a = jnp.asarray(encode(coeffs, d.spec))

    evs = decode(np.asarray(d.fft(a)), d.spec)
    g = d.group_gen
    for i in (0, 1, 12345, d.size - 1):
        x = pow(g, i, p)
        want = sum(v * pow(x, j, p) for j, v in nz.items()) % p
        assert evs[i] == want, i

    rt = d.coset_ifft(d.coset_fft(a))
    assert decode(np.asarray(rt), d.spec) == coeffs
