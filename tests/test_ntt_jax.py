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


def test_ntt_2p20_staged_core_tpu():
    """Regression pin for the round-5 n=2^20 miscompile: the MONOLITHIC
    20-stage slice program produced wrong values in the first phase-B
    stage's last 128-lane tile on the TPU backend (n <= 2^19 fine,
    every stage correct in isolation).  The domain path now runs one
    compiled program per stage (ntt._ntt_core_staged).  This costs
    ~10 min of compile on the TPU tier, so it only runs when
    G16_SLOW_TESTS=1; it self-skips on CPU (the gather core there never
    had the bug)."""
    import os

    import pytest

    from groth16_tpu.config import pallas_enabled

    if not (os.environ.get("G16_SLOW_TESTS") and pallas_enabled()):
        pytest.skip("slow TPU-only regression (set G16_SLOW_TESTS=1)")
    import random

    import jax
    import numpy as np
    import jax.numpy as jnp

    from groth16_tpu.curves.params import get_curve
    from groth16_tpu.fields.spec import decode, encode, make_spec
    from groth16_tpu.ntt.ntt import NttDomain
    from groth16_tpu.ref.domain import RefDomain

    c = get_curve("bls12_381")
    spec = make_spec(c.r, name="bls12_381.Fr")
    n = 1 << 20
    rng = random.Random(12)
    vals = [rng.randrange(c.r) for _ in range(n)]
    want = RefDomain(c.fr, n).ifft(vals)
    dom = NttDomain(c.fr, n)
    got_m = jax.block_until_ready(dom.ifft(jnp.asarray(encode(vals, spec))))
    assert decode(np.asarray(got_m), spec) == want
