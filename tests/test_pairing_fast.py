"""Fast-pairing cross-checks: the projective sparse-line Miller loop +
Frobenius-Straus final exponentiation must produce bit-identical GT
values to the affine oracle path with a generic square-and-multiply
exponentiation (the round-1 implementation, kept as
`_miller_loop_affine`).

Reference behavior: ark-ec `Pairing::multi_miller_loop` +
`final_exponentiation` consumed at /root/reference/src/verifier.rs:49-64.
"""

import pytest

from groth16_tpu.ref.curve import RefGroups
from groth16_tpu.ref.pairing import RefPairing, RefPairingTate, make_pairing

TOWER_CURVES = ["bn254", "bls12_377", "bls12_381"]
TATE_CURVES = ["mnt4_298", "mnt6_298", "bw6_761"]


def _oracle_full(pr, Ps, Qs):
    """final_exponentiation(affine miller product) via generic pow."""
    k = pr.k12
    f = k.one()
    for P, Q in zip(Ps, Qs):
        f = k.mul(f, pr._miller_loop_affine(P, Q))
    if isinstance(pr, RefPairing):
        f1 = k.mul(k.conj(f), k.inv(f))
        f2 = k.mul(k.frobenius(f1, 2), f1)
        return k.pow(f2, pr.c.final_exp_hard)
    return k.pow(f, pr.final_exp)


@pytest.mark.parametrize("name", TOWER_CURVES + TATE_CURVES)
def test_fast_pairing_equals_affine_oracle(name):
    ref = RefGroups(name)
    pr = make_pairing(name)
    Ps = [ref.g1_sample(i + 5) for i in range(3)]
    Qs = [ref.g2_sample(i + 11) for i in range(3)]
    want = _oracle_full(pr, Ps, Qs)
    got = pr.final_exponentiation(pr.multi_miller_loop(Ps, Qs))
    assert got == want
    # single-pair path + None handling
    assert pr.final_exponentiation(
        pr.multi_miller_loop([Ps[0], None], [Qs[0], Qs[1]])
    ) == _oracle_full(pr, Ps[:1], Qs[:1])


@pytest.mark.parametrize("name", TOWER_CURVES)
def test_cyclotomic_sqr_matches_generic(name):
    """Granger-Scott squaring valid on easy-part outputs."""
    ref = RefGroups(name)
    pr = RefPairing(name)
    k = pr.k12
    f = pr._miller_loop_affine(ref.g1_sample(3), ref.g2_sample(7))
    f1 = k.mul(k.conj(f), k.inv(f))
    f2 = k.mul(k.frobenius(f1, 2), f1)  # cyclotomic
    assert k.cyclotomic_sqr(f2) == k.mul(f2, f2)


@pytest.mark.parametrize("name", TATE_CURVES)
def test_kgt_frobenius(name):
    """Fp6Direct3Ctx.frobenius(a, k) == a^(q^k) (generic pow)."""
    ref = RefGroups(name)
    pr = RefPairingTate(name)
    kgt = pr.kgt
    f = pr._miller_loop_affine(ref.g1_sample(3), ref.g2_sample(7))
    q = pr.c.p
    for power in range(1, pr.d):
        assert kgt.frobenius(f, power) == kgt.pow(f, q**power)


@pytest.mark.parametrize("name", TOWER_CURVES + TATE_CURVES)
def test_fast_pairing_bilinear_nondegenerate(name):
    ref = RefGroups(name)
    pr = make_pairing(name)
    k = pr.k12
    P, Q = ref.g1_sample(9), ref.g2_sample(13)
    a, b = 987654323, 1234567891
    lhs = pr.pairing(ref.g1_mul(P, a), ref.g2_mul(Q, b))
    rhs = k.pow(pr.pairing(P, Q), a * b % pr.c.r)
    assert lhs == rhs
    assert pr.pairing(P, Q) != k.one()
