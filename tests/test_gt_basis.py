"""GT serialization basis parity with ark-ec (VERDICT r3 missing #3).

ark-ec represents the Tate families' target fields as
  * BW6-761:  Fq6 = Fp6_2over3  — Fp3 = Fq[u]/(u^3 - (-4)), v^2 = u
  * MNT4-298: Fq4 = Fp4         — Fp2 = Fq[u]/(u^2 - 17),   v^2 = u
  * MNT6-298: Fq6 = Fp6_2over3  — Fp3 = Fq[u]/(u^3 - 5),    v^2 = u
(curve config constants as published with the curves; the BW6-761 tower
is fixed in the defining paper, eprint 2020/351).  This engine's GT for
those families is Kh[v]/(v^2 - u) with Kh = Fq[u]/(u^d - nr) and nr
taken from the same registry — i.e. the SAME basis — and ser_gt flattens
c0's Kh coefficients before c1's, matching QuadExtField/CubicExtField
CanonicalSerialize order.  These tests pin all of that structurally
(no arkworks binary exists in this image to produce byte vectors; the
pairing VALUE caveat — Tate here vs ate in ark — is documented at
serde/canonical.py:ser_gt).
"""

import io

import pytest

from groth16_tpu.curves.params import get_curve
from groth16_tpu.ref.pairing import make_pairing
from groth16_tpu.serde.canonical import _nbytes, de_gt, ser_gt

ARK_TOWERS = {
    # curve -> (half-extension degree d, ark Kh nonresidue)
    "bw6_761": (3, -4),
    "mnt4_298": (2, 17),
    "mnt6_298": (3, 5),
}


@pytest.mark.parametrize("curve", sorted(ARK_TOWERS))
def test_tate_gt_tower_matches_ark_config(curve):
    c = get_curve(curve)
    d, ark_nr = ARK_TOWERS[curve]
    pair = make_pairing(curve)
    assert pair.d == d, "half-extension degree"
    assert pair.kh.nr % c.p == ark_nr % c.p, "Kh nonresidue == ark config"
    # quadratic step: v^2 = u (ark Fp4Config/Fp6Config NONRESIDUE = U)
    u = tuple([0, 1] + [0] * (d - 2))
    v = (tuple([0] * d), tuple([1] + [0] * (d - 1)))  # the element v
    v2 = pair.kgt.mul(v, v)
    assert v2 == (u, tuple([0] * d)), "v^2 == u"


@pytest.mark.parametrize("curve", sorted(ARK_TOWERS))
def test_gt_bytes_are_c0_then_c1_coefficient_dump(curve):
    c = get_curve(curve)
    d, _ = ARK_TOWERS[curve]
    coeffs = list(range(1, 2 * d + 1))  # distinct small coefficients
    el = (tuple(coeffs[:d]), tuple(coeffs[d:]))
    raw = ser_gt(el, c)
    n = _nbytes(c.p)
    assert len(raw) == 2 * d * n
    for i, v in enumerate(coeffs):
        chunk = raw[i * n : (i + 1) * n]
        assert int.from_bytes(chunk, "little") == v, (
            "little-endian Fp dump in c0||c1 coefficient order"
        )
    # roundtrip through de_gt with the pairing's template
    pair = make_pairing(curve)
    back = de_gt(io.BytesIO(raw), c, pair.k12.one())
    assert back == el


def test_fp12_gt_roundtrip_bls():
    curve = "bls12_381"
    c = get_curve(curve)
    pair = make_pairing(curve)
    one = pair.k12.one()
    raw = ser_gt(one, c)
    assert len(raw) == 12 * _nbytes(c.p)
    assert de_gt(io.BytesIO(raw), c, one) == one
