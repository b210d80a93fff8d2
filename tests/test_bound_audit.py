"""Machine-checked limb-overflow audit (SURVEY §5.2's sanitizer analog).

The field engine (groth16_tpu/fields/fp.py) documents a digit/value
class ledger: lazy digits < 2^27, semi <= 2^15 + 2^12, CIOS columns
< 2^23, rex domain < 2^30, all inside uint32.  These tests turn that
ledger from comments into checks:

1. `test_cios_column_bound_model` re-derives the worst-case CIOS column
   bounds numerically for EVERY registered curve's field widths — if a
   new curve's limb count pushed any intermediate past uint32 (or the
   documented 2^23 / 2^31 claims), this fails before any kernel does.
2. The remaining tests drive the REAL jnp ops at the extreme points of
   their documented domains (digit maxima, value-class maxima) and
   cross-check values against Python ints.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from groth16_tpu.curves.params import CURVES, get_curve
from groth16_tpu.fields import fp
from groth16_tpu.fields.spec import LIMB_BITS, LIMB_MASK, make_spec

SEMI = (1 << LIMB_BITS) + (1 << 12)  # fold() output digit bound
LAZY = 1 << 27
U32 = 1 << 32


def _all_specs():
    out = []
    for name in CURVES:
        c = get_curve(name)
        out.append((f"{name}.Fr", make_spec(c.r)))
        out.append((f"{name}.Fq", make_spec(c.p)))
    return out


def test_cios_column_bound_model():
    """Worst-case interval propagation of the interleaved-CIOS step
    (fp._mont_mul_xla / pallas_fp's identical dataflow): every column
    and every product must stay inside uint32, columns < 2^23 as the
    module docstring claims, and the final accumulator must sit inside
    rex's < 2^30 domain."""
    for label, spec in _all_specs():
        L = spec.n_limbs
        # spec regime guarantee: R = 2^(15L) >= 64 p
        assert (1 << (LIMB_BITS * L)) >= 64 * spec.modulus, label
        ai_max = SEMI  # inputs folded to semi
        bj_max = SEMI
        m_max = LIMB_MASK  # m = (...) & MASK
        pj_max = LIMB_MASK  # exact digits of p
        prod_max = ai_max * bj_max
        prod2_max = m_max * pj_max
        assert prod_max < U32, f"{label}: a_i*b_j overflows u32"
        assert prod2_max < U32, f"{label}: m*p_j overflows u32"
        acc = [0] * (L + 1)
        col_peak = 0
        for _ in range(L):
            # acc += (prod & MASK) and (prod >> 15) shifted up one
            for j in range(L):
                acc[j] += LIMB_MASK
            for j in range(1, L + 1):
                acc[j] += prod_max >> LIMB_BITS
            # acc += (prod2 & MASK) and (prod2 >> 15) shifted up one
            for j in range(L):
                acc[j] += LIMB_MASK
            for j in range(1, L + 1):
                acc[j] += prod2_max >> LIMB_BITS
            col_peak = max(col_peak, max(acc))
            assert max(acc) < U32, f"{label}: CIOS column overflows u32"
            # shift down: lo = acc[1] + (acc[0] >> 15)
            carry = acc[0] >> LIMB_BITS
            acc = [acc[1] + carry] + acc[2:] + [0]
        assert col_peak < 1 << 23, f"{label}: column bound claim (2^23) broken"
        assert max(acc) < 1 << 30, f"{label}: rex domain (<2^30) broken"


@pytest.fixture(scope="module")
def spec():
    return make_spec(get_curve("bn254").p)


def test_rex_at_domain_maximum(spec):
    """rex resolves columns at its documented maximum (2^30 - 1 in every
    column) to the exact value mod 2^(15 L)."""
    L = spec.n_limbs
    cols = np.full((L, 1), (1 << 30) - 1, dtype=np.uint32)
    value = sum(int(c) << (LIMB_BITS * i) for i, c in enumerate(cols[:, 0]))
    digits = np.asarray(fp.rex(jnp.asarray(cols), L))
    assert digits.max() <= LIMB_MASK
    got = sum(int(d) << (LIMB_BITS * i) for i, d in enumerate(digits[:, 0]))
    assert got == value % (1 << (LIMB_BITS * L))


def test_fold_at_lazy_maximum(spec):
    """fold() takes digits at the lazy maximum to semi, preserving value
    (top digit's high part must be absorbable: use a value < R)."""
    L = spec.n_limbs
    d = np.full((L, 1), LAZY - 1, dtype=np.uint32)
    d[-1, 0] = LIMB_MASK  # keep value < R so fold is value-preserving
    value = sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(d[:, 0]))
    out = np.asarray(fp.fold(jnp.asarray(d)))
    assert out.max() <= SEMI
    got = sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(out[:, 0]))
    assert got == value


def test_mont_mul_at_value_class_maximum(spec):
    """mont_mul's contract: values < 8p in, < 2p exact out.  Feed both
    operands as lazy 4-term sums just under 8p and check the Montgomery
    product against Python ints."""
    p = spec.modulus
    rng = np.random.RandomState(3)
    # x exact in [0,2p): build from a canonical residue + p
    def enc(v):
        return jnp.asarray(
            np.array(
                [[(v >> (LIMB_BITS * i)) & LIMB_MASK] for i in range(spec.n_limbs)],
                dtype=np.uint32,
            )
        )

    x_int = p - 1 + p  # 2p - 1
    y_int = p - 3 + p
    x = enc(x_int)
    y = enc(y_int)
    # lazy sums: 4 * (2p - c) < 8p with digit growth
    xs = fp.add(spec, fp.add(spec, x, x), fp.add(spec, x, x))
    ys = fp.add(spec, fp.add(spec, y, y), fp.add(spec, y, y))
    out = np.asarray(fp.mont_mul(spec, xs, ys))
    assert out.max() <= LIMB_MASK, "mont_mul output digits must be exact"
    got = sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(out[:, 0]))
    assert got < 2 * p, "mont_mul output value must be < 2p"
    rinv = pow(1 << (LIMB_BITS * spec.n_limbs), p - 2, p)
    assert got % p == (4 * x_int) * (4 * y_int) * rinv % p


def test_sub_at_kp_boundary(spec):
    """sub(a, b, k) = a - b + k*p requires value(b) < k*p; drive b to
    just under 8p with k=8 and a to its own 8p-1 maximum."""
    p = spec.modulus
    L = spec.n_limbs

    def enc(v):
        return jnp.asarray(
            np.array(
                [[(v >> (LIMB_BITS * i)) & LIMB_MASK] for i in range(L)],
                dtype=np.uint32,
            )
        )

    two_p = enc(2 * p - 1)
    a = fp.add(spec, fp.add(spec, two_p, two_p), fp.add(spec, two_p, two_p))
    b = fp.add(spec, fp.add(spec, two_p, two_p), fp.add(spec, two_p, two_p))
    out = np.asarray(fp.sub(spec, a, b, k=8))
    assert out.max() <= LIMB_MASK
    got = sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(out[:, 0]))
    assert got == 4 * (2 * p - 1) - 4 * (2 * p - 1) + 8 * p
