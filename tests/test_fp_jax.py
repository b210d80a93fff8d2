"""TPU limb engine vs. exact Python ints.

Ops are jitted (the production path); sizes kept small so the suite stays
fast — throughput is bench.py's job.
"""

import random

import numpy as np
import pytest

import jax

from groth16_tpu.curves.params import get_curve, CURVES
from groth16_tpu.fields import fp
from groth16_tpu.fields.spec import decode, encode, make_spec
from groth16_tpu.utils.jitcache import jit_with_static

import jax.numpy as jnp

FIELDS = []
for name in CURVES:
    c = get_curve(name)
    FIELDS.append(pytest.param(c.r, id=f"{name}.Fr"))
FIELDS.append(pytest.param(get_curve("bls12_377").p, id="bls12_377.Fq"))


def _rand_vals(p, n, seed):
    r = random.Random(seed)
    vals = [r.randrange(p) for _ in range(n - 3)]
    return vals + [0, 1, p - 1]


@pytest.mark.parametrize("modulus", FIELDS)
def test_add_sub_mul(modulus):
    s = make_spec(modulus)
    assert 4 * modulus <= s.R, "redundant-form closure requires 4p <= R"
    vals_a = _rand_vals(modulus, 16, 1)
    vals_b = _rand_vals(modulus, 16, 2)
    a = jnp.asarray(encode(vals_a, s))
    b = jnp.asarray(encode(vals_b, s))
    assert decode(np.asarray(a), s) == vals_a

    addf = jit_with_static(fp.add, s)
    subf = jit_with_static(fp.sub, s)
    mulf = jit_with_static(fp.mont_mul, s)

    assert decode(np.asarray(addf(a, b)), s) == [
        (x + y) % modulus for x, y in zip(vals_a, vals_b)
    ]
    assert decode(np.asarray(subf(a, b)), s) == [
        (x - y) % modulus for x, y in zip(vals_a, vals_b)
    ]
    ab = mulf(a, b)
    assert decode(np.asarray(ab), s) == [
        x * y % modulus for x, y in zip(vals_a, vals_b)
    ]
    # redundant-form closure: un-normalized outputs feed back in correctly
    assert decode(np.asarray(mulf(ab, ab)), s) == [
        pow(x * y, 2, modulus) for x, y in zip(vals_a, vals_b)
    ]


@pytest.mark.parametrize("modulus", FIELDS[:2])
def test_pow_inv_misc(modulus):
    s = make_spec(modulus)
    vals = _rand_vals(modulus, 8, 5)
    a = jnp.asarray(encode(vals, s))
    e = 0xDEADBEEFCAFE
    got = decode(np.asarray(jax.jit(lambda x: fp.pow_const(s, x, e))(a)), s)
    assert got == [pow(x, e, modulus) for x in vals]
    expect = [pow(x, modulus - 2, modulus) for x in vals]
    assert decode(np.asarray(jit_with_static(fp.inv, s)(a)), s) == expect
    # batch_inv includes the zero -> zero convention
    assert decode(np.asarray(jit_with_static(fp.batch_inv, s)(a)), s) == expect

    assert list(np.asarray(fp.is_zero(s, a))) == [v == 0 for v in vals]
    assert list(np.asarray(fp.eq(s, a, a))) == [True] * 8
    std = fp.from_mont(s, a)
    assert decode(np.asarray(std), s, mont=False) == vals
    assert decode(np.asarray(fp.to_mont(s, std)), s) == vals
    assert decode(np.asarray(fp.const(s, 7, (3,))), s) == [7, 7, 7]
    assert decode(np.asarray(fp.neg(s, a)), s) == [(-x) % modulus for x in vals]


@pytest.mark.parametrize("modulus", FIELDS[:2])
def test_mont_mul_large_batch_pallas_path(modulus):
    """n=512 crosses the Pallas dispatch threshold on TPU (XLA path on
    CPU) — either way the values must match Python ints."""
    s = make_spec(modulus)
    n = 512
    vals_a = _rand_vals(modulus, n, 5)
    vals_b = _rand_vals(modulus, n, 6)
    a = jnp.asarray(encode(vals_a, s))
    b = jnp.asarray(encode(vals_b, s))
    mulf = jit_with_static(fp.mont_mul, s)
    got = decode(np.asarray(mulf(a, b)), s)
    assert got == [x * y % modulus for x, y in zip(vals_a, vals_b)]
    # digit-level agreement between the Pallas and XLA realizations
    from groth16_tpu.config import configure

    with configure(use_pallas="off"):
        xla = mulf(a, b)
    again = mulf(a, b)
    assert (np.asarray(again) == np.asarray(xla)).all()
