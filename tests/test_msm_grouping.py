"""Host-side unit tests for the round-5 MSM layout helpers: size-class
lane grouping (device_keys.group_lane_sizes) and the carry-window rule
(pippenger.signed_num_windows).  Pure Python — no device programs."""

import random

from groth16_tpu.msm.pippenger import (
    _pad_size,
    signed_num_windows,
    signed_window_digits,
)
from groth16_tpu.protocol.device_keys import group_lane_sizes


def test_group_lane_sizes_bench_shape():
    # the 2^16 bench circuit: rho/aux ~ n/2, h ~ n
    info = group_lane_sizes([32766, 32766, 65535, 32768])
    assert len(info) == 2
    (npad_a, lanes_a), (npad_h, lanes_h) = info
    assert npad_a == 32768 and sorted(lanes_a) == [0, 1, 3]
    assert npad_h == 65536 and lanes_h == (2,)


def test_group_lane_sizes_equal_collapses_to_one_group():
    info = group_lane_sizes([1000, 1000, 1000, 1000])
    assert len(info) == 1
    assert sorted(info[0][1]) == [0, 1, 2, 3]


def test_group_lane_sizes_covers_all_lanes_once():
    rng = random.Random(1)
    for _ in range(50):
        lengths = [rng.randrange(1, 1 << 20) for _ in range(4)]
        info = group_lane_sizes(lengths)
        seen = sorted(i for _, lanes in info for i in lanes)
        assert seen == [0, 1, 2, 3]
        for npad, lanes in info:
            for i in lanes:
                assert _pad_size(lengths[i]) <= npad


def test_signed_num_windows_carry_rule():
    # slack >= 1 => no carry window; exact division => one extra
    assert signed_num_windows(254, 13) == 20  # ceil = 20, slack 6
    assert signed_num_windows(255, 16) == 16  # slack 1
    assert signed_num_windows(256, 16) == 17  # 16 | 256 -> carry window
    assert signed_num_windows(12, 4) == 4  # 4 | 12 -> carry window
    assert signed_num_windows(13, 4) == 4  # slack 3


def test_signed_recode_reconstructs_scalar():
    """sum_w (-1)^{s_w} m_w 2^{cw} == scalar for the emitted window
    count, including the no-carry-window case."""
    import jax.numpy as jnp
    import numpy as np

    from groth16_tpu.fields.spec import LIMB_BITS

    rng = random.Random(7)
    for sb, c in ((254, 13), (255, 16), (256, 16), (64, 8)):
        ks = [rng.randrange(1 << sb) for _ in range(8)] + [0, (1 << sb) - 1]
        Ls = -(-sb // LIMB_BITS)
        limbs = np.zeros((Ls, len(ks)), np.uint32)
        for j, k in enumerate(ks):
            for i in range(Ls):
                limbs[i, j] = (k >> (LIMB_BITS * i)) & ((1 << LIMB_BITS) - 1)
        mags, signs = signed_window_digits(jnp.asarray(limbs), c, sb)
        mags, signs = np.asarray(mags), np.asarray(signs)
        assert mags.shape[0] == signed_num_windows(sb, c)
        for j, k in enumerate(ks):
            acc = 0
            for w in range(mags.shape[0]):
                m = int(mags[w, j])
                assert m <= 1 << (c - 1)
                acc += (-m if signs[w, j] else m) << (c * w)
            assert acc == k, (sb, c, j)
