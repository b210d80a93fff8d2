"""Radix-2 (coset) NTT over the limb engine (single-chip).

TPU-native realization of the `ark-poly` Radix2EvaluationDomain behavior
consumed by the witness map (reference call sites:
src/r1cs_to_qap.rs:201-234): in-place forward/inverse NTT on the subgroup
H = <w> of size n, coset domains g*H via pre/post scaling, identical output
ordering ([f(g*w^0), f(g*w^1), ...]) and 1/n normalization.

Design (SURVEY.md §2.4 "ntt_cp"): the coefficient vector lives as
uint32[L, ..., n] limb-major limbs (fields/fp.py convention: limb axis
leads, the element axis trails; extra row-batch dims in between are
supported — the sharded four-step transform in par/ntt_cp.py runs
row-batches).  Each butterfly
stage is one vectorized mont_mul + add/sub on full-width slices inside a
`lax.fori_loop`, so the whole transform is an O(L)-primitive graph
executed log2(n) times.  Twiddle and offset power tables are built on
device by log-doubling (no host bignum loops).

The multi-chip all-to-all variant lives in par/ntt_cp.py.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

from groth16_tpu.curves.params import FieldParams
from groth16_tpu.fields import fp
from groth16_tpu.fields.spec import FpSpec, encode, make_spec


@functools.lru_cache(maxsize=None)
def _jitted_ntt_core(spec: FpSpec):
    return jax.jit(functools.partial(_ntt_core, spec))


@functools.lru_cache(maxsize=None)
def _jitted_ntt_core_tws(spec: FpSpec):
    return jax.jit(functools.partial(_ntt_core_slices_tws, spec))


# -- staged core: one compiled program PER BUTTERFLY STAGE ----------------------
#
# The monolithic 20-stage slice program miscompiles at n = 2^20 on the
# TPU backend (first phase-B stage's twiddle multiply wrong in the last
# 128-lane tile; n <= 2^19 fine; every isolated reproduction fine) —
# same "correct in isolation, wrong under fusion" family as the int8
# histogram dot (msm/pippenger.py).  Running each stage as its own
# program sidesteps the fusion context entirely, compiles ~20 small
# programs instead of one huge one, and costs only ~20 async dispatches
# per transform.


@functools.lru_cache(maxsize=None)
def _stage_a_jit(spec: FpSpec, n: int, s: int):
    m = n >> s
    h = m >> 1

    def f(a, tw):
        lead = a.shape[:-1]
        nb = len(lead) - 1
        x = a.reshape(lead + (n // m, m))
        u = x[..., :h]
        v = x[..., h:]
        twr = tw.reshape(tw.shape[:1] + (1,) * (nb + 1) + (h,))
        sum_ = fp.cond_sub(spec, u + v, spec.two_p_limbs)
        diff = fp.mont_mul(spec, fp.sub(spec, u, v, k=2), twr)
        return jnp.concatenate([sum_, diff], axis=-1).reshape(lead + (n,))

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _stage_b_jit(spec: FpSpec, n: int, m0: int, s0: int, s: int):
    """Phase-B stage on the [.., m0, B] transposed storage (s >= s0)."""
    B = n // m0
    m = n >> s
    h = m >> 1

    def f(a, tw):
        lead = a.shape[:-2]
        nb = len(lead) - 1
        x = a.reshape(lead + (m0 // m, m, B))
        u = x[..., :h, :]
        v = x[..., h:, :]
        twr = tw.reshape(tw.shape[:1] + (1,) * (nb + 1) + (h, 1))
        sum_ = fp.cond_sub(spec, u + v, spec.two_p_limbs)
        diff = fp.mont_mul(spec, fp.sub(spec, u, v, k=2), twr)
        return jnp.concatenate([sum_, diff], axis=-2).reshape(lead + (m0, B))

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _to_b_jit(n: int, m0: int):
    B = n // m0

    def f(a):
        lead = a.shape[:-1]
        return jnp.swapaxes(a.reshape(lead + (B, m0)), -1, -2)

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _from_b_bitrev_jit(n: int, m0: int):
    B = n // m0

    def f(a):
        lead = a.shape[:-2]
        flat = jnp.swapaxes(a, -1, -2).reshape(lead + (n,))
        return _bitrev_last_fast(flat, n)

    return jax.jit(f)


def _ntt_core_staged(spec: FpSpec, a: jnp.ndarray, tws) -> jnp.ndarray:
    """Host-driven staged pipeline: phase-A/phase-B split identical to
    _ntt_core_slices_tws, but every stage is a separate compiled
    program.  Top-level (non-traced) calls only."""
    n = a.shape[-1]
    log_n = n.bit_length() - 1
    if log_n == 0:
        return a
    split = 0
    for s in range(log_n):
        m = n >> s
        h = m >> 1
        if h < _SPLIT_H and n // m >= _SPLIT_H:
            break
        split = s + 1
        a = _stage_a_jit(spec, n, s)(a, tws[s])
    if split == log_n:
        return jax.jit(functools.partial(_bitrev_last_fast, n=n))(a)
    m0 = n >> split
    a = _to_b_jit(n, m0)(a)
    for s in range(split, log_n):
        a = _stage_b_jit(spec, n, m0, split, s)(a, tws[s])
    return _from_b_bitrev_jit(n, m0)(a)


@functools.lru_cache(maxsize=None)
def _jitted_mul(spec: FpSpec):
    return jax.jit(functools.partial(fp.mont_mul, spec))


def powers_device(spec: FpSpec, base: int, n: int) -> jnp.ndarray:
    """[base^0, ..., base^(n-1)] in Montgomery form, built on device by
    log-doubling: p_{2k} = p_k * (base^k); log2(n) wide multiplies."""
    assert n & (n - 1) == 0, "power-of-two table"
    p = spec.modulus
    cur = jnp.asarray(encode([1], spec))  # [L, 1]
    length = 1
    b_pow = base % p
    while length < n:
        scale = jnp.asarray(encode([b_pow], spec))
        nxt = fp.mont_mul(spec, cur, scale)
        cur = jnp.concatenate([cur, nxt], axis=-1)
        b_pow = b_pow * b_pow % p
        length *= 2
    return cur


@functools.lru_cache(maxsize=None)
def powers(spec: FpSpec, base: int, n: int) -> jnp.ndarray:
    """Cached device-resident power table (any n >= 1).

    Built even when first requested inside a jit trace
    (ensure_compile_time_eval), so the cache always holds concrete
    arrays, never tracers.  The whole builder runs as ONE jitted
    zero-arg program: compile-time-eval otherwise executes the doubling
    loop op-by-op, which is pathological over a high-latency device
    tunnel."""
    n2 = 1 << (n - 1).bit_length()  # doubling builds pow2 lengths
    with jax.ensure_compile_time_eval():
        fn = jax.jit(lambda: powers_device(spec, base, n2)[:, :n])
        return jax.block_until_ready(fn())


def _bitrev_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int32)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _dif_tables(n: int):
    """Per-stage gather tables for the in-place DIF network (the
    compact-graph CPU path of _ntt_core; see _ntt_core_slices for the
    index derivation)."""
    log_n = n.bit_length() - 1
    j = np.arange(n, dtype=np.int32)
    masks, partners, twexps = [], [], []
    for s in range(log_n):
        m = n >> s
        h = m >> 1
        q = j & (m - 1)
        lower = q < h
        masks.append(lower)
        partners.append(np.where(lower, j + h, j - h).astype(np.int32))
        twexps.append(np.where(lower, 0, (q - h) << s).astype(np.int32))
    return np.stack(masks), np.stack(partners), np.stack(twexps)


def _ntt_core_gather(spec: FpSpec, a: jnp.ndarray, root_powers: jnp.ndarray) -> jnp.ndarray:
    """O(1)-graph DIF core: one masked full-width butterfly iterated by
    lax.fori_loop with per-stage gather tables.  Bit-identical to
    _ntt_core_slices; kept for the CPU backend, where the unrolled
    slice core compiles slowly and gathers are cheap."""
    n = a.shape[-1]
    log_n = n.bit_length() - 1
    masks, partners, twexps = _dif_tables(n)
    masks_d = jnp.asarray(masks)
    partners_d = jnp.asarray(partners)
    twexps_d = jnp.asarray(twexps)

    def stage(s, x):
        part = jnp.take(x, partners_d[s], axis=-1)
        tw = jnp.take(root_powers, twexps_d[s], axis=-1)
        sum_ = fp.cond_sub(spec, x + part, spec.two_p_limbs)
        diff = fp.mont_mul(spec, fp.sub(spec, part, x, k=2), tw)
        return fp.select(masks_d[s], sum_, diff)

    return jax.lax.fori_loop(0, log_n, stage, a)


_SPLIT_H = 512  # phase-A/B layout switch (half-block lane-tile threshold)


@functools.lru_cache(maxsize=None)
def _bitrev_storage_perm(n: int, m0: int) -> np.ndarray:
    """Gather table composing phase B's [m0, B] storage transpose with
    the final DIF bit reversal: out[k] = a_flat[storage(bitrev(k))]."""
    B = n // m0
    rev = _bitrev_perm(n)
    return ((rev % m0) * B + rev // m0).astype(np.int32)


def _bitrev_last_fast(a: jnp.ndarray, n: int) -> jnp.ndarray:
    """out[.., k] = a[.., bitrev(k)] via factored permutation.

    A minor-axis gather with the n-entry bit-reversal table costs
    ~20 ns/element on TPU (0.5 s per 2^20 NTT).  Splitting k's bits as
    (i: p hi, j: q lo), bitrev(k) = rev_q(j)*2^p + rev_p(i), so the
    permutation factors into two SECOND-minor-axis row gathers (moving
    contiguous lane rows at near-bandwidth) around one native
    transpose:
        a2 = a.reshape(2^q, 2^p);  out2[i, j] = a2[rev_q(j), rev_p(i)]
        out = rowperm(swap(rowperm(a2, rev_q)), rev_p)
    """
    log_n = n.bit_length() - 1
    if log_n < 2:
        return a
    p = log_n // 2
    q = log_n - p
    A, B = 1 << p, 1 << q
    lead = a.shape[:-1]

    def rev_idx(bits: int) -> np.ndarray:
        m = 1 << bits
        idx = np.arange(m)
        out = np.zeros(m, np.int32)
        for b in range(bits):
            out |= ((idx >> b) & 1) << (bits - 1 - b)
        return out

    x = a.reshape(lead + (B, A))
    x = jnp.take(x, jnp.asarray(rev_idx(q)), axis=-2)
    x = jnp.swapaxes(x, -1, -2)  # [.., A, B]
    x = jnp.take(x, jnp.asarray(rev_idx(p)), axis=-2)
    return x.reshape(lead + (n,))


def _stage_twiddles(spec: FpSpec, root_powers: jnp.ndarray):
    """Per-DIF-stage twiddle vectors, sliced once from the n-entry power
    table: stage s (block m = n>>s, half h = m/2) multiplies its upper
    half by root^((q-h)*2^s), q-h in [0, h) — i.e. every 2^s-th power.
    Total storage = sum_s h_s = n - 1 elements.

    TRAP (round 5): do NOT trace these strided slices into the same
    program as the butterfly stages at large n.  At n = 2^20 on the TPU
    backend the composition miscompiled: the first phase-B stage's
    twiddle multiply produced wrong values in the last 128-lane tile
    (exactly lanes [1920, 2048) x the diff half — 32768 wrong outputs),
    while n <= 2^19 and every isolated reproduction of the same mul
    were bit-exact.  The domain-level path therefore precomputes these
    tables EAGERLY on the host (_stage_tws_cached) and passes them as
    program inputs; this traced variant remains only for the small
    local transforms inside par/ntt_cp.py's sharded four-step."""
    n = root_powers.shape[-1]
    out = []
    for s in range(n.bit_length() - 1):
        h = n >> (s + 1)
        out.append(root_powers[:, :: 1 << s][:, :h])
    return out


@functools.lru_cache(maxsize=None)
def _stage_tws_cached(spec: FpSpec, base: int, n: int):
    """Concrete per-stage twiddle arrays for the slice core, built on
    the HOST from the cached power table (one fetch + numpy slices +
    per-stage uploads; a few hundred ms once per (field, root, n)).
    Keeping these OUT of the compiled NTT program avoids the n = 2^20
    strided-slice miscompile documented in _stage_twiddles."""
    rp = np.asarray(powers(spec, base, n))
    out = []
    for s in range(n.bit_length() - 1):
        h = n >> (s + 1)
        out.append(jnp.asarray(np.ascontiguousarray(rp[:, :: 1 << s][:, :h])))
    return tuple(out)


def _ntt_core(spec: FpSpec, a: jnp.ndarray, root_powers: jnp.ndarray) -> jnp.ndarray:
    """Radix-2 DIF NTT along the trailing element axis; natural order in
    and out.

    a: uint32[L, ..., n]; root_powers: [L, n] table (pass inverse-root
    powers for the inverse transform).

    Every stage touches only CONTIGUOUS half-block slices — no data
    gathers (minor-axis gathers run far below HBM bandwidth on TPU): the
    element axis is viewed as [blocks, m]; lower output = u + v, upper
    output = (u - v) * tw with tw a per-stage slice of the power table
    broadcast across blocks.  The log2(n) stages are unrolled (shapes
    differ per stage); each is O(1) wide primitives.
    """
    n = a.shape[-1]
    log_n = n.bit_length() - 1
    if log_n == 0:
        return a
    from groth16_tpu.config import pallas_enabled

    if not pallas_enabled():
        a = _ntt_core_gather(spec, a, root_powers)
        return jnp.take(a, jnp.asarray(_bitrev_perm(n)), axis=-1)
    return _ntt_core_slices_tws(spec, a, _stage_twiddles(spec, root_powers))


def _ntt_core_slices_tws(spec: FpSpec, a: jnp.ndarray, tws) -> jnp.ndarray:
    """Slice-core body with the per-stage twiddles supplied by the
    caller — either traced slices (_stage_twiddles, small n) or
    host-prebuilt arrays (_stage_tws_cached, the domain path)."""
    n = a.shape[-1]
    log_n = n.bit_length() - 1
    if log_n == 0:
        return a
    lead = a.shape[:-1]
    nb = len(lead) - 1  # middle batch dims between limb and element axes

    # Phase A — large blocks (half-block h wide enough to fill lane
    # tiles): butterflies slice the minor axis, viewed [.., blocks, m].
    split = 0
    for s in range(log_n):
        m = n >> s
        h = m >> 1
        if h < _SPLIT_H and n // m >= _SPLIT_H:
            break
        split = s + 1
        x = a.reshape(lead + (n // m, m))
        u = x[..., :h]
        v = x[..., h:]
        tw = tws[s].reshape(tws[s].shape[:1] + (1,) * (nb + 1) + (h,))
        sum_ = fp.cond_sub(spec, u + v, spec.two_p_limbs)
        diff = fp.mont_mul(spec, fp.sub(spec, u, v, k=2), tw)
        a = jnp.concatenate([sum_, diff], axis=-1).reshape(lead + (n,))

    if split == log_n:
        return _bitrev_last_fast(a, n)

    # Phase B — small blocks: one bulk transpose to [.., m, B] puts the
    # big block count B on the lane axis; butterflies now slice the
    # LEADING in-block axis (contiguous slabs, full lane width) instead
    # of producing [.., B, h<tile] shapes that waste 7/8 of every tile.
    m0 = n >> split
    B = n // m0
    a = jnp.swapaxes(a.reshape(lead + (B, m0)), -1, -2)  # [.., m0, B]
    for s in range(split, log_n):
        m = n >> s
        h = m >> 1
        x = a.reshape(lead + (m0 // m, m, B))
        u = x[..., :h, :]
        v = x[..., h:, :]
        tw = tws[s].reshape(tws[s].shape[:1] + (1,) * (nb + 1) + (h, 1))
        sum_ = fp.cond_sub(spec, u + v, spec.two_p_limbs)
        diff = fp.mont_mul(spec, fp.sub(spec, u, v, k=2), tw)
        a = jnp.concatenate([sum_, diff], axis=-2).reshape(lead + (m0, B))
    # output element j = b*m0 + q sits at storage q*B + b: undo the
    # storage transpose with a native swap, then the (static)
    # bit-reversal via the factored fast path — both near-bandwidth,
    # where the old single composed gather ran at ~20 ns/element
    a = jnp.swapaxes(a.reshape(lead + (m0, B)), -1, -2).reshape(lead + (n,))
    return _bitrev_last_fast(a, n)


def _odd_radixes(n: int):
    """Odd prime radix sequence of n (largest first, for lane-friendly
    early stages) and the power-of-two tail M: n = prod(radixes) * M."""
    radixes = []
    m = n
    for q in (7, 5, 3):
        while m % q == 0:
            radixes.append(q)
            m //= q
    assert m & (m - 1) == 0, f"non-smooth NTT size {n}"
    return tuple(radixes), m


@functools.lru_cache(maxsize=None)
def _mixed_storage_perm(n: int, radixes, M: int) -> np.ndarray:
    """Final gather composing the odd-stage DIF digit placement with the
    natural-order radix-2 block transforms: out[k] = storage[perm[k]]
    where k = r0 + q0*(r1 + q1*(... + k_sub)) lands at storage
    sum_i r_i * (n / prod_{j<=i} q_j) + k_sub."""
    k = np.arange(n, dtype=np.int64)
    rem = k
    base = np.zeros(n, dtype=np.int64)
    div = n
    for q in radixes:
        r = rem % q
        rem = rem // q
        div //= q
        base += r * div
    return (base + rem).astype(np.int32)


def _ntt_core_mixed(spec: FpSpec, a: jnp.ndarray, root_powers: jnp.ndarray,
                    radixes, sub_powers: jnp.ndarray) -> jnp.ndarray:
    """Mixed-radix DIF NTT along the trailing element axis; natural
    order in and out.  The odd prime factors (7/5/3) are peeled first as
    generalized DIF stages over CONTIGUOUS slices — radix-q butterfly
    y_r = (sum_j W_q^{jr} u_j) * w_m^{r t} with W_q columns sliced from
    the n-entry power table and stage twiddles as strided slices (no
    index wrap: r*t*(n/m) < n) — leaving n/M independent radix-2
    transforms of the power-of-two tail M, which run through _ntt_core
    with the blocks as a batch axis.  Mirrors the exact engine's
    recursive Cooley-Tukey (ref/domain.py:_ct_ntt; reference consumes
    this through ark-poly's MixedRadixEvaluationDomain for the
    low-2-adicity MNT fields, SURVEY.md §2.2).

    Ledger: stage inputs < 2p exact; y_r pre-twiddle < 2q*p lazy; the
    twiddle product bound 4q*p^2 <= 28 p^2 < 64 p^2; r = 0 lanes are
    value-reduced back to < 2p.
    """
    n = a.shape[-1]
    lead = a.shape[:-1]
    m = n
    for q in radixes:
        h = m // q
        B = n // m
        x = a.reshape(lead + (B, q, h))
        us = [x[..., j, :] for j in range(q)]
        ys = []
        for r in range(q):
            acc = us[0]
            for j in range(1, q):
                w = root_powers[:, (n // q) * j * r % n][
                    (slice(None),) + (None,) * (len(lead) + 1)
                ]
                acc = acc + fp.mont_mul(spec, us[j], w)
            if r == 0:
                y = fp.reduce_to_2p(spec, acc, bound_k=2 * q)
            else:
                st = (n // m) * r
                tw = root_powers[:, ::st][:, :h]
                tw = tw.reshape(tw.shape[:1] + (1,) * (len(lead)) + (h,))
                y = fp.mont_mul(spec, acc, tw)
            ys.append(y)
        a = jnp.stack(ys, axis=-2).reshape(lead + (n,))
        m = h
    M = m
    a = _ntt_core(spec, a.reshape(lead + (n // M, M)), sub_powers)
    a = a.reshape(lead + (n,))
    if not radixes:
        return a
    perm = jnp.asarray(_mixed_storage_perm(n, radixes, M))
    return jnp.take(a, perm, axis=-1)


@functools.lru_cache(maxsize=None)
def _jitted_ntt_core_mixed(spec: FpSpec, radixes):
    return jax.jit(
        lambda a, rp, sp: _ntt_core_mixed(spec, a, rp, radixes, sp)
    )


class NttDomain:
    """Evaluation domain of size n over field `field`: radix-2 when the
    field's 2-adicity allows, else the smallest 2^a*3^b*5^c*7^d smooth
    size (the MNT6 regime — mirrors ref/domain.py / ark-poly
    GeneralEvaluationDomain rounding).

    Mirrors RefDomain (groth16_tpu/ref/domain.py) semantics on device.
    Tables are device-resident and cached per (field, n).
    """

    def __init__(self, field: FieldParams, num_coeffs: int):
        n = 1
        log_n = 0
        while n < num_coeffs:
            n <<= 1
            log_n += 1
        self.field = field
        self.spec = make_spec(field.modulus, name=field.name)
        p = field.modulus
        if log_n <= field.two_adicity:
            self.size = n
            self.log_size = log_n
            # group_gen = 2-adic root ^ (2^(s - log_n))
            self.group_gen = pow(
                field.two_adic_root_of_unity,
                1 << (field.two_adicity - log_n),
                p,
            )
            self.radixes = ()
        else:
            from groth16_tpu.ref.domain import _element_of_order, _smooth_sizes

            cands = [
                m
                for m in _smooth_sizes(p - 1, field.two_adicity)
                if m >= num_coeffs
            ]
            if not cands:
                raise ValueError("PolynomialDegreeTooLarge")
            m = cands[0]
            self.size = m
            self.log_size = m.bit_length() - 1  # informational only
            self.group_gen = _element_of_order(p, m)
            self.radixes, _ = _odd_radixes(m)
        self.group_gen_inv = pow(self.group_gen, p - 2, p)
        self.size_inv = pow(self.size, p - 2, p)

    # -- cached device tables ------------------------------------------------

    @functools.cached_property
    def _fwd_powers(self) -> jnp.ndarray:
        return powers(self.spec, self.group_gen, self.size)

    @functools.cached_property
    def _inv_powers(self) -> jnp.ndarray:
        return powers(self.spec, self.group_gen_inv, self.size)

    def _offset_powers(self, offset: int) -> jnp.ndarray:
        return powers(self.spec, offset, self.size)

    def _sub_powers(self, root: int) -> jnp.ndarray:
        """Power table of root^(odd part) for the radix-2 tail."""
        P = 1
        for q in self.radixes:
            P *= q
        p = self.field.modulus
        return powers(self.spec, pow(root, P, p), self.size // P)

    def _core(self, a: jnp.ndarray, fwd: bool) -> jnp.ndarray:
        root_powers = self._fwd_powers if fwd else self._inv_powers
        if not self.radixes:
            from groth16_tpu.config import pallas_enabled

            if pallas_enabled() and not isinstance(a, jax.core.Tracer):
                # top-level call: STAGED core — one compiled program
                # per butterfly stage with host-prebuilt twiddles (the
                # monolithic program miscompiled at n = 2^20, see
                # _ntt_core_staged).  When `a` is a tracer (the fused
                # witness program, capped at 2^18 where the monolithic
                # core is known-good), staged dispatch is impossible,
                # so the traced-slice core is kept there.
                base = self.group_gen if fwd else self.group_gen_inv
                tws = _stage_tws_cached(self.spec, base, self.size)
                return _ntt_core_staged(self.spec, a, tws)
            return _jitted_ntt_core(self.spec)(a, root_powers)
        root = self.group_gen if fwd else self.group_gen_inv
        return _jitted_ntt_core_mixed(self.spec, self.radixes)(
            a, root_powers, self._sub_powers(root)
        )

    # -- transforms ------------------------------------------------------------

    def fft(self, coeffs: jnp.ndarray, offset: int = 1) -> jnp.ndarray:
        """coefficients -> evaluations on offset*H.  coeffs: uint32[L, n]
        Montgomery form; shorter inputs must be pre-padded by the caller."""
        spec = self.spec
        a = coeffs
        assert a.shape[-1] == self.size
        if offset != 1:
            a = _jitted_mul(spec)(a, self._offset_powers(offset))
        return self._core(a, fwd=True)

    def ifft(self, evals: jnp.ndarray, offset: int = 1) -> jnp.ndarray:
        spec = self.spec
        a = self._core(evals, fwd=False)
        a = _jitted_mul(spec)(a, fp.const(spec, self.size_inv, (1,)))
        if offset != 1:
            p = self.field.modulus
            a = _jitted_mul(spec)(a, self._offset_powers(pow(offset, p - 2, p)))
        return a

    def coset_fft(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        """Evaluations on GENERATOR*H (r1cs_to_qap.rs:204-207)."""
        return self.fft(coeffs, offset=self.field.generator)

    def coset_ifft(self, evals: jnp.ndarray) -> jnp.ndarray:
        return self.ifft(evals, offset=self.field.generator)

    # -- scalar helpers (host ints; O(1)) ---------------------------------------

    def evaluate_vanishing_polynomial(self, t: int, offset: int = 1) -> int:
        p = self.field.modulus
        return (pow(t, self.size, p) - pow(offset, self.size, p)) % p
