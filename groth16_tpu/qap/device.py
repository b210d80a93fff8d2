"""Device QAP witness map: sparse matvec + the 7-NTT pipeline.

TPU-native realization of `LibsnarkReduction::witness_map_from_matrices`
(/root/reference/src/r1cs_to_qap.rs:172-235; math spec SURVEY.md §2.3(2)).
Bit-identical to the exact engine in qap/reduction.py (tested in
tests/test_qap_device.py).

Sparse matvec design (SURVEY.md §7 phase 4): matrices are COO triples
sorted by row.  Per-row sums are computed scatter-free with a segmented
inclusive scan — the monoid is (flag, value) with modular add — followed
by a gather of each row's last element.  Empty rows gather a zero via a
host-precomputed validity mask.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from groth16_tpu.fields import fp
from groth16_tpu.fields.spec import FpSpec, encode
from groth16_tpu.ntt.ntt import NttDomain
from groth16_tpu.r1cs.matrices import ConstraintMatrices, FlatMatrix


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceMatrix:
    """One flattened constraint matrix, device-resident.

    coeffs: uint32[L, nnz] Montgomery (limb-major); cols: int32[nnz];
    seg_start: bool[nnz] (True at each row's first entry); end_idx:
    int32[num_rows] (index of each row's last entry, 0 for empty rows);
    nonempty: bool[num_rows].
    """

    coeffs: jnp.ndarray
    cols: jnp.ndarray
    seg_start: jnp.ndarray
    end_idx: jnp.ndarray
    nonempty: jnp.ndarray
    num_rows: int  # static

    def tree_flatten(self):
        return (
            (self.coeffs, self.cols, self.seg_start, self.end_idx, self.nonempty),
            self.num_rows,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, num_rows=aux)


def encode_matrix(m: FlatMatrix, fr: FpSpec) -> DeviceMatrix:
    nnz = m.nnz
    if nnz == 0:
        # one dummy zero entry keeps shapes static and sums exact
        return DeviceMatrix(
            coeffs=jnp.asarray(encode([0], fr)),
            cols=jnp.zeros((1,), jnp.int32),
            seg_start=jnp.ones((1,), jnp.bool_),
            end_idx=jnp.zeros((m.num_rows,), jnp.int32),
            nonempty=jnp.zeros((m.num_rows,), jnp.bool_),
            num_rows=m.num_rows,
        )
    rows = m.rows
    row_ptr = np.searchsorted(rows, np.arange(m.num_rows + 1))
    nonempty = row_ptr[1:] > row_ptr[:-1]
    end_idx = np.where(nonempty, row_ptr[1:] - 1, 0)
    seg_start = np.zeros(nnz, dtype=bool)
    seg_start[row_ptr[:-1][nonempty]] = True
    return DeviceMatrix(
        coeffs=jnp.asarray(encode(m.coeffs, fr)),
        cols=jnp.asarray(m.cols),
        seg_start=jnp.asarray(seg_start),
        end_idx=jnp.asarray(end_idx.astype(np.int32)),
        nonempty=jnp.asarray(nonempty),
        num_rows=m.num_rows,
    )


def encode_matrices(matrices: ConstraintMatrices, fr: FpSpec):
    flat = matrices.flatten()
    return {k: encode_matrix(v, fr) for k, v in flat.items()}


def sparse_matvec(spec: FpSpec, dm: DeviceMatrix, z: jnp.ndarray) -> jnp.ndarray:
    """rows_i = <matrix_i, z> mod p -> uint32[L, num_rows] Montgomery."""
    vals = fp.mont_mul(spec, dm.coeffs, z[:, dm.cols])

    def combine(a, b):
        fa, va = a
        fb, vb = b
        v = fp.select(fb, vb, fp.add_strict(spec, va, vb))
        return jnp.logical_or(fa, fb), v

    # element axis is trailing: scan flags as a [1, nnz] row so both
    # leaves share a positive scan axis
    flags, scanned = jax.lax.associative_scan(
        combine, (dm.seg_start[None], vals), axis=1
    )
    del flags
    sums = scanned[:, dm.end_idx]
    return fp.select(dm.nonempty, sums, fp.zeros(spec, (dm.num_rows,)))


def witness_map_device(
    spec: FpSpec,
    domain: NttDomain,
    mats,  # dict a/b/c -> DeviceMatrix
    z_mont: jnp.ndarray,  # uint32[L, nv] Montgomery full assignment
    num_inputs: int,
    num_constraints: int,
) -> jnp.ndarray:
    """-> h coefficients, uint32[L, n] Montgomery (r1cs_to_qap.rs:172-235)."""
    n = domain.size
    zero_pad = lambda x: jnp.concatenate(
        [x, fp.zeros(spec, (n - x.shape[-1],))], axis=-1
    ) if x.shape[-1] < n else x

    a = sparse_matvec(spec, mats["a"], z_mont)
    b = sparse_matvec(spec, mats["b"], z_mont)
    # input-consistency splice (r1cs_to_qap.rs:195-199): rows
    # [num_constraints, num_constraints + num_inputs) of a get the public
    # inputs; b stays zero there.
    a = jnp.concatenate(
        [a[:, :num_constraints], z_mont[:, :num_inputs]], axis=-1
    )
    a = zero_pad(a)
    b = zero_pad(b[:, :num_constraints])

    a = domain.ifft(a)
    b = domain.ifft(b)
    a = domain.coset_fft(a)
    b = domain.coset_fft(b)
    ab = fp.mont_mul(spec, a, b)

    c = sparse_matvec(spec, mats["c"], z_mont)
    c = zero_pad(c[:, :num_constraints])
    c = domain.ifft(c)
    c = domain.coset_fft(c)

    p = spec.modulus
    zg = domain.evaluate_vanishing_polynomial(domain.field.generator)
    zg_inv = pow(zg, p - 2, p)
    ab = fp.mont_mul(spec, fp.sub(spec, ab, c), fp.const(spec, zg_inv, (1,)))
    return domain.coset_ifft(ab)


# -- device QAP instance map (setup side) ---------------------------------------


def encode_matrix_transposed(
    m: FlatMatrix, fr: FpSpec, num_vars: int
) -> DeviceMatrix:
    """COLUMN-sorted encoding of a constraint matrix: segments per
    VARIABLE, entry payload gathers by constraint ROW.  Feeding this to
    sparse_matvec with z = the Lagrange-coefficient vector u computes
    the setup's per-variable accumulation
        a[var] = sum_i u_i(t) * coeff_{i,var}
    (/root/reference/src/r1cs_to_qap.rs:157-167) with the exact same
    segmented-scan kernel the prover uses for row sums."""
    nnz = m.nnz
    if nnz == 0:
        return DeviceMatrix(
            coeffs=jnp.asarray(encode([0], fr)),
            cols=jnp.zeros((1,), jnp.int32),
            seg_start=jnp.ones((1,), jnp.bool_),
            end_idx=jnp.zeros((num_vars,), jnp.int32),
            nonempty=jnp.zeros((num_vars,), jnp.bool_),
            num_rows=num_vars,
        )
    order = np.argsort(m.cols, kind="stable")
    cols_sorted = m.cols[order]
    rows_sorted = m.rows[order].astype(np.int32)
    coeffs_sorted = [m.coeffs[i] for i in order]
    col_ptr = np.searchsorted(cols_sorted, np.arange(num_vars + 1))
    nonempty = col_ptr[1:] > col_ptr[:-1]
    end_idx = np.where(nonempty, col_ptr[1:] - 1, 0)
    seg_start = np.zeros(nnz, dtype=bool)
    seg_start[col_ptr[:-1][nonempty]] = True
    return DeviceMatrix(
        coeffs=jnp.asarray(encode(coeffs_sorted, fr)),
        cols=jnp.asarray(rows_sorted),
        seg_start=jnp.asarray(seg_start),
        end_idx=jnp.asarray(end_idx.astype(np.int32)),
        nonempty=jnp.asarray(nonempty),
        num_rows=num_vars,
    )


def lagrange_coeffs_device(
    spec: FpSpec, domain: NttDomain, t: int, xs: jnp.ndarray | None = None
) -> jnp.ndarray:
    """All n Lagrange coefficients L_i(t) on device, Montgomery form.

    Same O(n)-mulmod identity as the exact engine
    (ref/domain.py evaluate_all_lagrange_coefficients): on the plain
    radix-2 domain H = <w>, L_i(t) = (Z(t)/n) * x_i / (t - x_i) with
    Z(t) = t^n - 1.  The denominators batch-invert in one Fermat
    inverse + two product scans (fp.batch_inv).  Caller must ensure t
    is OUTSIDE the domain (generator.rs:90 samples it so).

    xs: optional precomputed domain-element table [L, n] (Montgomery).
    Callers tracing this function MUST pass it as a traced argument:
    fetching it via powers() mid-trace inlines an O(n*L) CONSTANT into
    the program (162 MB of MLIR at 2^20 — the compile helper gets
    OOM-killed; observed round 5)."""
    n = domain.size
    p = spec.modulus

    zt = (pow(t, n, p) - 1) % p
    assert zt != 0, "t must be outside the domain"
    c0 = zt * pow(n % p, p - 2, p) % p  # Z(t) / n
    if xs is None:
        from groth16_tpu.ntt.ntt import powers

        xs = powers(spec, domain.group_gen, n)  # [L, n] Montgomery
    tm = jnp.broadcast_to(fp.const(spec, t, (1,)), xs.shape)
    invd = fp.batch_inv(spec, fp.sub_strict(spec, tm, xs))
    return fp.mont_mul(spec, fp.mul_const(spec, xs, c0), invd)


def instance_map_device(
    spec: FpSpec,
    domain: NttDomain,
    mats_t,  # dict a/b/c -> transposed DeviceMatrix (encode_matrix_transposed)
    t: int,
    num_instance: int,
    num_constraints: int,
    xs: jnp.ndarray | None = None,  # see lagrange_coeffs_device
):
    """QAP instance map on device: per-variable a_i(t), b_i(t), c_i(t)
    (r1cs_to_qap.rs:128-170) as Montgomery [L, num_vars] arrays.

    Bit-identical to LibsnarkReduction.instance_map_with_evaluation
    (tests/test_generator_device_qap.py); the input-consistency rows'
    contribution u_{nc+j}(t) lands on the instance variables
    (r1cs_to_qap.rs:150-155)."""
    u = lagrange_coeffs_device(spec, domain, t, xs=xs)
    a = sparse_matvec(spec, mats_t["a"], u)
    b = sparse_matvec(spec, mats_t["b"], u)
    c = sparse_matvec(spec, mats_t["c"], u)
    a_inst = fp.add_strict(
        spec,
        a[:, :num_instance],
        u[:, num_constraints : num_constraints + num_instance],
    )
    a = jnp.concatenate([a_inst, a[:, num_instance:]], axis=-1)
    return a, b, c
