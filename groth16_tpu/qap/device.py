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
