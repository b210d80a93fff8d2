"""Sparse constraint matrices in row form + flat (COO/CSR-like) arrays.

`ConstraintMatrices` mirrors the export shape the reference consumes at
r1cs_to_qap.rs:157-167 (rows of (coeff, column) pairs).  `flatten()` turns
them into structure-of-arrays form for the TPU witness-evaluation kernel
(gather + segmented reduction, SURVEY.md §7 phase 4).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np


@dataclasses.dataclass
class ConstraintMatrices:
    num_instance_variables: int
    num_witness_variables: int
    num_constraints: int
    a: List[List[Tuple[int, int]]]
    b: List[List[Tuple[int, int]]]
    c: List[List[Tuple[int, int]]]

    @property
    def num_variables(self) -> int:
        return self.num_instance_variables + self.num_witness_variables

    def flatten(self):
        """-> dict of three FlatMatrix for the device pipeline."""
        return {
            "a": FlatMatrix.from_rows(self.a, self.num_constraints),
            "b": FlatMatrix.from_rows(self.b, self.num_constraints),
            "c": FlatMatrix.from_rows(self.c, self.num_constraints),
        }


@dataclasses.dataclass
class FlatMatrix:
    """COO triples sorted by row: coeffs (python ints), cols, rows."""

    coeffs: List[int]
    cols: np.ndarray  # int32 [nnz]
    rows: np.ndarray  # int32 [nnz]
    num_rows: int

    @staticmethod
    def from_rows(rows: List[List[Tuple[int, int]]], num_rows: int) -> "FlatMatrix":
        coeffs, cols, rws = [], [], []
        for i, row in enumerate(rows):
            for coeff, col in row:
                coeffs.append(coeff)
                cols.append(col)
                rws.append(i)
        return FlatMatrix(
            coeffs=coeffs,
            cols=np.asarray(cols, dtype=np.int32),
            rows=np.asarray(rws, dtype=np.int32),
            num_rows=num_rows,
        )

    @property
    def nnz(self) -> int:
        return len(self.coeffs)
