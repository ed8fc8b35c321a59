"""Matrix operations (reference: numbers/matrix/matrix.go).

The reference uses gonum for eigendecomposition-based fractional matrix
powers; here numpy.linalg provides the same real-symmetric path, and
these feed the phylo substitution-matrix machinery
(expandedTree/substitutionMatrix.go).
"""

from __future__ import annotations

import numpy as np


def is_symmetric(m: np.ndarray) -> bool:
    m = np.asarray(m)
    return m.ndim == 2 and m.shape[0] == m.shape[1] \
        and bool((m == m.T).all())


def dense_log_symmetric(m: np.ndarray) -> np.ndarray:
    """matrix.DenseLogSymmetric (matrix.go:30): log(A) = V log(D) V^-1
    with imaginary parts discarded (real for symmetric input)."""
    m = np.asarray(m, np.float64)
    if not is_symmetric(m):
        raise ValueError("DenseLogSymmetric supports only symmetric input")
    vals, vecs = np.linalg.eig(m)
    vals = np.log(vals.real)
    vecs = vecs.real
    return vecs @ np.diag(vals) @ np.linalg.inv(vecs)


def _expm_symmetric(m: np.ndarray) -> np.ndarray:
    """exp(M) for matrices with a real eigendecomposition."""
    vals, vecs = np.linalg.eig(np.asarray(m, np.float64))
    vals = np.exp(vals.real)
    vecs = vecs.real
    return vecs @ np.diag(vals) @ np.linalg.inv(vecs)


def fractional_symmetric_matrix_exponentiation(m: np.ndarray,
                                               power: float) -> np.ndarray:
    """matrix.FractionalSymmetricMatrixExponentiation (matrix.go:16):
    A^t = exp(t * log(A)) for symmetric A and fractional t."""
    return _expm_symmetric(power * dense_log_symmetric(m))


def rref(m) -> list:
    """matrix.Rref (matrix.go:107): row-reduced echelon form, literal
    Gaussian elimination."""
    mc = [list(map(float, row)) for row in m]
    lead = 0
    for row in range(len(mc)):
        if lead >= len(mc[0]):
            return mc
        i = row
        while mc[i][lead] == 0:
            i += 1
            if i == len(mc):
                i = row
                lead += 1
                if lead == len(mc[0]):
                    return mc
        mc[i], mc[row] = mc[row], mc[i]
        factor = 1 / mc[row][lead]
        mc[row] = [v * factor for v in mc[row]]
        for i in range(len(mc)):
            if i != row:
                sub = mc[i][lead]
                mc[i] = [a - b * sub for a, b in zip(mc[i], mc[row])]
        lead += 1
    return mc


def approx_equal(m1, m2, precision: float) -> bool:
    """matrix.ApproxEqual (matrix.go:177): relative-precision compare."""
    a = np.asarray(m1, np.float64)
    b = np.asarray(m2, np.float64)
    if a.shape != b.shape:
        return False
    denom = np.maximum(a, b)
    with np.errstate(divide="ignore", invalid="ignore"):
        rel = np.abs(a - b) / denom
    return bool(np.all((np.abs(a - b) == 0) | (rel <= precision)))
