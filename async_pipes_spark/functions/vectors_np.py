"""Arrow-side (numpy) kernels replicating the engine's sequential
float32 dot-product contract (functions.vectors.dot_f32) bit-for-bit.

numpy's own reductions (``np.dot``, ``ndarray.sum``) use pairwise/SIMD
accumulation orders whose float32 results can differ in the last ulp
from a sequential fold; these kernels instead loop over the dimension
axis with elementwise binary32 ops. Each add/mul is an IEEE-754
correctly-rounded operation, so the result equals the scalar sequential
fold exactly — at numpy speed (d vectorized ops instead of n·m·d
interpreted lambda evaluations).
"""

from __future__ import annotations

import numpy as np


def seq_f32_dots(C: np.ndarray, Q: np.ndarray) -> np.ndarray:
    """All-pairs dot products, (n,d) f32 × (m,d) f32 → (n,m) f32,
    accumulated sequentially over the dimension axis."""
    acc = np.zeros((C.shape[0], Q.shape[0]), dtype=np.float32)
    for d in range(C.shape[1]):
        acc += C[:, d, None] * Q[None, :, d]
    return acc


def seq_f32_self_dots(C: np.ndarray) -> np.ndarray:
    """Per-row self dot product, (n,d) f32 → (n,) f32 sequential fold."""
    acc = np.zeros(C.shape[0], dtype=np.float32)
    for d in range(C.shape[1]):
        acc += C[:, d] * C[:, d]
    return acc


def micro_units_np(x: np.ndarray, scale: float = 1e6) -> np.ndarray:
    """floor(x*scale + 0.5) as int64 — same IEEE ops as
    functions.vectors.micro_units."""
    return np.floor(x * scale + 0.5).astype(np.int64)


def seq_f32_rowwise_dots(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Row-paired dot products, (n,d) f32 × (n,d) f32 → (n,) f32,
    accumulated sequentially over the dimension axis — the paired-rows
    form of :func:`seq_f32_dots` (for joined (query, candidate) pairs
    where the all-pairs matrix would be n× wasted work)."""
    acc = np.zeros(A.shape[0], dtype=np.float32)
    for d in range(A.shape[1]):
        acc += A[:, d] * B[:, d]
    return acc
