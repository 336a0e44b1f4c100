"""Distance metrics (EXTENSION — the reference is squared-L2 only).

Three metrics, one ranking convention: every query path sorts ascending
on a *ranking key*, so all downstream machinery (ADC lookup kernels,
native k-best heaps, ``lax.top_k`` merges, ``+inf`` padding) is shared:

``"l2"``
    Squared Euclidean distance — the reference's metric
    (``db/stored.rs:549-598``). Key = ``‖q − x‖²``.

``"dot"``
    Maximum inner product (MIPS). Key = ``−⟨q, x⟩`` (lower = larger
    inner product). On the IVF-PQ path the key decomposes exactly like
    the L2 ADC sum: ``−⟨q, x̂⟩ = −⟨q, c_p⟩ − Σ_d ⟨q_d, cb[d, code_d]⟩``,
    so the per-probe scalar ``−⟨q, c_p⟩/D`` folds INTO the D×C lookup
    tables and the scan/heap/top-k code paths run unchanged — the table
    is even cheaper than L2's (no residual per partition: one ``[D, C]``
    query·codebook product plus a per-probe scalar shift). Reported
    ``squared_distance`` is the key, i.e. the *negated* inner product.

``"cosine"``
    Cosine similarity, implemented exactly as L2 over unit vectors:
    corpus rows are normalized at build time, queries at query time, and
    ``argmin ‖q̂ − x̂‖²`` ≡ ``argmax cos(q, x)``. Key = ``‖q̂ − x̂‖²``
    ``= 2 − 2·cos``; recover the similarity as ``1 − key/2``. Zero
    vectors have no direction and are rejected.

Training (k-means partitioning + PQ codebooks) is L2 for every metric —
the standard IVF construction for MIPS/cosine as well (FAISS does the
same); only the *query-time scoring* changes.

Wire format: the root manifest records a non-L2 metric in extension
field 21 (``protos.messages.PDatabase.metric``). The reference would
skip the unknown field and serve the index as L2 — same caveat as the
OPQ rotation (field 20), documented in ``docs/FORMAT.md``.
"""

from __future__ import annotations

import numpy as np

from .errors import InvalidArgs

#: Accepted metric names. "" (absent wire field) means "l2".
VALID_METRICS = ("l2", "dot", "cosine")


def check_metric(metric: str) -> str:
    """Validates and canonicalizes a metric name ("" → "l2")."""
    m = metric or "l2"
    if m not in VALID_METRICS:
        raise InvalidArgs(
            f"unknown metric: {metric!r} (expected one of {VALID_METRICS})")
    return m


def normalize_rows(x: np.ndarray, what: str = "vector") -> np.ndarray:
    """Unit-normalizes rows for the cosine metric; zero rows are invalid.

    ``x: [N, M]`` (any float dtype) → same-dtype normalized copy.
    """
    norms = np.linalg.norm(x, axis=-1, keepdims=True)
    bad = np.nonzero(norms.reshape(-1) == 0)[0]
    if bad.size:
        raise InvalidArgs(
            f"cosine metric: {what} {int(bad[0])} has zero norm "
            "(no direction)")
    return (x / norms).astype(x.dtype, copy=False)
