"""M3 — sequence-reduction (pooling) analogs in numpy.

Reference: the AttentiveReducer ("AWA", attentive weighted average —
reference ``dee/modules/__init__.py:104-141``) and the max / mean pooling
alternatives selected by ``seq_reduce_type`` (``dee/models/doc2edag.py:
87-155``, used for token→mention, mention→span and token→sentence
reduction; GIT uses the same switch, ``git.py:944-955``). The torch
version learns a query vector and softmax-attends over the sequence;
this numpy twin implements the same computation plus its exact gradient
(hand-derived, numerically checked in tests) so the attention query can
be TRAINED jointly with a downstream objective — here the biaffine
adjacency scorer (model/biaffine_scorer.py), mirroring how the reference
trains the reducer end-to-end through the event model.
"""

from __future__ import annotations

import numpy as np


def awa_pool(H: np.ndarray, q: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Attentive weighted average of rows of H ((T, d) → (d,)).

    att = softmax(H q / √d); out = attᵀ H — the AttentiveReducer forward
    (reference modules/__init__.py:127-141, scaled-dot form). Returns
    (out, att); att is needed by the backward pass.
    """
    H = np.asarray(H, dtype=np.float64)
    d = H.shape[1]
    z = H @ q / np.sqrt(d)
    z = z - z.max()
    a = np.exp(z)
    a = a / a.sum()
    return a @ H, a


def awa_pool_backward(
    H: np.ndarray, q: np.ndarray, att: np.ndarray, g_out: np.ndarray
) -> np.ndarray:
    """∂L/∂q given upstream gradient g_out = ∂L/∂out.

    out = attᵀ H        → ∂L/∂att = H g_out
    att = softmax(z)     → ∂L/∂z  = (diag(att) − att attᵀ) ∂L/∂att
    z = H q / √d         → ∂L/∂q  = Hᵀ ∂L/∂z / √d
    """
    H = np.asarray(H, dtype=np.float64)
    d = H.shape[1]
    g_att = H @ g_out
    g_z = att * (g_att - float(att @ g_att))
    return H.T @ g_z / np.sqrt(d)


def max_pool(H: np.ndarray) -> np.ndarray:
    """Per-dimension max over rows (seq_reduce_type='MaxPooling',
    doc2edag.py:96-99)."""
    return np.asarray(H, dtype=np.float64).max(axis=0)


def mean_pool(H: np.ndarray) -> np.ndarray:
    """Row mean (seq_reduce_type='MeanPooling', doc2edag.py:100-102)."""
    return np.asarray(H, dtype=np.float64).mean(axis=0)
