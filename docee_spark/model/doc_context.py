"""M4 — doc-context encoding: joint attention over [spans ∥ sentences].

Reference: Doc2EDAG encodes mention and sentence embeddings TOGETHER with
a multi-layer transformer so every span representation sees document-level
context before event decoding (``dee/models/doc2edag.py:69-76,178-216``;
encoder in ``dee/modules/transformer.py``). This numpy analog implements
the core of that computation — one scaled-dot self-attention layer with
learned Wq/Wk/Wv and a residual connection — over the node matrix
[span embeddings ∥ sentence embeddings], with the exact backward pass
(hand-derived, numerically checked in tests) so the layer trains jointly
with the downstream biaffine pair objective.

Documented deviations from the reference encoder, chosen to keep the
analog torch-free and trainable by hand: single head, single layer, no
feed-forward block, no LayerNorm; context is applied at span level (after
the M3 mention→span reduction) rather than at mention level — this bounds
the node count to n_spans + n_sentences per document.
"""

from __future__ import annotations

import numpy as np


class DocContextAttention:
    """One residual self-attention layer: Z' = Z + softmax(ZWq(ZWk)ᵀ/√d) Z Wv."""

    def __init__(self, Wq: np.ndarray, Wk: np.ndarray, Wv: np.ndarray):
        self.Wq = np.asarray(Wq, dtype=np.float64)
        self.Wk = np.asarray(Wk, dtype=np.float64)
        self.Wv = np.asarray(Wv, dtype=np.float64)

    @classmethod
    def init(cls, d: int, rng: np.random.Generator) -> "DocContextAttention":
        # near-identity start: small weights → attention output ≈ 0 and the
        # residual passes span embeddings through; training grows the mixing
        return cls(
            rng.normal(0.0, 0.05, (d, d)),
            rng.normal(0.0, 0.05, (d, d)),
            rng.normal(0.0, 0.05, (d, d)),
        )

    def forward(self, Z: np.ndarray):
        """→ (Z', cache)."""
        Z = np.asarray(Z, dtype=np.float64)
        d = Z.shape[1]
        Q, K, V = Z @ self.Wq, Z @ self.Wk, Z @ self.Wv
        S = Q @ K.T / np.sqrt(d)
        S = S - S.max(axis=1, keepdims=True)
        A = np.exp(S)
        A = A / A.sum(axis=1, keepdims=True)
        out = Z + A @ V
        return out, (Z, Q, K, V, A)

    def backward(self, cache, gZp: np.ndarray):
        """∂L/∂(Wq, Wk, Wv, Z) given ∂L/∂Z'."""
        Z, Q, K, V, A = cache
        d = Z.shape[1]
        gZ = gZp.copy()  # residual branch
        gO = gZp
        gA = gO @ V.T
        gV = A.T @ gO
        # row-wise softmax jacobian
        gS = A * (gA - (gA * A).sum(axis=1, keepdims=True))
        gQ = gS @ K / np.sqrt(d)
        gK = gS.T @ Q / np.sqrt(d)
        gWq = Z.T @ gQ
        gWk = Z.T @ gK
        gWv = Z.T @ gV
        gZ += gQ @ self.Wq.T + gK @ self.Wk.T + gV @ self.Wv.T
        return gWq, gWk, gWv, gZ
