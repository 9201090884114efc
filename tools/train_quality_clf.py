"""Train the hashed-n-gram quality classifier and freeze it into
golden_fixtures/quality_clf.npz (run offline; the committed npz is the
model spec — see docee_spark/model/quality_clf.py)."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from docee_spark.model.quality_clf import (  # noqa: E402
    save_classifier,
    synth_corpus,
    train_quality_clf,
)


def main() -> None:
    docs, labels = synth_corpus(n_per_class=1500, seed=42)
    n_hold = 600
    clf = train_quality_clf(docs[:-n_hold], labels[:-n_hold])
    pred = np.array([1 if clf.keep(t) else 0 for t in docs[-n_hold:]])
    acc = float((pred == labels[-n_hold:]).mean())
    print(f"held-out accuracy on {n_hold} docs: {acc:.4f}")
    assert acc >= 0.97, f"training regressed: acc={acc}"
    out = os.path.join(
        os.path.dirname(__file__), "..", "golden_fixtures", "quality_clf.npz"
    )
    save_classifier(clf, out)
    print(f"saved {out} (D={clf.d}, b_e6={clf.b_e6})")


if __name__ == "__main__":
    main()
