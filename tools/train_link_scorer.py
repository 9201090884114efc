"""Train the entity-link pair scorer and freeze it into
golden_fixtures/link_scorer.npz (run offline; the committed npz is the
model spec — see docee_spark/model/link_scorer.py)."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from docee_spark.model.link_scorer import (  # noqa: E402
    save_scorer,
    synth_link_pairs,
    train_link_scorer,
)


def main() -> None:
    pairs, labels = synth_link_pairs(seed=11)
    n_hold = max(200, len(pairs) // 5)
    sc = train_link_scorer(pairs[:-n_hold], labels[:-n_hold])
    pred = np.array([1 if sc.links(m, a) else 0 for m, a in pairs[-n_hold:]])
    acc = float((pred == np.array(labels[-n_hold:])).mean())
    print(f"held-out pair accuracy on {n_hold}: {acc:.4f}")
    print("w_e6 =", sc.w_e6.tolist(), "b_e12 =", sc.b_e12)
    assert acc >= 0.95, f"training regressed: acc={acc}"
    out = os.path.join(
        os.path.dirname(__file__), "..", "golden_fixtures", "link_scorer.npz"
    )
    save_scorer(sc, out)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
