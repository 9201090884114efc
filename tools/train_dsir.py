"""Train the DSIR importance model and freeze it to
golden_fixtures/dsir.npz (run offline; the committed npz is the model
spec — see docee_spark/operators/dsir.py)."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from docee_spark.golden import GOLDEN_DIR  # noqa: E402
from docee_spark.operators.dsir import (  # noqa: E402
    save_dsir,
    synth_dsir_corpora,
    train_dsir,
)


def main() -> None:
    target, source = synth_dsir_corpora()
    model = train_dsir(target, source)
    # sanity: held-out target docs must outscore held-out source-web docs
    t2, s2 = synth_dsir_corpora(n_per_side=200, seed=99)
    tw = np.array([model.logw_e6(t) / max(1, len(t.split())) for t in t2])
    sw = np.array([model.logw_e6(t) / max(1, len(t.split())) for t in s2])
    sep = float((tw.mean() - sw.mean()))
    print(f"mean per-token logw_e6: target={tw.mean():.0f} source={sw.mean():.0f}")
    assert sep > 0, "target must outscore source on held-out data"
    out = os.path.join(GOLDEN_DIR, "dsir.npz")
    save_dsir(model, out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
