"""train_test split mode (implemented properly where the reference exits)."""

import numpy as np
import pandas as pd


def test_stratified_split_balances(rng):
    from stutter_tpu.train.data import stratified_split

    n = 100
    meta = pd.DataFrame({
        "path": [f"p{i}" for i in range(n)],
        "label": ["a"] * 70 + ["b"] * 30,
    })
    emb = rng.randn(n, 8).astype(np.float32)
    tr_m, tr_e, te_m, te_e = stratified_split(meta, emb, test_size=0.2, seed=0)
    assert len(tr_m) + len(te_m) == n
    assert len(tr_e) == len(tr_m) and len(te_e) == len(te_m)
    # per-class proportions approximately preserved
    assert (te_m["label"] == "a").sum() == 14
    assert (te_m["label"] == "b").sum() == 6
    # no leakage
    assert not set(tr_m["path"]) & set(te_m["path"])
