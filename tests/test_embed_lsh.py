"""Hyperplane-LSH embedding near-dup: recall vs the exact broadcast path."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from osm_merge_ray.sim.embed_lsh import embedding_neardup_lsh


@pytest.fixture(scope="module")
def vec_table(ray_session):
    """300 random unit vectors + 40 planted near-dup partners
    (cos >= ~0.95)."""
    rng = np.random.default_rng(3)
    base = rng.standard_normal((300, 32))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(300)]
    for i in range(40):
        # 0.04 * N(0, I_32) adds norm ~0.23 → cos ≈ 0.975, above threshold
        v = base[i] + 0.04 * rng.standard_normal(32)
        v /= np.linalg.norm(v)
        rows.append({"vec_id": 1000 + i, "embedding": v.tolist()})
    return pd.DataFrame(rows), base


def test_lsh_neardup_recall(vec_table):
    df, base = vec_table
    out = embedding_neardup_lsh(rd.from_pandas(df), dim=32, threshold=0.9).to_pandas()
    got = set(zip(out["id_a"], out["id_b"]))
    # exact truth by brute force
    mat = np.vstack(df["embedding"].to_numpy())
    ids = df["vec_id"].to_numpy()
    sims = np.round(mat @ mat.T, 6)
    ii, jj = np.nonzero(np.triu(sims >= 0.9, k=1))
    truth = set(zip(ids[ii], ids[jj]))
    truth = {(min(a, b), max(a, b)) for a, b in truth}
    assert len(truth) >= 30  # plants survived
    assert got <= truth      # no false positives (cosine verified)
    recall = len(got & truth) / len(truth)
    assert recall >= 0.85
