"""Independent check for kcenter_coreset: replay the greedy trajectory
with numpy on the driver and compare step-for-step."""

from __future__ import annotations

import numpy as np

from mr_spark import operators as ops
from mr_spark.sources import load_table

from conftest import SF_DIR


def test_kcenter_matches_numpy_greedy(spark):
    rows = sorted(
        ops.queries()["kcenter_coreset"](spark, SF_DIR).collect(),
        key=lambda r: r["step"],
    )
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in emb])
    q = np.round(np.array([r["embedding"] for r in emb], dtype=np.float64) * 1e6)

    order = np.argsort(ids)
    ids, q = ids[order], q[order]
    picked = [0]  # min vec_id after sort
    mind = ((q - q[0]) ** 2).sum(axis=1)
    expect = [(1, int(ids[0]), 0)]
    for step in range(2, 6):
        # argmax with vec_id tie-break: flip sign, lexsort on (−mind, id)
        best = np.lexsort((ids, -mind))[0]
        expect.append((step, int(ids[best]), int(mind[best])))
        picked.append(best)
        mind = np.minimum(mind, ((q - q[best]) ** 2).sum(axis=1))

    got = [(r["step"], r["vec_id"], r["radius_sq"]) for r in rows]
    assert got == expect
    # coverage radius is monotone non-increasing after the seed
    radii = [r for _, _, r in got[1:]]
    assert radii == sorted(radii, reverse=True)
    # chosen points are pairwise distinct
    assert len({v for _, v, _ in got}) == 5
