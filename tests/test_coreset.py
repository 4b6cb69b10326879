"""Independent check for kcenter_coreset: replay the greedy trajectory
with numpy on the driver and compare step-for-step."""

from __future__ import annotations

import numpy as np

from mr_spark import operators as ops
from mr_spark.sources import load_table

from conftest import SF_DIR, round_half_away


def test_kcenter_matches_numpy_greedy(spark):
    rows = sorted(
        ops.queries()["kcenter_coreset"](spark, SF_DIR).collect(),
        key=lambda r: r["step"],
    )
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in emb])
    q = round_half_away(np.array([r["embedding"] for r in emb], dtype=np.float64) * 1e6)

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


def test_hard_negatives_match_numpy(spark):
    """For each mined anchor, positives/negatives recomputed by numpy
    argmax over exact quantized dots must agree, and margin = pos−neg."""
    import numpy as np

    rows = {r["anchor_id"]: r for r in ops.queries()["hard_negative_mining"](spark, SF_DIR).collect()}
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "label", "embedding").collect()
    ids = np.array([r["vec_id"] for r in emb])
    labels = np.array([r["label"] for r in emb])
    m = np.array([r["embedding"] for r in emb], dtype=np.float64)
    q = round_half_away(m / np.linalg.norm(m, axis=1, keepdims=True) * 1e6)
    order = np.argsort(ids)
    ids, labels, q = ids[order], labels[order], q[order]
    sims = (q @ q.T) / 1e12

    # anchors: same hash rule as the operator (checked via membership)
    assert rows
    for aid, row in rows.items():
        ai = int(np.searchsorted(ids, aid))
        s = sims[ai].copy()
        s[ai] = -np.inf
        same = labels == labels[ai]
        # argmax with vec_id tie-break
        def pick(mask):
            cand = np.where(mask)[0]
            best = cand[np.lexsort((ids[cand], -s[cand]))[0]]
            return ids[best], s[best]
        pid, ps = pick(same & (ids != aid))
        nid, ns = pick(~same)
        assert row["pos_id"] == pid and abs(row["pos_sim"] - round(ps, 6)) < 1e-9
        assert row["neg_id"] == nid and abs(row["neg_sim"] - round(ns, 6)) < 1e-9
        assert abs(row["margin"] - round(ps - ns, 6)) < 1e-9


def test_centroid_confusion_matches_numpy(spark):
    """Confusion counts recomputed with numpy nearest-centroid (rounded
    integer centroids, dot argmax with label tie-break); matrix covers
    every vector."""
    import numpy as np

    got = {
        (r["true_label"], r["pred_label"]): r["n_vecs"]
        for r in ops.queries()["centroid_confusion"](spark, SF_DIR).collect()
    }
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "label", "embedding").collect()
    labels = np.array([r["label"] for r in emb])
    m = np.array([r["embedding"] for r in emb], dtype=np.float64)
    q = round_half_away(m / np.linalg.norm(m, axis=1, keepdims=True) * 1e6)
    cents = {}
    for lab in sorted(set(labels.tolist())):
        cents[lab] = round_half_away(q[labels == lab].sum(axis=0) / (labels == lab).sum())
    labs = sorted(cents)
    c_mat = np.stack([cents[k] for k in labs])
    d = q @ c_mat.T
    pred = np.array([labs[i] for i in np.argmax(d, axis=1)])  # ties: lowest label wins via argmax-first
    expect: dict = {}
    for t, p in zip(labels.tolist(), pred.tolist()):
        expect[(t, p)] = expect.get((t, p), 0) + 1
    assert got == expect
    assert sum(got.values()) == len(labels)
