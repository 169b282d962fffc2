"""Sketch-family invariants: KMV estimator quality + lossless merge,
CMS one-sided error, bloom no-false-negatives vs the exact
decontamination pass, and the plan shapes that make each one scale."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from geospatial_store_siting_spark.operators import dedup, sketches


def test_kmv_estimator_matches_theory_and_exact(geo):
    rows = {r["event_type"]: r for r in sketches.kmv_distinct_users(geo).collect()}
    assert rows, "no sketch rows"
    k = sketches.KMV_K
    for et, r in rows.items():
        assert r["n_seen"] == min(k, r["exact_distinct"]), et
        if r["exact_distinct"] < k:
            # below k the sketch IS the exact count
            assert r["est_distinct"] == float(r["exact_distinct"]), et
        else:
            # KMV relative error concentrates within ~O(1/sqrt(k));
            # 4/sqrt(k) is a loose deterministic-fixture bound
            rel = abs(r["est_distinct"] / r["exact_distinct"] - 1.0)
            assert rel < 4.0 / math.sqrt(k), (et, rel)


def test_kmv_merge_is_lossless(geo):
    """Merging per-group k-min sets must reproduce the k-min set a
    single global sketch would have built — the defining KMV property
    (the global k smallest hashes all survive every per-group cut)."""
    k = sketches.KMV_K
    d = (
        geo.table("events")
        .select(F.expr(sketches._kmv_hash("user_id", fast=True)).alias("h"))
        .distinct()
    )
    direct = sorted(x["h"] for x in d.orderBy("h").limit(k).collect())
    merged = sketches.kmv_merged_global(geo).collect()[0]
    assert merged["n_seen"] == min(k, len(direct))
    if merged["n_seen"] == k:
        assert merged["kth_hash"] == direct[-1]
    # and the estimator applied to the merged sketch matches a direct
    # global KMV estimate recomputed here
    if merged["exact_distinct"] < k:
        expect = float(merged["exact_distinct"])
    else:
        expect = (k - 1) * float(1 << 48) / direct[-1]
        expect = math.floor(expect * 1e4 + 0.5) / 1e4
    assert merged["est_distinct"] == expect


def test_kmv_overlap_set_algebra(geo):
    """Pair estimates must obey the KMV set algebra exactly: the
    combined sketch is the k-min of the two input k-min sets, n_both
    counts its doubly-flagged survivors, and the estimators are pure
    functions of (n_seen, kth_hash, n_both).  Recompute all three from
    the per-type sketches here and require equality — plus sanity vs
    the exact overlap."""
    k = sketches.KMV_K
    pg = {}  # event_type -> sorted k-min hash list
    d = (
        geo.table("events")
        .select(
            "event_type",
            F.expr(sketches._kmv_hash("user_id", fast=True)).alias("h"),
        )
        .distinct()
        .collect()
    )
    for r in d:
        pg.setdefault(r["event_type"], []).append(r["h"])
    pg = {t: sorted(hs)[:k] for t, hs in pg.items()}
    rows = sketches.kmv_audience_overlap(geo).collect()
    assert len(rows) == len(pg) * (len(pg) - 1) // 2
    for r in rows:
        sa, sb = set(pg[r["type_a"]]), set(pg[r["type_b"]])
        comb = sorted(sa | sb)[:k]
        assert r["n_seen"] == len(comb)
        assert r["kth_hash"] == comb[-1]
        n_both = sum(1 for h in comb if h in sa and h in sb)
        assert r["n_both"] == n_both
        if r["n_seen"] < k:
            union_est = float(r["n_seen"])
        else:
            union_est = (k - 1) * float(1 << 48) / comb[-1]
        jacc = n_both / r["n_seen"]
        for got, raw in (
            (r["est_union"], union_est),
            (r["est_jaccard"], jacc),
            (r["est_overlap"], jacc * union_est),
        ):
            assert got == math.floor(raw * 1e4 + 0.5) / 1e4, r
        # estimator sanity on the deterministic fixture: overlap
        # estimate lands within the KMV error band of the exact value
        if r["exact_overlap"]:
            rel = abs(r["est_overlap"] / r["exact_overlap"] - 1.0)
            assert rel < 4.0 / math.sqrt(k), (r["type_a"], r["type_b"], rel)


def test_cms_estimates_are_one_sided(geo):
    out = sketches.cms_heavy_hitters(geo).collect()
    assert out, "no heavy hitters at this SF — lower HH_MIN"
    for r in out:
        assert r["cms_count"] >= r["exact_count"], r["tok"]
        assert r["overcount"] == r["cms_count"] - r["exact_count"]


def test_bloom_has_no_false_negatives_vs_exact_decontaminate(geo):
    """Every leak the exact pass finds must be found by the bloom
    prefilter with the SAME per-doc shared-shingle count; extra bloom
    docs (n_true_shingles = 0) are the expected false-positive fringe."""
    exact = {
        r["doc_id"]: r["n_eval_shingles"]
        for r in dedup.decontaminate(geo).collect()
    }
    bloom = {
        r["doc_id"]: (r["n_bloom_shingles"], r["n_true_shingles"])
        for r in sketches.decontaminate_bloom(geo).collect()
    }
    for doc_id, n_eval in exact.items():
        assert doc_id in bloom, f"bloom missed leaking doc {doc_id}"
        n_bloom, n_true = bloom[doc_id]
        assert n_true == n_eval, (doc_id, n_true, n_eval)
        assert n_bloom >= n_true
    # false-positive fringe exists but must be a fringe, not the corpus
    fp_docs = [d for d, (_, t) in bloom.items() if t == 0 and d not in exact]
    n_train = geo.sql(
        "SELECT COUNT(*) c FROM documents"
    ).collect()[0]["c"]
    assert len(fp_docs) < n_train  # sanity: prefilter prunes something


def test_sketch_plan_shapes(geo):
    # KMV rank filter must get the map-side group limit (bounded state
    # per group however many distinct users a partition holds)
    plan = (
        sketches.kmv_distinct_users(geo)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
    # the bloom membership probe must broadcast the word table — the
    # corpus side is never shuffled on widx
    bplan = (
        sketches.decontaminate_bloom(geo)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in bplan
    # CMS probe joins the fixed d*w grid broadcast-side as well
    cplan = (
        sketches.cms_heavy_hitters(geo)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in cplan


def test_quantile_sketch_invariants(geo):
    rows = sketches.quantile_sketch_values(geo).collect()
    assert rows
    k = sketches.QSK_K
    for r in rows:
        assert r["n_sample"] == min(k, r["n_rows"])
        # quantile estimates are monotone in q
        assert r["est_p50"] <= r["est_p90"] <= r["est_p99"]
        assert r["exact_p50"] <= r["exact_p90"] <= r["exact_p99"]
        if r["n_rows"] <= k:
            # full group sampled: the sketch IS exact
            for q in (50, 90, 99):
                assert r[f"est_p{q}"] == r[f"exact_p{q}"]
        else:
            # sample-quantile error ~ value-spread * O(1/sqrt(k))
            spread = r["exact_p99"] - r["exact_p50"] or 1.0
            for q in (50, 90):
                assert abs(r[f"est_p{q}"] - r[f"exact_p{q}"]) < 0.5 * spread


def test_bm25_matches_numpy_recomputation(geo):
    import math as m

    from geospatial_store_siting_spark.operators import retrieval

    out = retrieval.bm25_topk(geo).collect()
    assert 0 < len(out) <= retrieval.TOPK
    scores = [r["score_micros"] for r in out]
    assert scores == sorted(scores, reverse=True)

    # exact recomputation from raw token streams in plain Python
    docs = geo.table("documents").select("doc_id", "text").collect()
    toks = {
        r["doc_id"]: r["text"].split(" ")[: retrieval.TOKEN_CAP] for r in docs
    }
    dl = {d: len(t) for d, t in toks.items()}
    n = len(dl)
    avgdl = sum(dl.values()) / n
    k1, b = 1.2, 0.75
    tf = {
        (d, term): t.count(term)
        for d, t in toks.items()
        for term in retrieval.QUERY_TERMS
        if term in t
    }
    df = {
        term: sum(1 for (d2, t2) in tf if t2 == term)
        for term in retrieval.QUERY_TERMS
    }
    idf_m = {
        term: m.floor(
            m.log(1.0 + (n - c + 0.5) / (c + 0.5)) * 1e6 + 0.5
        )
        for term, c in df.items()
        if c
    }
    expect = {}
    for (d, term), c in tf.items():
        s = (
            (idf_m[term] / 1e6)
            * (c * (k1 + 1.0))
            / (c + k1 * (1.0 - b + b * (dl[d] / avgdl)))
        )
        expect[d] = expect.get(d, 0) + m.floor(s * 1e6 + 0.5)
    top = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[: retrieval.TOPK]
    got = [(r["doc_id"], r["score_micros"]) for r in out]
    assert got == top


def test_retrieval_and_quantile_plan_shapes(geo):
    from geospatial_store_siting_spark.operators import retrieval

    qplan = (
        sketches.quantile_sketch_values(geo)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in qplan  # bottom-k sample never full-sorts
    bplan = (
        retrieval.bm25_topk(geo)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # top-k is per-partition heaps + k-row merge, not a global sort
    assert "TakeOrderedAndProject" in bplan
