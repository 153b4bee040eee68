"""Wave-11 dedup-tuning curves: threshold sweep vs a brute-force
Python sweep, LSH band curve vs a Python minhash replay plus the
band-refinement containment law."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_threshold_curve_brute_force_and_monotone(spark):
    import __spark_entry__ as entry
    from sparkbigdatatextanalysis_spark.operators import dedup as dd

    got = {
        round(r["threshold"], 2): r
        for r in entry.q_dedup_threshold_curve(spark, SF).collect()
    }
    pairs = dd.ngram_jaccard_pairs(
        entry._docs(spark, SF), min_jaccard=0.0
    ).collect()
    for t in entry._DEDUP_CURVE_THRESHOLDS:
        surv = [p for p in pairs if p["jaccard"] >= t]
        docs = {p["a_id"] for p in surv} | {p["b_id"] for p in surv}
        g = got[round(t, 2)]
        assert g["n_pairs"] == len(surv)
        assert g["n_docs_in_pairs"] == len(docs)
    ts = sorted(got)
    for a, b in zip(ts, ts[1:]):
        assert got[b]["n_pairs"] <= got[a]["n_pairs"]
        assert got[b]["n_docs_in_pairs"] <= got[a]["n_docs_in_pairs"]


def test_lsh_band_curve_matches_python_minhash(spark):
    import __spark_entry__ as entry
    from sparkbigdatatextanalysis_spark.operators import dedup as dd

    got = {
        r["n_bands"]: r
        for r in entry.q_dedup_lsh_band_curve(spark, SF).collect()
    }
    # Python replay: same shingle hashes, same LCG params
    sh = dd.shingle_hashes(entry._docs(spark, SF)).collect()
    by_doc: dict = {}
    for r in sh:
        by_doc.setdefault(r["id"], set()).add(r["sh"])
    from sparkbigdatatextanalysis_spark.functions.hashing import MERSENNE31

    sigs = {
        d: [
            min((a * x + b) % MERSENNE31 for x in hs)
            for _, a, b in dd.MINHASH_PARAMS
        ]
        for d, hs in by_doc.items()
    }
    truth = {}
    docs = sorted(by_doc)
    for i, a in enumerate(docs):
        for b in docs[i + 1 :]:
            inter = len(by_doc[a] & by_doc[b])
            if inter:
                truth[(a, b)] = inter / (
                    len(by_doc[a]) + len(by_doc[b]) - inter
                )
    nt = sum(1 for j in truth.values() if j >= entry._LSH_CURVE_TRUE_J)
    prev_cand: set = set()
    for nb in entry._LSH_CURVE_BANDS:
        r = dd.MINHASH_K // nb
        buckets: dict = {}
        for d, s in sigs.items():
            for band in range(nb):
                key = (band, tuple(s[band * r : (band + 1) * r]))
                buckets.setdefault(key, []).append(d)
        cand = set()
        for members in buckets.values():
            ms = sorted(members)
            for i, a in enumerate(ms):
                for b in ms[i + 1 :]:
                    cand.add((a, b))
        g = got[nb]
        assert g["n_candidates"] == len(cand)
        n_true = sum(
            1
            for p in cand
            if truth.get(p, 0.0) >= entry._LSH_CURVE_TRUE_J
        )
        assert g["n_true_captured"] == n_true
        assert abs(g["recall"] - (n_true / nt if nt else 0.0)) < 1e-9
        assert 0.0 <= g["precision"] <= 1.0
        # refinement containment: splitting bands only ADDS candidates
        assert prev_cand <= cand
        prev_cand = cand
    # the curve must actually move: 16 bands catch at least as many
    # candidates as 2 bands, strictly more unless the corpus is trivial
    assert got[16]["n_candidates"] >= got[2]["n_candidates"]
