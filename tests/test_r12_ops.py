"""Law tests for the round-12 operators (each also oracle-paired and swept
by test_oracle_parity): SemDeDup cluster-scoped semantic dedup, URL
canonicalization + host dedup, incremental PQ code-table ingest."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.sources.registry import load_table


def test_semdedup_accounting_and_keep_rule(spark, sf_dir):
    """Counts partition the corpus; removals never exceed members; the
    perturbed near-dup copies guarantee the fixture has work to do; and the
    keep rule holds on a direct recomputation — a removed vector always has
    an over-threshold neighbor in its cluster that is (strictly) less
    centroid-similar, or equally similar with a smaller id."""
    from cdc_postgresql_clickhouse_spark.queries.similarity import (
        DERIVED_OFFSET,
        N_CENTROIDS,
        NEARDUP_IDS,
        SEMDEDUP_TAU,
        QUERIES as SQ,
    )

    rows = SQ["semantic_dedup_semdedup"](spark, sf_dir).collect()
    assert rows and len(rows) <= N_CENTROIDS
    n_emb = load_table(spark, sf_dir, "embeddings").count()
    n_corpus = n_emb + min(n_emb, NEARDUP_IDS)
    assert sum(r["n_members"] for r in rows) == n_corpus
    for r in rows:
        assert 0 <= r["n_removed"] <= r["n_members"]
        assert r["n_kept"] + r["n_removed"] == r["n_members"]
        assert r["n_removed"] <= r["n_pairs"] or r["n_pairs"] == 0
    # the derived affine copies sit at cos >= 0.996 with their originals:
    # the fixture MUST produce duplicate pairs and removals somewhere
    assert sum(r["n_pairs"] for r in rows) >= 1
    assert sum(r["n_removed"] for r in rows) >= 1

    # direct Python recomputation of assignment + keep rule
    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    corpus = dict(emb)
    for vid in list(emb):
        if vid < NEARDUP_IDS:
            corpus[vid + DERIVED_OFFSET] = [x * 0.9 + 0.01 for x in emb[vid]]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        raw = d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )
        return math.floor(raw * 1e6) / 1e6

    cents = {cid: emb[cid] for cid in range(N_CENTROIDS) if cid in emb}
    assign, cen_cos = {}, {}
    for vid, e in corpus.items():
        best = max(cents, key=lambda c: (cos(e, cents[c]), -c))
        assign[vid] = best
        cen_cos[vid] = cos(e, cents[best])
    removed = set()
    members_by_cid = {}
    for vid, cid in assign.items():
        members_by_cid.setdefault(cid, []).append(vid)
    n_pairs_by_cid = {}
    for cid, vids in members_by_cid.items():
        vids.sort()
        np = 0
        for i, a in enumerate(vids):
            for b in vids[i + 1 :]:
                if cos(corpus[a], corpus[b]) >= SEMDEDUP_TAU:
                    np += 1
                    removed.add(a if cen_cos[a] > cen_cos[b] else b)
        n_pairs_by_cid[cid] = np
    got = {r["cid"]: r for r in rows}
    for cid, vids in members_by_cid.items():
        assert got[cid]["n_members"] == len(vids)
        assert got[cid]["n_pairs"] == n_pairs_by_cid[cid]
        assert got[cid]["n_removed"] == sum(1 for v in removed if assign[v] == cid)


def test_url_canonical_rules_and_coverage(spark, sf_dir):
    """Every document contributes exactly one URL; hosts are lowercase with
    no www./port residue; canonical count never exceeds raw count; the
    variant synthesis guarantees real collapses; and a spot recomputation
    of the canonicalizer in Python agrees."""
    from cdc_postgresql_clickhouse_spark.queries.dedup import QUERIES as DQ

    rows = DQ["dedup_url_canonical"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    assert sum(r["n_urls"] for r in rows) == n_docs
    for r in rows:
        assert r["host"] == r["host"].lower()
        assert not r["host"].startswith("www.")
        assert ":" not in r["host"]
        assert r["host"].endswith(".example.com")
        assert 1 <= r["n_canonical"] <= r["n_urls"]
        assert r["n_dup_urls"] == r["n_urls"] - r["n_canonical"]
        assert 0 <= r["dup_ppm"] <= 1_000_000
    # case/www/port/utm variants collapse: dupes must exist somewhere
    assert sum(r["n_dup_urls"] for r in rows) >= 1

    # Python twin: the canonical form is fully determined by
    # (doc_id % 4 scheme, source host, doc_id % 40 path, doc_id % 8 == 2
    # id param) — every other synthesized variant (case, www, default
    # port, trailing slash, utm params, fragment) must cancel
    def canon(doc_id, source):
        scheme = ["https", "https", "http", "http"][doc_id % 4]
        q = f"?id={doc_id % 40}" if doc_id % 8 == 2 else ""
        return f"{scheme}://{source}.example.com/p/{doc_id % 40}{q}"

    expected: dict[str, set] = {}
    counts: dict[str, int] = {}
    for r in docs.select("doc_id", "source").collect():
        host = r.source + ".example.com"
        expected.setdefault(host, set()).add(canon(r.doc_id, r.source))
        counts[host] = counts.get(host, 0) + 1
    got = {r["host"]: r for r in rows}
    assert set(got) == set(expected)
    for host, canons in expected.items():
        assert got[host]["n_canonical"] == len(canons)
        assert got[host]["n_urls"] == counts[host]


def test_streaming_pq_ingest_matches_batch(spark, sf_dir):
    """The incrementally-built code table scores IDENTICALLY to the batch
    ann_pq_topk (same codebook seed, same encode, same rank) — row-for-row."""
    from cdc_postgresql_clickhouse_spark.queries.similarity import QUERIES as SQ
    from cdc_postgresql_clickhouse_spark.queries.streaming_queries import (
        QUERIES as STQ,
    )

    batch = {
        (r.q_id, r.rank): (r.neighbor_id, r.approx_cos)
        for r in SQ["ann_pq_topk"](spark, sf_dir).collect()
    }
    stream = {
        (r.q_id, r.rank): (r.neighbor_id, r.approx_cos)
        for r in STQ["streaming_pq_ingest_equiv"](spark, sf_dir).collect()
    }
    assert batch and batch == stream


def test_pq_ingest_replay_idempotent(spark, sf_dir, tmp_path):
    """At-least-once replay: ingesting the same batch twice appends
    duplicate code rows, and the reader's distinct() absorbs them — the
    same contract as the IVF assignment table."""
    from cdc_postgresql_clickhouse_spark.queries.similarity import _emb_d
    from cdc_postgresql_clickhouse_spark.streaming.ann import ingest_batch_pq

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    code_path = str(tmp_path / "codes")
    ingest_batch_pq(spark, emb, code_path)
    once = spark.read.parquet(code_path).select("vec_id", "codes").distinct().count()
    ingest_batch_pq(spark, emb, code_path)
    raw = spark.read.parquet(code_path).count()
    deduped = spark.read.parquet(code_path).select("vec_id", "codes").distinct().count()
    assert raw == 2 * once
    assert deduped == once


def test_semdedup_tau_sweep_monotone_and_consistent(spark, sf_dir):
    """Pairs and removals are non-increasing in tau; the grid row at the
    registered SEMDEDUP_TAU agrees exactly with the per-cluster report's
    totals."""
    from cdc_postgresql_clickhouse_spark.queries.similarity import (
        SEMDEDUP_TAU,
        SEMDEDUP_TAUS_PPM,
        QUERIES as SQ,
    )

    rows = {r["tau_ppm"]: r for r in SQ["semantic_dedup_tau_sweep"](spark, sf_dir).collect()}
    assert set(rows) == set(SEMDEDUP_TAUS_PPM)
    taus = sorted(SEMDEDUP_TAUS_PPM)
    for lo, hi in zip(taus, taus[1:]):
        assert rows[lo]["n_pairs"] >= rows[hi]["n_pairs"]
        assert rows[lo]["n_removed"] >= rows[hi]["n_removed"]
    for r in rows.values():
        assert 0 <= r["removed_ppm"] <= 1_000_000
        assert r["n_removed"] <= r["n_pairs"] or r["n_pairs"] == 0
    report = SQ["semantic_dedup_semdedup"](spark, sf_dir).collect()
    tau_ppm = int(round(SEMDEDUP_TAU * 1_000_000))
    assert rows[tau_ppm]["n_removed"] == sum(r["n_removed"] for r in report)
    assert rows[tau_ppm]["n_pairs"] == sum(r["n_pairs"] for r in report)
    assert rows[tau_ppm]["n_corpus"] == sum(r["n_members"] for r in report)


def test_pq_distortion_matches_bruteforce(spark, sf_dir):
    """Exact Python recomputation of the per-subspace encoding distortion
    and energy (same seed codebook, same argmin, same per-vector floors)."""
    from cdc_postgresql_clickhouse_spark.queries.similarity import (
        PQ_K,
        PQ_M,
        PQ_SUBDIM,
        QUERIES as SQ,
    )

    rows = {r["subspace"]: r for r in
            SQ["embedding_pq_distortion_report"](spark, sf_dir).collect()}
    assert set(rows) == set(range(PQ_M))
    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    cb = {
        m: [emb[c][m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM] for c in range(PQ_K)]
        for m in range(PQ_M)
    }
    want = {m: [0, 0] for m in range(PQ_M)}
    for v in emb.values():
        for m in range(PQ_M):
            sub = v[m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]
            dmin = min(
                sum((x - y) * (x - y) for x, y in zip(sub, cw)) for cw in cb[m]
            )
            en = sum(x * x for x in sub)
            want[m][0] += math.floor(dmin * 1e6)
            want[m][1] += math.floor(en * 1e6)
    for m in range(PQ_M):
        r = rows[m]
        assert r["n_vectors"] == len(emb)
        assert r["sum_dist_micro"] == want[m][0]
        assert r["sum_energy_micro"] == want[m][1]
        assert r["distortion_ppm"] == (
            want[m][0] * 1_000_000 // want[m][1] if want[m][1] > 0 else None
        )


def test_ab_sequential_peeks_bruteforce_twin(spark, sf_dir):
    """Exact Python twin: same md5 arm draw, same integer peek grid, same
    moment sums and float ordering for the Welch z — plus the structural
    laws (cumulative counts are monotone in the peek index; the final
    peek covers every event)."""
    import hashlib

    from cdc_postgresql_clickhouse_spark.queries.events import (
        AB_PEEK_BOUNDARY_MILLI,
        AB_PEEKS_K,
        QUERIES as EQ,
    )

    rows = {r["peek"]: r for r in
            EQ["events_ab_sequential_peeks"](spark, sf_dir).collect()}
    assert set(rows) == set(range(1, AB_PEEKS_K + 1))
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("unix_micros(ts)").alias("ts_us"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    ).collect()
    data = []
    for r in ev:
        h = hashlib.md5(str(r.user_id).encode()).hexdigest()
        arm = ("0123456789abcdef".index(h[0])) % 2
        data.append((arm, r.ts_us, r.c))
    lo = min(t for _, t, _ in data)
    hi = max(t for _, t, _ in data)
    n_total = len(data)
    covered = 0
    prev = (0, 0)
    for k in range(1, AB_PEEKS_K + 1):
        peek = lo + (hi - lo) * k // AB_PEEKS_K
        cur = [(a, c) for a, t, c in data if t <= peek]
        na = sum(1 for a, _ in cur if a == 0)
        nb = sum(1 for a, _ in cur if a == 1)
        sa = sum(c for a, c in cur if a == 0)
        sb = sum(c for a, c in cur if a == 1)
        sa2 = sum(c * c for a, c in cur if a == 0)
        sb2 = sum(c * c for a, c in cur if a == 1)
        r = rows[k]
        assert (r["na"], r["nb"]) == (na, nb)
        assert (na + nb) >= sum(prev)
        prev = (na, nb)
        covered = na + nb
        if na > 0 and nb > 0:
            diff = sb / nb - sa / na
            assert r["diff_micro"] == math.floor(diff * 1e6)
            if na >= 2 and nb >= 2:
                var_a = (na * sa2 - sa * sa) / (na * (na - 1))
                var_b = (nb * sb2 - sb * sb) / (nb * (nb - 1))
                se = math.sqrt(var_a / na + var_b / nb)
                if se > 0:
                    z = math.floor(diff / se * 1000.0)
                    assert r["z_milli"] == z
                    assert r["significant"] == (
                        1 if abs(z) >= AB_PEEK_BOUNDARY_MILLI else 0
                    )
    assert covered == n_total  # the final peek is the full window


def test_krippendorff_alpha_bruteforce_twin(spark, sf_dir):
    """Exact Python twin from the raw three-rater predictions; alpha <= 1e6
    ppm and the integer internals match the Fleiss row's (same folds)."""
    from cdc_postgresql_clickhouse_spark.queries.quality import QUERIES as QQ
    from cdc_postgresql_clickhouse_spark.queries.text_ext import langid_predictions

    row = QQ["quality_langid_krippendorff_alpha"](spark, sf_dir).collect()[0]
    preds = langid_predictions(spark, sf_dir).collect()
    n_items = len(preds)
    s_sum, counts = 0, {}
    for r in preds:
        cats = [r.lang, r.marker_guess, r.trigram_guess]
        per = {}
        for c in cats:
            per[c] = per.get(c, 0) + 1
            counts[c] = counts.get(c, 0) + 1
        s_sum += sum(v * v for v in per.values())
    c2_sum = sum(v * v for v in counts.values())
    assert (row["n_items"], row["s_sum"], row["c2_sum"]) == (n_items, s_sum, c2_sum)
    b = 2 * (9 * n_items * n_items - c2_sum)
    a = (3 * n_items - 1) * (9 * n_items - s_sum)
    want = (b - a) * 1_000_000 // b if (b - a) >= 0 else -((-(b - a) * 1_000_000) // b)
    assert row["alpha_ppm"] == want
    assert row["alpha_ppm"] <= 1_000_000
    fl = QQ["quality_langid_fleiss_kappa"](spark, sf_dir).collect()[0]
    assert (fl["s_sum"], fl["c2_sum"]) == (s_sum, c2_sum)


def test_semdedup_label_bias_accounting(spark, sf_dir):
    """Label rollup partitions the dedup corpus; removal totals agree with
    the per-cluster report; rates bounded."""
    from cdc_postgresql_clickhouse_spark.queries.similarity import (
        NEARDUP_IDS,
        QUERIES as SQ,
    )

    rows = SQ["semantic_dedup_label_bias"](spark, sf_dir).collect()
    n_emb = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_members"] for r in rows) == n_emb + min(n_emb, NEARDUP_IDS)
    report = SQ["semantic_dedup_semdedup"](spark, sf_dir).collect()
    assert sum(r["n_removed"] for r in rows) == sum(r["n_removed"] for r in report)
    for r in rows:
        assert 0 <= r["n_removed"] <= r["n_members"]
        assert 0 <= r["removed_ppm"] <= 1_000_000
        assert r["removed_ppm"] == r["n_removed"] * 1_000_000 // r["n_members"]
