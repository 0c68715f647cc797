"""Law tests for the round-13 operators and ADVICE-r12 hardening: the
Lloyd-quantizer SemDeDup variant (each also oracle-paired and swept by
test_oracle_parity), the 128-bit Krippendorff lanes, the anchored URL
canonicalization regexes, and the staged-batch mtime backdate."""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.sources.registry import load_table


def test_lloyd_refine_matches_python_twin(spark, sf_dir):
    """The distributed Lloyd loop equals a sequential Python twin of its
    documented math (centroid-first raw-cosine argmax with smaller-cid
    tie-break, per-dim mean FLOOR-truncated to 9 dp, empty clusters retain
    their centroid) — the same unrolled formulation the
    semantic_dedup_semdedup_kmeans oracle runs in SQL."""
    from cdc_postgresql_clickhouse_spark.operators.kmeans import lloyd_refine
    from cdc_postgresql_clickhouse_spark.queries.similarity import (
        N_CENTROIDS,
        _emb_d,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", _emb_d().alias("e"))
    model = lloyd_refine(emb, k=N_CENTROIDS, iters=2)

    vecs = {r.vec_id: [float(x) for x in r.e] for r in emb.collect()}
    cents = [vecs[i] for i in range(N_CENTROIDS)]

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    for _ in range(2):
        norms = [math.sqrt(dot(c, c)) or 1.0 for c in cents]
        sums = [[0.0] * len(cents[0]) for _ in cents]
        counts = [0] * len(cents)
        for v in vecs.values():
            vn = math.sqrt(dot(v, v))
            best, best_s = 0, -2.0
            for i, c in enumerate(cents):
                s = dot(c, v) / (norms[i] * vn)
                if s > best_s:
                    best, best_s = i, s
            counts[best] += 1
            for j, x in enumerate(v):
                sums[best][j] += x
        new = [list(c) for c in cents]
        for i in range(len(cents)):
            if counts[i]:
                new[i] = [
                    math.floor(sums[i][j] / counts[i] * 1e9) / 1e9
                    for j in range(len(cents[0]))
                ]
        cents = new
    assert model == cents


def test_semdedup_kmeans_accounting_vs_seed(spark, sf_dir):
    """The Lloyd-quantizer report obeys the same accounting laws as the
    seed-convention one over the identical corpus (counts partition the
    corpus, kept+removed=members), and the refined quantizer does not
    increase quantization error over the corpus — the property Lloyd
    exists to deliver. The removal rates of the two quantizers are the
    cluster-balance-sensitivity comparison VERDICT r12 asked for; they
    need not match, but both must find the planted near-dup mass."""
    from cdc_postgresql_clickhouse_spark.operators.kmeans import (
        lloyd_refine,
        quantization_error,
    )
    from cdc_postgresql_clickhouse_spark.queries.similarity import (
        DERIVED_OFFSET,
        N_CENTROIDS,
        NEARDUP_IDS,
        SEMDEDUP_KMEANS_ITERS,
        QUERIES as SQ,
        _emb_d,
    )

    seed_rows = SQ["semantic_dedup_semdedup"](spark, sf_dir).collect()
    km_rows = SQ["semantic_dedup_semdedup_kmeans"](spark, sf_dir).collect()
    assert km_rows and len(km_rows) <= N_CENTROIDS
    assert sum(r["n_members"] for r in km_rows) == sum(
        r["n_members"] for r in seed_rows
    )
    for r in km_rows:
        assert 0 <= r["n_removed"] <= r["n_members"]
        assert r["n_kept"] + r["n_removed"] == r["n_members"]
    # both quantizers must surface the planted affine near-dups
    assert sum(r["n_removed"] for r in km_rows) >= 1
    assert sum(r["n_removed"] for r in seed_rows) >= 1

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", _emb_d().alias("e"))
    derived = emb.filter(F.col("vec_id") < NEARDUP_IDS).select(
        (F.col("vec_id") + DERIVED_OFFSET).alias("vec_id"),
        F.transform(F.col("e"), lambda x: x * 0.9 + 0.01).alias("e"),
    )
    corpus = emb.unionByName(derived)
    seed_model = lloyd_refine(corpus, k=N_CENTROIDS, iters=0)
    km_model = lloyd_refine(corpus, k=N_CENTROIDS, iters=SEMDEDUP_KMEANS_ITERS)
    e_seed = quantization_error(corpus, seed_model)
    e_km = quantization_error(corpus, km_model)
    assert e_km <= e_seed + 1e-12, (e_seed, e_km)


def test_krippendorff_alpha_128bit_lanes(spark):
    """The registered alpha expression survives the overflow regime: at
    n_items ~ 2e6 the 64-bit numerator (B-A)*1e6 ~ 7e19 wraps BIGINT, so
    the DECIMAL(38,0) lanes must reproduce exact integer arithmetic
    (ADVICE r12). Exercised on the exact module-level expression the query
    selects, against a Python big-int twin."""
    from cdc_postgresql_clickhouse_spark.queries.quality import (
        _KRIPPENDORFF_ALPHA_EXPR,
    )

    cases = [
        # (n_items, s_sum, c2_sum): perfect agreement (s_i = 9 every item),
        # heavy-disagreement mix, and a mid case — all far past 64-bit
        (2_000_000, 18_000_000, 12_000_000_000_000),
        (2_000_000, 10_000_000, 6_000_000_000_000),
        (5_000_000, 25_000_000, 30_000_000_000_000),
    ]
    df = spark.createDataFrame(cases, "n_items long, s_sum long, c2_sum long")
    got = {
        (r["n_items"], r["s_sum"], r["c2_sum"]): r["alpha_ppm"]
        for r in df.select(
            "n_items", "s_sum", "c2_sum",
            F.expr(_KRIPPENDORFF_ALPHA_EXPR).cast("long").alias("alpha_ppm"),
        ).collect()
    }
    for n, s, c2 in cases:
        b = 2 * (9 * n * n - c2)
        a = (3 * n - 1) * (9 * n - s)
        q = (b - a) * 1_000_000
        # Python // floors toward -inf; SQL DIV truncates toward zero
        want = (q // b if q >= 0 else -((-q) // b)) if b > 0 else None
        assert got[(n, s, c2)] == want, (n, s, c2, got[(n, s, c2)], want)


def test_url_canonical_anchored_regexes_cross_engine(spark):
    """Adversarial real-world URLs — suffixed params that MUST survive,
    repeated/chained utm params, utm in the middle and at the end — run
    through BOTH engines' canonicalization chains; Spark and DuckDB must
    agree exactly, and xutm_source must never be stripped (ADVICE r12)."""
    import duckdb

    from cdc_postgresql_clickhouse_spark.queries.dedup import (
        SQL_URL_CANON_HOST,
        SQL_URL_CANON_REST,
        url_canonical_cols,
    )

    urls = [
        "https://a.example.com/p/1?xutm_source=keepme",
        "https://a.example.com/p/1?utm_source=a&xutm_source=keepme",
        "http://a.example.com/p/2?utm_source=a&id=1&utm_source=b",
        "http://a.example.com/p/2?id=1&utm_campaign=c&utm_source=d",
        "https://WWW.A.example.com:443/p/3/?utm_source=x#frag",
        "http://a.example.com:80/p/4?utm_campaign=only",
        "https://a.example.com/p/5?utm_source=a&utm_campaign=b&utm_source=c&utm_campaign=d",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    host, canonical = url_canonical_cols(F.col("url"))
    got_spark = [
        (r["h"], r["c"])
        for r in df.select(host.alias("h"), canonical.alias("c")).collect()
    ]

    con = duckdb.connect()
    got_duck = []
    for u in urls:
        h, c = con.execute(
            f"""SELECT {SQL_URL_CANON_HOST.format(u="url")} AS h,
                       lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) || '://'
                       || {SQL_URL_CANON_HOST.format(u="url")}
                       || {SQL_URL_CANON_REST.format(u="url")} AS c
                FROM (SELECT ? AS url)""",
            [u],
        ).fetchone()
        got_duck.append((h, c))
    assert got_spark == got_duck, list(zip(urls, got_spark, got_duck))
    for u, (_h, c) in zip(urls, got_spark):
        if "xutm_source=keepme" in u:
            assert "xutm_source=keepme" in c, (u, c)
        assert "utm_campaign=only" not in c
    # the straightforward cases canonicalize fully
    assert got_spark[0][1] == "https://a.example.com/p/1?xutm_source=keepme"
    assert got_spark[4][1] == "https://a.example.com/p/3"
    assert got_spark[5][1] == "http://a.example.com/p/4"


def test_backdate_batch_orders_staged_files(tmp_path):
    """_backdate_batch pushes batch-1 files strictly earlier than batch-2's
    even when the filesystem's mtime granularity made the writes tie — the
    file-stream source's mtime ordering then delivers batch 1 first
    (ADVICE r12)."""
    from cdc_postgresql_clickhouse_spark.queries.streaming_queries import (
        _backdate_batch,
    )

    b1 = tmp_path / "part-b1.parquet"
    b2 = tmp_path / "part-b2.parquet"
    b1.write_bytes(b"1")
    b2.write_bytes(b"2")
    t = os.stat(b2).st_mtime
    os.utime(b1, (t, t))  # force the tie
    _backdate_batch([str(b1)])
    assert os.stat(b1).st_mtime < os.stat(b2).st_mtime - 5


def test_semdedup_ingest_replay_idempotent(spark, sf_dir, tmp_path):
    """At-least-once contract: replaying an already-ingested batch through
    ingest_batch_semdedup re-appends members and pairs, and the read-side
    distinct() restores the exact state — same report either way."""
    from cdc_postgresql_clickhouse_spark.queries.similarity import (
        N_CENTROIDS,
        _emb_d,
    )
    from cdc_postgresql_clickhouse_spark.streaming.ann import (
        ingest_batch_semdedup,
        read_semdedup_state,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", _emb_d().alias("e"))
    b1 = emb.filter((F.col("vec_id") < N_CENTROIDS) | (F.col("vec_id") % 2 == 0))
    b2 = emb.filter((F.col("vec_id") >= N_CENTROIDS) & (F.col("vec_id") % 2 == 1))
    state = str(tmp_path / "state")

    def snapshot():
        members, pairs = read_semdedup_state(spark, state)
        return (
            sorted((r.vec_id, r.cid) for r in members.select("vec_id", "cid").collect()),
            sorted((r.va, r.vb) for r in pairs.select("va", "vb").collect()),
        )

    ingest_batch_semdedup(spark, b1, state)
    ingest_batch_semdedup(spark, b2, state)
    before = snapshot()
    ingest_batch_semdedup(spark, b2, state)  # replay
    after = snapshot()
    assert before == after
    assert len(before[0]) == emb.count()


def test_cluster_profile_consistency_with_report(spark, sf_dir):
    """The cohesion profile and the removal report read the same memo: the
    profile's member counts match the report's, its pair counts bound the
    report's tau-filtered pair counts from above (profile counts at the
    grid-minimum tau), and median <= max on every row with pairs."""
    from cdc_postgresql_clickhouse_spark.queries.similarity import QUERIES as SQ

    prof = {r["cid"]: r for r in SQ["semantic_dedup_cluster_profile"](spark, sf_dir).collect()}
    rep = {r["cid"]: r for r in SQ["semantic_dedup_semdedup"](spark, sf_dir).collect()}
    assert set(prof) == set(rep)
    for cid, p in prof.items():
        assert p["n_members"] == rep[cid]["n_members"]
        assert p["n_pairs"] >= rep[cid]["n_pairs"]  # base tau <= report tau
        if p["n_pairs"]:
            assert p["p50_sim_micro"] <= p["max_sim_micro"]
            assert p["max_sim_micro"] <= 1_000_000
        else:
            assert p["p50_sim_micro"] is None and p["max_sim_micro"] is None


def test_k_sensitivity_laws(spark, sf_dir):
    """Grid accounting: the sized-K row equals the committed removal report
    (same quantizer, same tau — the K-grid search must reproduce the
    single-K search at K = N_CENTROIDS), max occupancy shrinks weakly as K
    grows, and every row's removals are bounded by its pairs' vector count.
    Also pins the partial-distance prefilter as conservative: the K=16 pair
    count after prefilter + exact cosine matches the unprefiltered base."""
    from cdc_postgresql_clickhouse_spark.queries.similarity import (
        N_CENTROIDS,
        SEMDEDUP_TAU,
        QUERIES as SQ,
        semdedup_base,
    )

    rows = {r["k"]: r for r in SQ["semantic_dedup_k_sensitivity"](spark, sf_dir).collect()}
    rep = SQ["semantic_dedup_semdedup"](spark, sf_dir).collect()
    assert rows[N_CENTROIDS]["n_pairs"] == sum(r["n_pairs"] for r in rep)
    assert rows[N_CENTROIDS]["n_removed"] == sum(r["n_removed"] for r in rep)
    ks = sorted(rows)
    for k_small, k_big in zip(ks, ks[1:]):
        assert rows[k_small]["max_cluster_members"] >= rows[k_big]["max_cluster_members"]
    for r in rows.values():
        assert r["n_removed"] <= 2 * r["n_pairs"] or r["n_pairs"] == 0
        assert 0 <= r["removed_ppm"] <= 1_000_000
    # prefilter conservativeness, directly: the prefiltered K=16 search
    # found exactly the unprefiltered memo base's over-threshold pairs
    _members, pairs = semdedup_base(spark, sf_dir)
    n_base = pairs.filter(F.col("cos_sim") >= SEMDEDUP_TAU).count()
    assert rows[N_CENTROIDS]["n_pairs"] == n_base
