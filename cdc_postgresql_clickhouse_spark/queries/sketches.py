"""Order-statistics distinct sketch: KMV (k minimum values, Bar-Yossef et
al. 2002 / Beyer et al. SIGMOD'07) per event type — the mergeable
distinct-count estimator behind theta sketches, complementing the
hash-threshold sampler in ``queries/events.py``.

Why KMV here: like the threshold sketch it is a pure function of the id SET
(not of partitioning or merge order), so the DuckDB twin is exact and the
driver hash-verifies an approximate operator end-to-end. Unlike the
threshold sketch, its memory is a FIXED k hashes per group regardless of
corpus size — the property that makes it a sketch: at 100 TB the per-group
state that crosses the shuffle is k rows, and two KMV states merge by
keeping the k smallest of the union (how a map-side partial would combine).

Estimator: with U(0,1)-uniform hashes, E[distinct] = (k-1)/h_(k) where
h_(k) is the k-th smallest hash. Hashes are the first 12 hex digits of
md5(user_id) normalized by 16^12 — engine-identical strings, integer
decode via the shared nibble fold, one double division at the end. Groups
with fewer than k distinct hashes report their exact count (standard
small-cardinality fallback).

Scale shape: one distinct shuffle on (event_type, hash) — at extreme
volume insert a per-partition top-k combine first (sort_array(slice) over
collect_set per partition) to cap shuffle volume at k per partition-group;
then one k-row window per group. No data-size-proportional state anywhere
past the distinct.

Reference tie-in: ClickHouse ``uniq``/``uniqTheta`` family
(`/root/reference/README.md` verification queries use exact count); survey
§2.13 extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.sources.registry import load_table
from cdc_postgresql_clickhouse_spark.queries._pending import flip_pending

KMV_K = 64
_HEX_DIGITS = 12
_NORM = float(16 ** _HEX_DIGITS)


def sketch_kmv_distinct(spark: SparkSession, sf_dir: str, k: int = KMV_K) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hashed = ev.select(
        "event_type", F.substring(F.md5(F.col("user_id").cast("string")), 1, _HEX_DIGITS).alias("h")
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    ranked = hashed.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    per = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_tracked"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("hk"),
    )
    # conv(hex, 16, 10) on 12 hex digits fits a signed long exactly (2^48)
    vk = F.conv(F.col("hk"), 16, 10).cast("long") / F.lit(_NORM)
    est = F.when(F.col("n_tracked") < k, F.col("n_tracked").cast("double")).otherwise(
        F.lit(float(k - 1)) / vk
    )
    return per.select(
        "event_type",
        "n_tracked",
        (F.floor(est * F.lit(1000000.0)).cast("double") / F.lit(1000000.0)).alias("kmv_estimate"),
    )


# integer value of the first 12 md5 hex digits via an explicit nibble chain
# (DuckDB has no base-16 conv); identical to Spark's conv(h, 16, 10)
_SQL_HEX12 = "(" + " + ".join(
    f"(instr('0123456789abcdef', substring(h, {i + 1}, 1)) - 1) * {16 ** (_HEX_DIGITS - 1 - i)}"
    for i in range(_HEX_DIGITS)
) + ")"

_SQL_KMV = f"""
WITH hashed AS (
  SELECT DISTINCT event_type,
         substring(md5(CAST(user_id AS VARCHAR)), 1, {_HEX_DIGITS}) AS h
  FROM events
),
ranked AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM hashed
  QUALIFY rn <= {KMV_K}
),
per AS (
  SELECT event_type,
         COUNT(*) AS n_tracked,
         MAX(CASE WHEN rn = {KMV_K} THEN h END) AS h
  FROM ranked GROUP BY event_type
)
SELECT event_type,
       n_tracked,
       CAST(FLOOR(
         (CASE WHEN n_tracked < {KMV_K}
               THEN CAST(n_tracked AS DOUBLE)
               ELSE {float(KMV_K - 1)} / (CAST({_SQL_HEX12} AS BIGINT) / {_NORM!r})
          END) * 1000000.0) AS DOUBLE) / 1000000.0 AS kmv_estimate
FROM per
"""

QUERIES = {"sketch_kmv_distinct": sketch_kmv_distinct}
ORACLE = {"sketch_kmv_distinct": _SQL_KMV}


# --- robust anomaly detection (median / MAD) --------------------------------
#
# Median-absolute-deviation outlier flagging per event type — the robust
# z-score ("Hampel identifier") that survives the heavy tails a mean/stddev
# rule chokes on. Cross-engine exactness: INTEGER-ONLY, no doubles anywhere
# in the chain (r4 showed that even exact-binary-fraction percentile
# interpolation diverges across engine builds). Values become integer CENTS
# (floor(v*100 + 0.5) on identical doubles — the one shared double step,
# identical in both engines by IEEE754), then the median is PURE RANK
# ARITHMETIC in doubled units: median_halfcents = c_(lo) + c_(hi) where
# lo = (n+1) div 2 and hi = n div 2 + 1 — for odd n both ranks coincide
# (2*middle), for even n the sum IS the midpoint in half-units. Absolute
# deviations ad_hc = |2c - median_halfcents| are integers in half-cents;
# their median doubles again to QUARTER-cents (mad_qcents = ad_(lo)+ad_(hi)).
# The Hampel cutoff ad > 3*1.4826*mad compares via integer
# cross-multiplication: ad_hc/2 > 4.4478 * mad_qc/4 ⇔
# 20000*ad_hc > 44478*mad_qc. Every output column is BIGINT.
#
# Scale shape: two rank windows + one keyed join back — the same single
# hash-partition shuffle per pass an exact percentile pays (the rank window
# replaces percentile's sort with the identical sort). At extreme per-group
# volume swap for approx_percentile with a documented tolerance (the result
# then stops being oracle-checkable, which is why the registered form is
# exact).

MAD_SIGMA = 1.4826  # consistency constant: MAD ≈ sigma for normal data
MAD_CUTOFF = 3.0
# MAD_CUTOFF * MAD_SIGMA = 4.4478 exactly, as the integer ratio 44478/10000;
# with ad in half-cents and mad in quarter-cents the cutoff cross-multiplies
# to 2*10000*ad_hc > 44478*mad_qc.
_MAD_NUM = 44478
_MAD_DEN = 20000


def mad_report(d: DataFrame) -> DataFrame:
    """Integer-exact median/MAD anomaly report over an (event_type, c:long)
    frame — the engine of ``events_anomaly_mad``, factored out so tests can
    drive planted fixtures through the exact registered expression tree."""
    wp = Window.partitionBy("event_type")
    r = (
        d.withColumn("rn", F.row_number().over(wp.orderBy("c")))
        .withColumn("n", F.count(F.lit(1)).over(wp))
    )
    med = r.groupBy("event_type").agg(
        (
            F.sum(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("c")))
            + F.sum(F.when(F.col("rn") == F.expr("n div 2 + 1"), F.col("c")))
        ).alias("med_hc")
    )
    dev = d.join(med, "event_type").select(
        "event_type",
        "med_hc",
        F.abs(F.col("c") * 2 - F.col("med_hc")).alias("ad_hc"),
    )
    r2 = (
        dev.withColumn("rn", F.row_number().over(wp.orderBy("ad_hc")))
        .withColumn("n", F.count(F.lit(1)).over(wp))
    )
    madf = r2.groupBy("event_type").agg(
        (
            F.sum(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("ad_hc")))
            + F.sum(F.when(F.col("rn") == F.expr("n div 2 + 1"), F.col("ad_hc")))
        ).alias("mad_qc")
    )
    res = dev.join(madf, "event_type").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("med_hc").alias("median_halfcents"),
        F.max("mad_qc").alias("mad_qcents"),
        F.sum(
            F.when(
                F.col("ad_hc") * F.lit(_MAD_DEN) > F.col("mad_qc") * F.lit(_MAD_NUM), 1
            ).otherwise(0)
        ).cast("long").alias("n_anomalies"),
    )
    return res


def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "event_type", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c")
    )
    return mad_report(d)


_SQL_MAD = f"""
WITH d AS (
  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c FROM events
),
r AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type ORDER BY c) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM d
),
med AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN c END)
              + SUM(CASE WHEN rn = n // 2 + 1 THEN c END) AS BIGINT) AS med_hc
  FROM r GROUP BY event_type
),
dev AS (
  SELECT d.event_type, med.med_hc, abs(d.c * 2 - med.med_hc) AS ad_hc
  FROM d JOIN med USING (event_type)
),
r2 AS (
  SELECT event_type, med_hc, ad_hc,
         row_number() OVER (PARTITION BY event_type ORDER BY ad_hc) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM dev
),
madf AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN ad_hc END)
              + SUM(CASE WHEN rn = n // 2 + 1 THEN ad_hc END) AS BIGINT) AS mad_qc
  FROM r2 GROUP BY event_type
)
SELECT dev.event_type,
       COUNT(*) AS n_events,
       MAX(dev.med_hc) AS median_halfcents,
       MAX(madf.mad_qc) AS mad_qcents,
       CAST(SUM(CASE WHEN dev.ad_hc * {_MAD_DEN} > madf.mad_qc * {_MAD_NUM}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM dev JOIN madf USING (event_type)
GROUP BY dev.event_type
"""

QUERIES["events_anomaly_mad"] = events_anomaly_mad
ORACLE["events_anomaly_mad"] = _SQL_MAD


# --- EWMA (ordered sequential fold) -----------------------------------------
#
# Exponentially-weighted moving average of each user's value stream — the
# classic online smoother (Roberts 1959, EWMA control charts). This is the
# registry's canonical ORDERED-FOLD pattern: a sequential recurrence
# (state_t = f(state_{t-1}, x_t)) that no commutative aggregate expresses.
# The distributed form: ONE groupBy collects each key's (ts, id, value)
# triples, sort_array imposes the event order deterministically (total
# order: ts then event_id), and a higher-order aggregate() folds the
# recurrence per key — per-key cost is its own history, keys run in
# parallel, and the shuffle is the same single hash partition a sessionize
# pays. alpha = 0.5 makes every intermediate an exact binary fraction
# ((acc + x) * 0.5 on integer cents), so the fold is bit-identical in both
# engines with no truncation step at all.

def events_user_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "user_id",
        F.struct(
            F.unix_micros("ts").alias("us"),
            F.col("event_id").alias("eid"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
        ).alias("s"),
    )
    arr = d.groupBy("user_id").agg(F.sort_array(F.collect_list("s")).alias("a"))
    ewma = F.aggregate(
        F.slice("a", 2, F.size("a") - 1),
        F.element_at("a", 1).getField("c").cast("double"),
        lambda acc, s: (acc + s.getField("c")) * F.lit(0.5),
    )
    return arr.select(
        "user_id",
        F.size("a").cast("long").alias("n_events"),
        F.element_at("a", -1).getField("c").alias("last_cents"),
        ewma.alias("ewma_cents"),
    )


_SQL_EWMA = """
WITH d AS (
  SELECT user_id,
         {'us': epoch_us(ts), 'eid': event_id,
          'c': CAST(FLOOR(value * 100 + 0.5) AS BIGINT)} AS s
  FROM events
),
arr AS (
  SELECT user_id, list_sort(list(s)) AS a FROM d GROUP BY user_id
)
SELECT user_id,
       len(a)::BIGINT AS n_events,
       a[-1].c AS last_cents,
       list_reduce(list_prepend(CAST(a[1].c AS DOUBLE),
                                list_transform(a[2:], x -> CAST(x.c AS DOUBLE))),
                   (acc, x) -> (acc + x) * 0.5) AS ewma_cents
FROM arr
"""

QUERIES["events_user_ewma"] = events_user_ewma
ORACLE["events_user_ewma"] = _SQL_EWMA


# --- HyperLogLog distinct sketch --------------------------------------------
#
# HyperLogLog (Flajolet et al. 2007) per event type — the fixed-register
# distinct estimator ClickHouse's ``uniq``/``uniqHLL12`` family uses, and the
# other half of the sketch story next to KMV above: KMV keeps the k smallest
# HASHES (order statistics), HLL keeps per-register MAXIMA of leading-zero
# counts. Both are pure functions of the id SET, so the DuckDB twin is exact
# and the driver hash-verifies the estimator end-to-end.
#
# Determinism device: the 48-bit hash (first 12 md5 hex digits) splits into a
# 6-bit register index (m=64) and a 42-bit suffix; rho (leading-zeros+1) is a
# generated integer CASE ladder over powers of two — the SAME Python literals
# emit both engines' ladders, so no engine-specific bit intrinsics are
# involved. The harmonic-mean denominator is summed as the INTEGER
# sum(2^(43-M_j)) (register M_j <= 43, so each term and the 64-term sum are
# exact), with empty registers contributing 2^43; the only floating point is
# the final alpha*m^2/S division plus the standard linear-counting
# small-range correction, both floor-truncated to micro-units.
#
# Scale shape: map-side (event_type, register, rho), one shuffle to
# max-by-register (64 rows per group cross the wire after the partial max —
# THE mergeable-sketch property), one 64-row re-agg. At 100 TB the state per
# group is 64 integers regardless of cardinality.

HLL_P = 6
HLL_M = 1 << HLL_P  # 64 registers
_HLL_SUFFIX_BITS = _HEX_DIGITS * 4 - HLL_P  # 42
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)

# rho = (leading zeros of the 42-bit suffix) + 1, as an integer CASE ladder;
# one string, two engines (column name interpolated)
def _rho_case(col: str) -> str:
    arms = " ".join(
        f"WHEN {col} >= {1 << (_HLL_SUFFIX_BITS - 1 - i)} THEN {i + 1}"
        for i in range(_HLL_SUFFIX_BITS)
    )
    return f"(CASE {arms} ELSE {_HLL_SUFFIX_BITS + 1} END)"


def hll_registers(ev: DataFrame) -> DataFrame:
    """(event_type, reg, mj): per-register maxima of rho — THE mergeable HLL
    state (two register tables merge by per-cell MAX). Factored out so the
    streaming ingest (``streaming/sketch.py``) appends per-batch register
    tables that read-time max-merge into exactly this."""
    hashed = ev.select(
        "event_type",
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, _HEX_DIGITS), 16, 10
        ).cast("long").alias("v"),
    )
    split = hashed.select(
        "event_type",
        F.shiftright(F.col("v"), _HLL_SUFFIX_BITS).alias("reg"),
        (F.col("v") % F.lit(1 << _HLL_SUFFIX_BITS)).alias("w"),
    )
    return (
        split.withColumn("rho", F.expr(_rho_case("w")).cast("int"))
        .groupBy("event_type", "reg")
        .agg(F.max("rho").alias("mj"))
    )


def hll_report(regs: DataFrame, ev: DataFrame) -> DataFrame:
    """The estimator tail over a register table: integer harmonic sum,
    alpha correction, linear-counting small-range branch, plus the exact
    distinct for the error column."""
    per = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("registers_used"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_SUFFIX_BITS + 1} - mj)"))
        .cast("long").alias("s_used"),
    )
    two43 = 1 << (_HLL_SUFFIX_BITS + 1)
    s_int = F.col("s_used") + (F.lit(HLL_M) - F.col("registers_used")) * F.lit(two43)
    e_raw = F.lit(_HLL_ALPHA * HLL_M * HLL_M * float(two43)) / s_int.cast("double")
    zeros = F.lit(HLL_M) - F.col("registers_used")
    est = F.when(
        (e_raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double")),
    ).otherwise(e_raw)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    return per.join(exact, "event_type").select(
        "event_type",
        "registers_used",
        "n_exact",
        (F.floor(est * F.lit(1000000.0)).cast("double") / F.lit(1000000.0)).alias(
            "hll_estimate"
        ),
    )


def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return hll_report(hll_registers(ev), ev)


def _sql_hex_int(col: str, digits: int) -> str:
    """Integer value of the first ``digits`` md5 hex chars of ``col`` — the
    DuckDB twin of Spark's ``conv(substring(md5(x),1,d), 16, 10)``."""
    return "(" + " + ".join(
        f"(instr('0123456789abcdef', substring(md5({col}), {i + 1}, 1)) - 1)"
        f" * {16 ** (digits - 1 - i)}"
        for i in range(digits)
    ) + ")"


_SQL_HLL = f"""
WITH hashed AS (
  SELECT event_type,
         {_sql_hex_int('CAST(user_id AS VARCHAR)', _HEX_DIGITS)} AS v
  FROM events
),
split AS (
  SELECT event_type,
         v // {1 << _HLL_SUFFIX_BITS} AS reg,
         v % {1 << _HLL_SUFFIX_BITS} AS w
  FROM hashed
),
regs AS (
  SELECT event_type, reg, MAX({_rho_case('w')}) AS mj
  FROM split GROUP BY event_type, reg
),
per AS (
  SELECT event_type,
         COUNT(*) AS registers_used,
         SUM(CAST(POWER(2, {_HLL_SUFFIX_BITS + 1} - mj) AS BIGINT)) AS s_used
  FROM regs GROUP BY event_type
),
exact AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS n_exact FROM events GROUP BY event_type
),
est AS (
  SELECT event_type, registers_used,
         s_used + ({HLL_M} - registers_used) * {1 << (_HLL_SUFFIX_BITS + 1)} AS s_int
  FROM per
)
SELECT est.event_type,
       CAST(registers_used AS BIGINT) AS registers_used,
       CAST(n_exact AS BIGINT) AS n_exact,
       CAST(FLOOR((CASE WHEN {_HLL_ALPHA * HLL_M * HLL_M * float(1 << (_HLL_SUFFIX_BITS + 1))!r} / CAST(s_int AS DOUBLE) <= {2.5 * HLL_M!r}
                         AND {HLL_M} - registers_used > 0
                   THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / CAST({HLL_M} - registers_used AS DOUBLE))
                   ELSE {_HLL_ALPHA * HLL_M * HLL_M * float(1 << (_HLL_SUFFIX_BITS + 1))!r} / CAST(s_int AS DOUBLE)
                   END) * 1000000.0) AS DOUBLE) / 1000000.0 AS hll_estimate
FROM est JOIN exact ON est.event_type = exact.event_type
"""

QUERIES["sketch_hll_distinct"] = sketch_hll_distinct
ORACLE["sketch_hll_distinct"] = _SQL_HLL


# --- count-min sketch heavy hitters -----------------------------------------
#
# Count-min sketch (Cormode & Muthukrishnan 2005) over the document token
# stream: d=4 hash rows x w=512 counters, estimate = min over rows — the
# frequency sketch behind heavy-hitter detection in streaming systems
# (ClickHouse ``topK`` solves the same problem with SpaceSaving; CMS is the
# shape that merges by cell-wise ADDITION, which is what a map-side partial
# needs). Salted md5 per row keeps both engines on identical cells.
#
# The sketch NEVER undercounts (every true count <= its estimate), so
# thresholding the estimates can only add false positives, never drop a true
# heavy hitter — the report includes the exact count next to the estimate so
# the driver row also pins the one-sided error property on real data.
#
# Scale shape: the counter table is d*w = 2048 cells TOTAL regardless of
# corpus size — one token-count aggregation (vocab-sized, the same shuffle
# tfidf pays), a vocab x d expansion, a 2048-row cell agg that BROADCASTS
# back for the lookup join. The only corpus-sized stage is the initial
# explode; everything downstream is sketch-sized.

CMS_DEPTH = 4
CMS_WIDTH = 512
CMS_PHI = 0.005  # report terms whose estimated frequency >= 0.5% of tokens
_CMS_HASH_DIGITS = 8


def cms_vocab(docs: DataFrame) -> DataFrame:
    """Token counts (term, cnt) — the map-side partial the sketch is built
    from. A pure function of the doc set, so per-batch partials SUM-merge
    into the global vocab (used by the streaming ingest)."""
    from cdc_postgresql_clickhouse_spark.functions.text import tokens

    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_cells(vocab: DataFrame) -> DataFrame:
    """Expand each term to its CMS_DEPTH (row, column) cells — salted md5
    keeps both engines (and every batch) on identical cells."""
    return vocab.select(
        "term",
        "cnt",
        F.explode(F.array(*[F.lit(i) for i in range(CMS_DEPTH)])).alias("r"),
    ).withColumn(
        "c",
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("r").cast("string"), F.lit(":"), F.col("term"))),
                1,
                _CMS_HASH_DIGITS,
            ),
            16,
            10,
        ).cast("long")
        % CMS_WIDTH,
    )


def cms_counters(vocab: DataFrame) -> DataFrame:
    """The d×w counter table (r, c, cell). CMS is LINEAR: counter tables of
    disjoint streams merge by cell-wise ADDITION — the property the
    streaming ingest (``streaming/sketch.py``) relies on."""
    return cms_cells(vocab).groupBy("r", "c").agg(F.sum("cnt").alias("cell"))


def cms_report(vocab: DataFrame, counters: DataFrame) -> DataFrame:
    """Heavy-hitter report from a (merged) vocab + counter table: estimate =
    min over the term's cells, threshold = CMS_PHI of total tokens; exact
    count alongside pins the one-sided-error property on real data."""
    total = vocab.agg(F.sum("cnt")).first()[0]
    threshold = int(total * CMS_PHI)
    est = (
        cms_cells(vocab).join(F.broadcast(counters), ["r", "c"])
        .groupBy("term")
        .agg(F.min("cell").cast("long").alias("cms_count"), F.max("cnt").alias("exact_count"))
    )
    return est.filter(F.col("cms_count") >= threshold).select(
        "term", "cms_count", "exact_count"
    )


def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    vocab = cms_vocab(docs).persist()
    return cms_report(vocab, cms_counters(vocab))


_SQL_CMS = f"""
WITH vocab AS (
  SELECT term, COUNT(*) AS cnt FROM (
    SELECT unnest(list_filter(str_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '), t -> t <> '')) AS term
    FROM documents
  ) GROUP BY term
),
tot AS (SELECT SUM(cnt) AS total FROM vocab),
cells AS (
  SELECT term, cnt, r,
         {_sql_hex_int("CAST(r AS VARCHAR) || ':' || term", _CMS_HASH_DIGITS)} % {CMS_WIDTH} AS c
  FROM vocab, unnest([{', '.join(str(i) for i in range(CMS_DEPTH))}]) AS u(r)
),
counters AS (SELECT r, c, SUM(cnt) AS cell FROM cells GROUP BY r, c),
est AS (
  SELECT cells.term,
         MIN(counters.cell) AS cms_count,
         MAX(cells.cnt) AS exact_count
  FROM cells JOIN counters ON cells.r = counters.r AND cells.c = counters.c
  GROUP BY cells.term
)
SELECT term, CAST(cms_count AS BIGINT) AS cms_count, CAST(exact_count AS BIGINT) AS exact_count
FROM est, tot
WHERE cms_count >= CAST(FLOOR(tot.total * {CMS_PHI!r}) AS BIGINT)
"""

QUERIES["sketch_cms_heavy_hitters"] = sketch_cms_heavy_hitters
ORACLE["sketch_cms_heavy_hitters"] = _SQL_CMS


# --- KMV sketch MERGE (union estimates) -------------------------------------
#
# Distinct-user estimates for PAIRS of event types by MERGING the per-type
# KMV states — the property that makes a sketch a sketch: two KMV states
# merge by keeping the k smallest of the union, and (k-smallest of union of
# k-smallests) = (k-smallest of the union), so the merged estimator is
# EXACTLY what a direct build over the combined stream would produce
# (pinned by test). This is how a map-side partial combine / a
# merge-across-shards rollup works; the pair grid stands in for any
# "estimate the union of segments without rescanning them" query.
#
# Scale shape: the per-type k-states are k rows each (built once, the same
# window as sketch_kmv_distinct); the pair expansion is |types|^2/2 × 2k
# rows — sketch-sized, independent of corpus volume. The exact side (for
# the error column) is one distinct + one count per pair over the id set.

def sketch_kmv_union(spark: SparkSession, sf_dir: str, k: int = KMV_K) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hashed = ev.select(
        "event_type",
        F.substring(F.md5(F.col("user_id").cast("string")), 1, _HEX_DIGITS).alias("h"),
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    kstate = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("event_type", "h")
    )
    types = hashed.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .join(types.select(F.col("event_type").alias("type_b")))
        .filter(F.col("type_a") < F.col("type_b"))
    )
    members = pairs.select(
        "type_a", "type_b", F.explode(F.array("type_a", "type_b")).alias("event_type")
    )
    merged = (
        members.join(kstate, "event_type")
        .select("type_a", "type_b", "h")
        .distinct()
    )
    wm = Window.partitionBy("type_a", "type_b").orderBy("h")
    ranked = merged.withColumn("rn", F.row_number().over(wm)).filter(F.col("rn") <= k)
    per = ranked.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_tracked"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("hk"),
    )
    vk = F.conv(F.col("hk"), 16, 10).cast("long") / F.lit(_NORM)
    est = F.when(F.col("n_tracked") < k, F.col("n_tracked").cast("double")).otherwise(
        F.lit(float(k - 1)) / vk
    )
    exact = (
        members.join(
            ev.select("event_type", "user_id").distinct(), "event_type"
        )
        .select("type_a", "type_b", "user_id")
        .distinct()
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    )
    return per.join(exact, ["type_a", "type_b"]).select(
        "type_a",
        "type_b",
        "n_tracked",
        "n_exact",
        (F.floor(est * F.lit(1000000.0)).cast("double") / F.lit(1000000.0)).alias(
            "kmv_estimate"
        ),
    )


_SQL_KMV_UNION = f"""
WITH hashed AS (
  SELECT DISTINCT event_type,
         substring(md5(CAST(user_id AS VARCHAR)), 1, {_HEX_DIGITS}) AS h
  FROM events
),
kstate AS (
  SELECT event_type, h FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM hashed
  ) WHERE rn <= {KMV_K}
),
types AS (SELECT DISTINCT event_type FROM hashed),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM types a JOIN types b ON a.event_type < b.event_type
),
members AS (
  SELECT type_a, type_b, unnest([type_a, type_b]) AS event_type FROM pairs
),
merged AS (
  SELECT DISTINCT m.type_a, m.type_b, k.h
  FROM members m JOIN kstate k USING (event_type)
),
ranked AS (
  SELECT type_a, type_b, h,
         row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn
  FROM merged
  QUALIFY rn <= {KMV_K}
),
per AS (
  SELECT type_a, type_b,
         COUNT(*) AS n_tracked,
         MAX(CASE WHEN rn = {KMV_K} THEN h END) AS h
  FROM ranked GROUP BY type_a, type_b
),
exact AS (
  SELECT type_a, type_b, COUNT(*) AS n_exact FROM (
    SELECT DISTINCT m.type_a, m.type_b, e.user_id
    FROM members m JOIN (SELECT DISTINCT event_type, user_id FROM events) e
      USING (event_type)
  ) GROUP BY type_a, type_b
)
SELECT per.type_a, per.type_b,
       CAST(n_tracked AS BIGINT) AS n_tracked,
       CAST(n_exact AS BIGINT) AS n_exact,
       CAST(FLOOR(
         (CASE WHEN n_tracked < {KMV_K}
               THEN CAST(n_tracked AS DOUBLE)
               ELSE {float(KMV_K - 1)} / (CAST({_SQL_HEX12} AS BIGINT) / {_NORM!r})
          END) * 1000000.0) AS DOUBLE) / 1000000.0 AS kmv_estimate
FROM per JOIN exact ON per.type_a = exact.type_a AND per.type_b = exact.type_b
"""

QUERIES["sketch_kmv_union"] = sketch_kmv_union
ORACLE["sketch_kmv_union"] = _SQL_KMV_UNION


# --- mergeable quantile sketch (bottom-k hash sample) ------------------------
#
# Per-key QUANTILE state that merges exactly — the round-5 queue item
# (VERDICT r4 #3). KLL/t-digest merge only distributionally (their compaction
# is randomized), which would break the driver's hash gate; the formulation
# that IS set-pure — the same device that made KMV and HLL oracle-checkable —
# is the bottom-k sketch (Cohen & Kaplan 2007): keep the k events with the
# SMALLEST md5(event_id) plus the exact count n. Because event ids are
# unique, bottom-k by a fixed hash is a uniform sample of the key's events,
# and bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ bottom-k(B)) EXACTLY — the
# mergeable-sketch property, pinned by test and exercised as a driver row
# (``sketch_quantile_merge`` estimates PAIRS of event types purely from the
# per-type states). Quantiles come off the sample by NEAREST-RANK (type-1):
# rank ceil(q*m) as integer arithmetic ((m+3) div 4, (m+1) div 2,
# (3m+3) div 4), so every output column is BIGINT — the r5 no-doubles
# contract of this family. Sample error is the standard O(1/sqrt(k)) on
# rank; n is exact.
#
# Scale shape: map-side hash, one bottom-k window per key (k rows survive
# per key — at extreme volume a per-partition top-k combine caps shuffle
# volume at k per partition-group, as in KMV), then all downstream work is
# sketch-sized (<= k rows per key). The merge query touches ONLY the states:
# |types|^2/2 x 2k rows, corpus-independent.

QSK_K = 64


def _bottomk_state(ev: DataFrame, k: int) -> DataFrame:
    """(event_type, h, c): the k events with smallest md5(event_id) per
    type, carrying integer-cent values — the sketch state."""
    d = ev.select(
        "event_type",
        F.md5(F.col("event_id").cast("string")).alias("h"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    w = Window.partitionBy("event_type").orderBy("h")
    return d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def _sample_quantiles(st: DataFrame, keys: list[str]) -> DataFrame:
    """Nearest-rank p25/p50/p75 (integer cents) off a bottom-k sample,
    grouped by ``keys``."""
    wp = Window.partitionBy(*keys)
    ranked = st.withColumn("vr", F.row_number().over(wp.orderBy("c"))).withColumn(
        "m", F.count(F.lit(1)).over(wp)
    )
    return ranked.groupBy(*keys).agg(
        F.max("m").cast("long").alias("m_sample"),
        F.sum(F.when(F.col("vr") == F.expr("(m + 3) div 4"), F.col("c"))).alias("p25_cents"),
        F.sum(F.when(F.col("vr") == F.expr("(m + 1) div 2"), F.col("c"))).alias("p50_cents"),
        F.sum(F.when(F.col("vr") == F.expr("(3 * m + 3) div 4"), F.col("c"))).alias("p75_cents"),
    )


def sketch_quantile_bottomk(spark: SparkSession, sf_dir: str, k: int = QSK_K) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    st = _bottomk_state(ev, k)
    qs = _sample_quantiles(st, ["event_type"])
    n = ev.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    return qs.join(n, "event_type").select(
        "event_type", "n_events", "m_sample", "p25_cents", "p50_cents", "p75_cents"
    )


def sketch_quantile_merge(spark: SparkSession, sf_dir: str, k: int = QSK_K) -> DataFrame:
    """Pair-of-types quantiles computed ONLY from the per-type states —
    the merge property as a driver row. No distinct() on the merged sample:
    event ids are globally unique, so the two states' hash sets are
    disjoint by construction."""
    ev = load_table(spark, sf_dir, "events")
    st = _bottomk_state(ev, k)
    types = st.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .join(types.select(F.col("event_type").alias("type_b")))
        .filter(F.col("type_a") < F.col("type_b"))
    )
    members = pairs.select(
        "type_a", "type_b", F.explode(F.array("type_a", "type_b")).alias("event_type")
    )
    merged = members.join(st, "event_type").select("type_a", "type_b", "h", "c")
    wm = Window.partitionBy("type_a", "type_b").orderBy("h")
    kept = merged.withColumn("rn", F.row_number().over(wm)).filter(F.col("rn") <= k).drop("rn")
    qs = _sample_quantiles(kept, ["type_a", "type_b"])
    n = ev.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n_t"))
    n_pair = (
        members.join(n, "event_type")
        .groupBy("type_a", "type_b")
        .agg(F.sum("n_t").cast("long").alias("n_events"))
    )
    return qs.join(n_pair, ["type_a", "type_b"]).select(
        "type_a", "type_b", "n_events", "m_sample", "p25_cents", "p50_cents", "p75_cents"
    )


_SQL_QSK_STATE = f"""
  SELECT event_type, h, c FROM (
    SELECT event_type, h, c,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM (
      SELECT event_type,
             md5(CAST(event_id AS VARCHAR)) AS h,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
      FROM events
    )
  ) WHERE rn <= {QSK_K}
"""

_SQL_QSK = f"""
WITH st AS ({_SQL_QSK_STATE}),
ranked AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type ORDER BY c) AS vr,
         COUNT(*) OVER (PARTITION BY event_type) AS m
  FROM st
),
qs AS (
  SELECT event_type,
         CAST(MAX(m) AS BIGINT) AS m_sample,
         CAST(SUM(CASE WHEN vr = (m + 3) // 4 THEN c END) AS BIGINT) AS p25_cents,
         CAST(SUM(CASE WHEN vr = (m + 1) // 2 THEN c END) AS BIGINT) AS p50_cents,
         CAST(SUM(CASE WHEN vr = (3 * m + 3) // 4 THEN c END) AS BIGINT) AS p75_cents
  FROM ranked GROUP BY event_type
),
n AS (SELECT event_type, COUNT(*) AS n_events FROM events GROUP BY event_type)
SELECT qs.event_type, n.n_events, qs.m_sample, qs.p25_cents, qs.p50_cents, qs.p75_cents
FROM qs JOIN n USING (event_type)
"""

_SQL_QSK_MERGE = f"""
WITH st AS ({_SQL_QSK_STATE}),
types AS (SELECT DISTINCT event_type FROM st),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM types a JOIN types b ON a.event_type < b.event_type
),
members AS (
  SELECT type_a, type_b, unnest([type_a, type_b]) AS event_type FROM pairs
),
merged AS (
  SELECT m.type_a, m.type_b, s.h, s.c
  FROM members m JOIN st s USING (event_type)
),
kept AS (
  SELECT type_a, type_b, c FROM (
    SELECT type_a, type_b, h, c,
           row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn
    FROM merged
  ) WHERE rn <= {QSK_K}
),
ranked AS (
  SELECT type_a, type_b, c,
         row_number() OVER (PARTITION BY type_a, type_b ORDER BY c) AS vr,
         COUNT(*) OVER (PARTITION BY type_a, type_b) AS m
  FROM kept
),
qs AS (
  SELECT type_a, type_b,
         CAST(MAX(m) AS BIGINT) AS m_sample,
         CAST(SUM(CASE WHEN vr = (m + 3) // 4 THEN c END) AS BIGINT) AS p25_cents,
         CAST(SUM(CASE WHEN vr = (m + 1) // 2 THEN c END) AS BIGINT) AS p50_cents,
         CAST(SUM(CASE WHEN vr = (3 * m + 3) // 4 THEN c END) AS BIGINT) AS p75_cents
  FROM ranked GROUP BY type_a, type_b
),
n AS (SELECT event_type, COUNT(*) AS n_t FROM events GROUP BY event_type),
n_pair AS (
  SELECT type_a, type_b, CAST(SUM(n_t) AS BIGINT) AS n_events
  FROM members JOIN n USING (event_type)
  GROUP BY type_a, type_b
)
SELECT qs.type_a, qs.type_b, n_pair.n_events, qs.m_sample,
       qs.p25_cents, qs.p50_cents, qs.p75_cents
FROM qs JOIN n_pair ON qs.type_a = n_pair.type_a AND qs.type_b = n_pair.type_b
"""

QUERIES["sketch_quantile_bottomk"] = sketch_quantile_bottomk
QUERIES["sketch_quantile_merge"] = sketch_quantile_merge
ORACLE["sketch_quantile_bottomk"] = _SQL_QSK
ORACLE["sketch_quantile_merge"] = _SQL_QSK_MERGE


# --- quantile sketch error report -------------------------------------------
#
# The third leg of the evaluation trio (ann_recall_report, dedup_lsh_tuning
# _report): how far are the bottom-k sample quantiles from the EXACT
# nearest-rank quantiles, per key? Same rank arithmetic on both sides (the
# exact side is just the sample formulas with m = n), so every column stays
# BIGINT and the error is an exact integer difference. The expected error is
# the O(1/sqrt(k)) rank deviation of a uniform sample — this row measures it
# on real data instead of quoting it.
#
# Scale shape: the sketch side is sketch-sized; the exact side is one sort
# per key (the ground truth an evaluation pays for ONCE, on a sampled key
# set at extreme volume — here the key set is |event types|).


def sketch_quantile_error_report(
    spark: SparkSession, sf_dir: str, k: int = QSK_K
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sk = _sample_quantiles(_bottomk_state(ev, k), ["event_type"])
    allv = ev.select(
        "event_type", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c")
    )
    ex = _sample_quantiles(allv, ["event_type"])
    s, e = sk.alias("s"), ex.alias("e")
    j = s.join(e, "event_type")
    return j.select(
        "event_type",
        F.col("e.m_sample").alias("n_events"),
        F.col("s.m_sample").alias("m_sample"),
        F.col("s.p50_cents").alias("p50_sketch_cents"),
        F.col("e.p50_cents").alias("p50_exact_cents"),
        F.abs(F.col("s.p25_cents") - F.col("e.p25_cents")).alias("err25_cents"),
        F.abs(F.col("s.p50_cents") - F.col("e.p50_cents")).alias("err50_cents"),
        F.abs(F.col("s.p75_cents") - F.col("e.p75_cents")).alias("err75_cents"),
    )


_SQL_QSK_ERR = f"""
WITH st AS ({_SQL_QSK_STATE}),
sranked AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type ORDER BY c) AS vr,
         COUNT(*) OVER (PARTITION BY event_type) AS m
  FROM st
),
sqs AS (
  SELECT event_type,
         CAST(MAX(m) AS BIGINT) AS m_sample,
         CAST(SUM(CASE WHEN vr = (m + 3) // 4 THEN c END) AS BIGINT) AS p25_cents,
         CAST(SUM(CASE WHEN vr = (m + 1) // 2 THEN c END) AS BIGINT) AS p50_cents,
         CAST(SUM(CASE WHEN vr = (3 * m + 3) // 4 THEN c END) AS BIGINT) AS p75_cents
  FROM sranked GROUP BY event_type
),
allv AS (
  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c FROM events
),
eranked AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type ORDER BY c) AS vr,
         COUNT(*) OVER (PARTITION BY event_type) AS m
  FROM allv
),
eqs AS (
  SELECT event_type,
         CAST(MAX(m) AS BIGINT) AS m_sample,
         CAST(SUM(CASE WHEN vr = (m + 3) // 4 THEN c END) AS BIGINT) AS p25_cents,
         CAST(SUM(CASE WHEN vr = (m + 1) // 2 THEN c END) AS BIGINT) AS p50_cents,
         CAST(SUM(CASE WHEN vr = (3 * m + 3) // 4 THEN c END) AS BIGINT) AS p75_cents
  FROM eranked GROUP BY event_type
)
SELECT s.event_type,
       e.m_sample AS n_events,
       s.m_sample AS m_sample,
       s.p50_cents AS p50_sketch_cents,
       e.p50_cents AS p50_exact_cents,
       ABS(s.p25_cents - e.p25_cents) AS err25_cents,
       ABS(s.p50_cents - e.p50_cents) AS err50_cents,
       ABS(s.p75_cents - e.p75_cents) AS err75_cents
FROM sqs s JOIN eqs e USING (event_type)
"""

QUERIES["sketch_quantile_error_report"] = sketch_quantile_error_report
ORACLE["sketch_quantile_error_report"] = _SQL_QSK_ERR


# --- CUSUM change detection — PENDING round 7 -------------------------------
#
# One-sided CUSUM over each type's value stream (Page 1954): alarms when
# the cumulative positive drift above the baseline exceeds a threshold.
# The recurrence S_t = max(0, S_{t-1} + (c_t − target)) is NOT a fold
# here — it collapses to the DRAWDOWN IDENTITY S_t = P_t − min_{s≤t} P_s
# over the prefix sums P, so both engines compute it with two plain
# windows (running sum + running min): no recursion, no state, exact
# integers end to end. Baseline = integer mean cents; threshold = 3× the
# integer mean absolute deviation (both truncating divisions).


def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("es"),
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    s1 = ev.groupBy("event_type").agg(
        F.sum("c").alias("sc"), F.count(F.lit(1)).cast("long").alias("n")
    ).select("event_type", "n", F.expr("sc div n").cast("long").alias("target"))
    d = ev.join(F.broadcast(s1), "event_type")
    s2 = d.groupBy("event_type").agg(
        F.sum(F.abs(F.col("c") - F.col("target"))).alias("sad"),
        F.max("n").alias("n2"),
    ).select(
        "event_type", (F.expr("sad div n2") * 3).cast("long").alias("h")
    )
    d2 = d.join(F.broadcast(s2), "event_type")
    w = (
        Window.partitionBy("event_type")
        .orderBy("es", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p = F.sum(F.col("c") - F.col("target")).over(w)
    # the running min must include the EMPTY prefix (P_0 = 0): S resets
    # to zero at the stream head, so the subtrahend is min(0, min P_s)
    scored = d2.withColumn("p", p).withColumn(
        "s", F.col("p") - F.least(F.lit(0).cast("long"), F.min("p").over(w))
    )
    return scored.groupBy("event_type").agg(
        F.max("n").alias("n_events"),
        F.max("target").alias("target_cents"),
        F.max("h").alias("h_cents"),
        F.sum(F.when(F.col("s") > F.col("h"), 1).otherwise(0)).cast("long").alias(
            "n_alarms"
        ),
        F.max("s").cast("long").alias("max_s_cents"),
    )


_SQL_CUSUM = """
WITH ev AS (
  SELECT event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) AS es, event_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
s1 AS (
  SELECT event_type, COUNT(*) AS n, SUM(c) // COUNT(*) AS target
  FROM ev GROUP BY event_type
),
d AS (SELECT e.*, s.n, s.target FROM ev e JOIN s1 s USING (event_type)),
s2 AS (
  SELECT event_type, (SUM(ABS(c - target)) // MAX(n)) * 3 AS h
  FROM d GROUP BY event_type
),
pref AS (
  SELECT d.event_type, d.es, d.event_id, d.n, d.target, s2.h,
         SUM(d.c - d.target) OVER (
           PARTITION BY d.event_type ORDER BY d.es, d.event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
  FROM d JOIN s2 USING (event_type)
),
scored AS (
  SELECT event_type, n, target, h,
         p - LEAST(0, MIN(p) OVER (
           PARTITION BY event_type ORDER BY es, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
  FROM pref
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_events,
       CAST(MAX(target) AS BIGINT) AS target_cents,
       CAST(MAX(h) AS BIGINT) AS h_cents,
       CAST(SUM(CASE WHEN s > h THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
       CAST(MAX(s) AS BIGINT) AS max_s_cents
FROM scored GROUP BY event_type
"""

# --- Holt linear (double-exponential) smoothing — PENDING round 7 -----------
#
# Holt's linear-trend smoother (Holt 1957): the two-state big sibling of
# the EWMA fold above. With alpha = beta = 1/2 the recurrence
#   l_t = (x_t + l_{t-1} + b_{t-1}) / 2
#   b_t = (l_t - l_{t-1}) / 2 + b_{t-1} / 2
# rewrites (substituting l_t) to the CSE-free linear form
#   b_t = (x_t - l_{t-1}) * 0.25 + b_{t-1} * 0.75
# so every step is a fixed left-associated chain of IEEE double ops on
# integer-cent inputs — bit-identical in both engines. The accumulator is
# a 2-element DOUBLE array, NOT a struct: DuckDB 1.0.0 mis-evaluates
# multi-field struct lambdas whose fields each read several accumulator
# fields (verified: struct form drifts from the Python recurrence by step
# 2; the array form is exact). Init: l_2 = x_2, b_2 = x_2 - x_1 (standard
# two-point start); single-event keys degrade to l = x_1, b = 0. Same
# single-shuffle ordered-fold shape as events_user_ewma.


def events_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "user_id",
        F.struct(
            F.unix_micros("ts").alias("us"),
            F.col("event_id").alias("eid"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
        ).alias("s"),
    )
    arr = d.groupBy("user_id").agg(F.sort_array(F.collect_list("s")).alias("a"))
    c1 = F.element_at("a", 1).getField("c").cast("double")
    c2 = F.element_at("a", 2).getField("c").cast("double")
    folded = F.aggregate(
        F.slice(F.col("a"), 3, F.greatest(F.size("a") - 2, F.lit(0))),
        F.array(c2, c2 - c1),
        lambda acc, s: F.array(
            (s.getField("c") + F.element_at(acc, 1) + F.element_at(acc, 2))
            * F.lit(0.5),
            (s.getField("c") - F.element_at(acc, 1)) * F.lit(0.25)
            + F.element_at(acc, 2) * F.lit(0.75),
        ),
    )
    st = F.when(F.size("a") >= 2, folded).otherwise(
        F.array(c1, F.lit(0.0).cast("double"))
    )
    return arr.select(
        "user_id",
        F.size("a").cast("long").alias("n_events"),
        F.element_at(st, 1).alias("level_cents"),
        F.element_at(st, 2).alias("trend_cents"),
        (F.element_at(st, 1) + F.element_at(st, 2)).alias("forecast_cents"),
    )


_SQL_HOLT = """
WITH d AS (
  SELECT user_id,
         {'us': epoch_us(ts), 'eid': event_id,
          'c': CAST(FLOOR(value * 100 + 0.5) AS BIGINT)} AS s
  FROM events
),
arr AS (SELECT user_id, list_sort(list(s)) AS a FROM d GROUP BY user_id),
st AS (
  SELECT user_id, len(a)::BIGINT AS n_events,
    CASE WHEN len(a) >= 2 THEN
      list_reduce(
        list_prepend([CAST(a[2].c AS DOUBLE), CAST(a[2].c - a[1].c AS DOUBLE)],
                     list_transform(a[3:], x -> [CAST(x.c AS DOUBLE),
                                                 CAST(0 AS DOUBLE)])),
        (acc, x) -> [(x[1] + acc[1] + acc[2]) * 0.5,
                     (x[1] - acc[1]) * 0.25 + acc[2] * 0.75])
    ELSE [CAST(a[1].c AS DOUBLE), CAST(0 AS DOUBLE)] END AS v
  FROM arr
)
SELECT user_id, n_events,
       v[1] AS level_cents,
       v[2] AS trend_cents,
       v[1] + v[2] AS forecast_cents
FROM st
"""

PENDING_QUERIES = {
    "events_cusum_changepoint": events_cusum_changepoint,
    "events_holt_linear": events_holt_linear,
}
PENDING_ORACLE = {
    "events_cusum_changepoint": _SQL_CUSUM,
    "events_holt_linear": _SQL_HOLT,
}


# --- KMV set-intersection estimate — PENDING round 7 ------------------------
#
# The missing leg of the sketch SET ALGEBRA: distinct-count of the
# INTERSECTION of two key sets purely from their bottom-k states
# (Beyer et al. 2007, the theta-sketch idiom): with K_U = bottom-k of
# the merged sketches, rho = |K_U that belong to BOTH input sketches|/|K_U|
# estimates the Jaccard similarity, and est|A∩B| = rho * est|A∪B| —
# union estimation is the already-registered ``sketch_kmv_union`` tail.
# Small-range exactness for free: when the union tracks fewer than k
# hashes the sketches ARE the sets and the estimate is the exact
# intersection. The exact count rides along for the error column. All
# sketch work is |types|·k rows; the only corpus-sized stage is the same
# distinct (type, hash) projection every KMV row pays.


def sketch_kmv_intersect(spark: SparkSession, sf_dir: str, k: int = KMV_K) -> DataFrame:
    from pyspark import StorageLevel

    ev = load_table(spark, sf_dir, "events")
    # persist the two derived tables every downstream branch re-reads: the
    # round-7 scan audit found this query re-deriving the corpus-sized
    # distinct (type, hash) projection TWELVE times (one full scan + one
    # distinct shuffle per reference) — the classic diamond-lineage trap
    hashed = ev.select(
        "event_type",
        F.substring(F.md5(F.col("user_id").cast("string")), 1, _HEX_DIGITS).alias("h"),
    ).distinct().persist(StorageLevel.MEMORY_AND_DISK)
    w = Window.partitionBy("event_type").orderBy("h")
    kstate = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("event_type", "h")
        .persist(StorageLevel.MEMORY_AND_DISK)  # |types|·k rows, read 3x
    )
    types = hashed.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .join(types.select(F.col("event_type").alias("type_b")))
        .filter(F.col("type_a") < F.col("type_b"))
    )
    members = pairs.select(
        "type_a", "type_b", F.explode(F.array("type_a", "type_b")).alias("event_type")
    )
    merged = (
        members.join(kstate, "event_type").select("type_a", "type_b", "h").distinct()
    )
    wm = Window.partitionBy("type_a", "type_b").orderBy("h")
    ranked = merged.withColumn("rn", F.row_number().over(wm)).filter(F.col("rn") <= k)
    per = ranked.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_tracked"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("hk"),
    )
    ka = kstate.select(F.col("event_type").alias("type_a"), "h")
    kb = kstate.select(F.col("event_type").alias("type_b"), "h")
    common = (
        ranked.join(ka, ["type_a", "h"])
        .join(kb, ["type_b", "h"])
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    per2 = per.join(common, ["type_a", "type_b"], "left").withColumn(
        "n_common", F.coalesce("n_common", F.lit(0).cast("long"))
    )
    vk = F.conv(F.col("hk"), 16, 10).cast("long") / F.lit(_NORM)
    est_union = F.when(
        F.col("n_tracked") < k, F.col("n_tracked").cast("double")
    ).otherwise(F.lit(float(k - 1)) / vk)
    est_int = (
        F.col("n_common").cast("double") / F.col("n_tracked").cast("double") * est_union
    )
    du = ev.select("event_type", "user_id").distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )  # read by both exact-intersect legs
    ia = du.select(F.col("event_type").alias("type_a"), "user_id")
    ib = du.select(F.col("event_type").alias("type_b"), "user_id")
    exact = (
        pairs.join(ia, "type_a")
        .join(ib, ["type_b", "user_id"])
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact_intersect"))
    )
    return (
        per2.join(exact, ["type_a", "type_b"], "left")
        .withColumn(
            "n_exact_intersect", F.coalesce("n_exact_intersect", F.lit(0).cast("long"))
        )
        .select(
            "type_a", "type_b", "n_tracked", "n_common", "n_exact_intersect",
            (F.floor(est_int * F.lit(1000000.0)).cast("double") / F.lit(1000000.0))
            .alias("kmv_intersect_estimate"),
        )
    )


_SQL_KMV_INTERSECT = f"""
WITH hashed AS (
  SELECT DISTINCT event_type,
         substring(md5(CAST(user_id AS VARCHAR)), 1, {_HEX_DIGITS}) AS h
  FROM events
),
kstate AS (
  SELECT event_type, h FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM hashed
  ) WHERE rn <= {KMV_K}
),
types AS (SELECT DISTINCT event_type FROM hashed),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM types a JOIN types b ON a.event_type < b.event_type
),
members AS (
  SELECT type_a, type_b, unnest([type_a, type_b]) AS event_type FROM pairs
),
merged AS (
  SELECT DISTINCT m.type_a, m.type_b, k.h
  FROM members m JOIN kstate k USING (event_type)
),
ranked AS (
  SELECT type_a, type_b, h,
         row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn
  FROM merged
  QUALIFY rn <= {KMV_K}
),
per AS (
  SELECT type_a, type_b,
         COUNT(*) AS n_tracked,
         MAX(CASE WHEN rn = {KMV_K} THEN h END) AS h
  FROM ranked GROUP BY type_a, type_b
),
common AS (
  SELECT r.type_a, r.type_b, COUNT(*) AS n_common
  FROM ranked r
  JOIN kstate ka ON ka.event_type = r.type_a AND ka.h = r.h
  JOIN kstate kb ON kb.event_type = r.type_b AND kb.h = r.h
  GROUP BY r.type_a, r.type_b
),
exact AS (
  SELECT p.type_a, p.type_b, COUNT(*) AS n_exact_intersect
  FROM pairs p
  JOIN (SELECT DISTINCT event_type, user_id FROM events) ua
    ON ua.event_type = p.type_a
  JOIN (SELECT DISTINCT event_type, user_id FROM events) ub
    ON ub.event_type = p.type_b AND ub.user_id = ua.user_id
  GROUP BY p.type_a, p.type_b
)
SELECT per.type_a, per.type_b,
       CAST(per.n_tracked AS BIGINT) AS n_tracked,
       CAST(COALESCE(common.n_common, 0) AS BIGINT) AS n_common,
       CAST(COALESCE(exact.n_exact_intersect, 0) AS BIGINT) AS n_exact_intersect,
       CAST(FLOOR(
         (CAST(COALESCE(common.n_common, 0) AS DOUBLE) / CAST(per.n_tracked AS DOUBLE)
          * (CASE WHEN per.n_tracked < {KMV_K}
                  THEN CAST(per.n_tracked AS DOUBLE)
                  ELSE {float(KMV_K - 1)} / (CAST({_SQL_HEX12} AS BIGINT) / {_NORM!r})
             END)) * 1000000.0) AS DOUBLE) / 1000000.0 AS kmv_intersect_estimate
FROM per
LEFT JOIN common ON common.type_a = per.type_a AND common.type_b = per.type_b
LEFT JOIN exact ON exact.type_a = per.type_a AND exact.type_b = per.type_b
"""

PENDING_QUERIES["sketch_kmv_intersect"] = sketch_kmv_intersect
PENDING_ORACLE["sketch_kmv_intersect"] = _SQL_KMV_INTERSECT


# --- CMS join-size estimation — PENDING round 7 -----------------------------
#
# Equi-join cardinality estimation by sketch INNER PRODUCT (Cormode &
# Muthukrishnan 2005 §4.2, the application CMS was designed for, and what
# a cost-based optimizer consults before choosing a join strategy):
# |A ⋈ B| = Σ_k cntA(k)·cntB(k), estimated as min over sketch rows r of
# Σ_c A[r,c]·B[r,c] — a ONE-SIDED overestimate (colliding cells only add
# mass), law-pinned below. Each side's d×w counter table reuses the
# registered CMS machinery verbatim; the estimate costs d·w cell
# multiplies however large the tables are, while the exact inner product
# (carried for the error column) pays the real key join. Every output is
# BIGINT — integer-exact end to end.


def sketch_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev_keys = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("user_id").cast("string").alias("term"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    ord_keys = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").cast("string").alias("term"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    ca = cms_counters(ev_keys).select("r", "c", F.col("cell").alias("cell_a"))
    cb = cms_counters(ord_keys).select("r", "c", F.col("cell").alias("cell_b"))
    rows = spark.range(CMS_DEPTH).select(F.col("id").cast("int").alias("r"))
    prod = ca.join(cb, ["r", "c"]).groupBy("r").agg(
        F.sum(F.col("cell_a") * F.col("cell_b")).cast("long").alias("ip")
    )
    per_row = rows.join(prod, "r", "left").select(
        "r", F.coalesce("ip", F.lit(0).cast("long")).alias("ip")
    )
    est = per_row.agg(F.min("ip").cast("long").alias("cms_join_estimate"))
    exact = (
        ev_keys.select(F.col("term"), F.col("cnt").alias("ca"))
        .join(ord_keys.select("term", F.col("cnt").alias("cb")), "term")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("long").alias("exact_join_size"))
    )
    sizes = ev_keys.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys_a")
    ).crossJoin(ord_keys.agg(F.count(F.lit(1)).cast("long").alias("n_keys_b")))
    return (
        sizes.crossJoin(exact)
        .crossJoin(est)
        .select(
            "n_keys_a", "n_keys_b", "exact_join_size", "cms_join_estimate",
            ((F.col("cms_join_estimate") - F.col("exact_join_size")) * 1000000)
            .cast("long").alias("overshoot_abs_x1m_raw"),
        )
        .select(
            "n_keys_a", "n_keys_b", "exact_join_size", "cms_join_estimate",
            F.expr("overshoot_abs_x1m_raw div exact_join_size").cast("long")
            .alias("overshoot_ppm"),
        )
    )


_SQL_CMS_JOIN = f"""
WITH ak AS (
  SELECT CAST(user_id AS VARCHAR) AS term, COUNT(*)::BIGINT AS cnt
  FROM events GROUP BY 1
),
bk AS (
  SELECT CAST(o_custkey AS VARCHAR) AS term, COUNT(*)::BIGINT AS cnt
  FROM orders GROUP BY 1
),
ca AS (
  SELECT r, c, SUM(cnt) AS cell_a FROM (
    SELECT cnt, r,
           {_sql_hex_int("CAST(r AS VARCHAR) || ':' || term", _CMS_HASH_DIGITS)} % {CMS_WIDTH} AS c
    FROM ak, unnest([{', '.join(str(i) for i in range(CMS_DEPTH))}]) AS u(r)
  ) GROUP BY r, c
),
cb AS (
  SELECT r, c, SUM(cnt) AS cell_b FROM (
    SELECT cnt, r,
           {_sql_hex_int("CAST(r AS VARCHAR) || ':' || term", _CMS_HASH_DIGITS)} % {CMS_WIDTH} AS c
    FROM bk, unnest([{', '.join(str(i) for i in range(CMS_DEPTH))}]) AS u(r)
  ) GROUP BY r, c
),
rows_d AS (SELECT unnest([{', '.join(str(i) for i in range(CMS_DEPTH))}]) AS r),
prod AS (
  SELECT ca.r, SUM(ca.cell_a * cb.cell_b) AS ip
  FROM ca JOIN cb ON ca.r = cb.r AND ca.c = cb.c
  GROUP BY ca.r
),
per_row AS (
  SELECT rows_d.r, COALESCE(prod.ip, 0) AS ip
  FROM rows_d LEFT JOIN prod ON prod.r = rows_d.r
),
est AS (SELECT CAST(MIN(ip) AS BIGINT) AS cms_join_estimate FROM per_row),
exact AS (
  SELECT CAST(SUM(ak.cnt * bk.cnt) AS BIGINT) AS exact_join_size
  FROM ak JOIN bk USING (term)
),
sizes AS (
  SELECT (SELECT COUNT(*) FROM ak)::BIGINT AS n_keys_a,
         (SELECT COUNT(*) FROM bk)::BIGINT AS n_keys_b
)
SELECT n_keys_a, n_keys_b, exact_join_size, cms_join_estimate,
       CAST((cms_join_estimate - exact_join_size) * 1000000 // exact_join_size
            AS BIGINT) AS overshoot_ppm
FROM sizes CROSS JOIN exact CROSS JOIN est
"""

PENDING_QUERIES["sketch_cms_join_size"] = sketch_cms_join_size
PENDING_ORACLE["sketch_cms_join_size"] = _SQL_CMS_JOIN


# --- seasonal-adjusted anomaly detection — PENDING round 7 ------------------
#
# The observability upgrade of ``events_anomaly_mad``: raw-value MAD
# flags every rush-hour spike; the production detector first removes the
# HOUR-OF-DAY baseline (per (type, hour) integer mean cents, a broadcast
# |types|x24 table) and runs the robust median/MAD gate on the
# RESIDUALS. Same no-doubles contract as the MAD row: residual medians
# on 2x half-units, MAD on 4x quarter-units, the 4.4478 cutoff as
# integer cross-multiplication. Plan: one broadcast join adds the
# baseline map-side, then the MAD row's two keyed rank aggs.


def events_anomaly_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").cast("long").alias("hour"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    base = ev.groupBy("event_type", "hour").agg(
        F.expr("sum(c) div count(1)").cast("long").alias("base")
    )
    d = ev.join(F.broadcast(base), ["event_type", "hour"]).select(
        "event_type", (F.col("c") - F.col("base")).alias("r")
    )
    w = Window.partitionBy("event_type").orderBy("r")
    rr = d.select(
        "*",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    med = rr.groupBy("event_type").agg(
        (
            F.sum(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("r")))
            + F.sum(F.when(F.col("rn") == F.expr("n div 2 + 1"), F.col("r")))
        ).cast("long").alias("med_hr")
    )
    dev = d.join(F.broadcast(med), "event_type").select(
        "event_type", "med_hr", F.abs(F.col("r") * 2 - F.col("med_hr")).alias("ad_hr")
    )
    w2 = Window.partitionBy("event_type").orderBy("ad_hr")
    r2 = dev.select(
        "*",
        F.row_number().over(w2).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    madf = r2.groupBy("event_type").agg(
        (
            F.sum(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("ad_hr")))
            + F.sum(F.when(F.col("rn") == F.expr("n div 2 + 1"), F.col("ad_hr")))
        ).cast("long").alias("mad_qr")
    )
    return (
        dev.join(F.broadcast(madf), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max("med_hr").alias("resid_median_halfcents"),
            F.max("mad_qr").alias("resid_mad_qcents"),
            F.sum(
                F.when(
                    F.col("ad_hr") * _MAD_DEN > F.col("mad_qr") * _MAD_NUM, 1
                ).otherwise(0)
            ).cast("long").alias("n_anomalies"),
        )
    )


_SQL_SEASONAL = f"""
WITH ev AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
base AS (
  SELECT event_type, hour, SUM(c) // COUNT(*) AS base
  FROM ev GROUP BY event_type, hour
),
d AS (
  SELECT ev.event_type, ev.c - base.base AS r
  FROM ev JOIN base USING (event_type, hour)
),
rr AS (
  SELECT event_type, r,
         row_number() OVER (PARTITION BY event_type ORDER BY r) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM d
),
med AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN r END)
              + SUM(CASE WHEN rn = n // 2 + 1 THEN r END) AS BIGINT) AS med_hr
  FROM rr GROUP BY event_type
),
dev AS (
  SELECT d.event_type, med.med_hr, abs(d.r * 2 - med.med_hr) AS ad_hr
  FROM d JOIN med USING (event_type)
),
r2 AS (
  SELECT event_type, med_hr, ad_hr,
         row_number() OVER (PARTITION BY event_type ORDER BY ad_hr) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM dev
),
madf AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN ad_hr END)
              + SUM(CASE WHEN rn = n // 2 + 1 THEN ad_hr END) AS BIGINT) AS mad_qr
  FROM r2 GROUP BY event_type
)
SELECT dev.event_type,
       COUNT(*) AS n_events,
       MAX(dev.med_hr) AS resid_median_halfcents,
       MAX(madf.mad_qr) AS resid_mad_qcents,
       CAST(SUM(CASE WHEN dev.ad_hr * {_MAD_DEN} > madf.mad_qr * {_MAD_NUM}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM dev JOIN madf USING (event_type)
GROUP BY dev.event_type
"""

PENDING_QUERIES["events_anomaly_seasonal"] = events_anomaly_seasonal
PENDING_ORACLE["events_anomaly_seasonal"] = _SQL_SEASONAL


# --- CMS width-sweep calibration — PENDING round 7 -----------------------------
#
# The sizing curve the quantile/LSH calibration rows have and CMS lacked:
# the same stream sketched at widths 64 / 256 / 1024 (depth fixed at
# CMS_DEPTH), scored on the top-CMS_SWEEP_K exact heavy hitters — exact
# count, estimate (min over depth rows), and the one-sided overestimate in
# ppm of the exact count. Overestimate shrinks ~linearly with width; the
# report makes the knee visible. Same salted-md5 cells as the production
# sketch, so every (width, term) estimate is engine-identical. Scale shape:
# per width one (r, c) counter aggregate over the vocab cells (vocab-grain,
# never token-grain) and a broadcast join of the 5-term probe set.

CMS_SWEEP_WIDTHS = [64, 256, 1024]
CMS_SWEEP_K = 5


def sketch_cms_error_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("text")
    vocab = cms_vocab(docs).persist()
    top = (
        vocab.orderBy(F.desc("cnt"), "term")
        .limit(CMS_SWEEP_K)
        .select(F.col("term").alias("t"), F.col("cnt").alias("exact_count"))
    )
    out = None
    for w in CMS_SWEEP_WIDTHS:
        cells = vocab.select(
            "term", "cnt",
            F.explode(F.array(*[F.lit(i) for i in range(CMS_DEPTH)])).alias("r"),
        ).withColumn(
            "c",
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("r").cast("string"), F.lit(":"), F.col("term"))),
                    1,
                    _CMS_HASH_DIGITS,
                ),
                16,
                10,
            ).cast("long")
            % w,
        )
        counters = cells.groupBy("r", "c").agg(F.sum("cnt").alias("cell"))
        est = (
            cells.join(F.broadcast(top), cells.term == top.t)
            .join(counters, ["r", "c"])
            .groupBy("term")
            .agg(
                F.min("cell").cast("long").alias("cms_count"),
                F.max("exact_count").cast("long").alias("exact_count"),
            )
        )
        row = est.select(
            F.lit(w).cast("long").alias("width"),
            "term", "exact_count", "cms_count",
            F.expr("(cms_count - exact_count) * 1000000 div exact_count")
            .cast("long")
            .alias("over_ppm"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def _sql_cms_sweep() -> str:
    from cdc_postgresql_clickhouse_spark.queries.dedup import _SQL_TOKENS

    blocks = []
    for w in CMS_SWEEP_WIDTHS:
        blocks.append(f"""
SELECT CAST({w} AS BIGINT) AS width, e.term, e.exact_count,
       e.cms_count,
       ((e.cms_count - e.exact_count) * 1000000 // e.exact_count)::BIGINT AS over_ppm
FROM (
  SELECT cl.term, MIN(co.cell)::BIGINT AS cms_count,
         MAX(tp.exact_count)::BIGINT AS exact_count
  FROM cells_{w} cl
  JOIN top tp ON tp.t = cl.term
  JOIN counters_{w} co ON co.r = cl.r AND co.c = cl.c
  GROUP BY cl.term
) e""")
    cell_ctes = ",\n".join(
        f"""cells_{w} AS (
  SELECT term, cnt, r,
         {_sql_hex_int("CAST(r AS VARCHAR) || ':' || term", _CMS_HASH_DIGITS)} % {w} AS c
  FROM vocab, unnest([{', '.join(str(i) for i in range(CMS_DEPTH))}]) AS u(r)
),
counters_{w} AS (
  SELECT r, c, SUM(cnt) AS cell FROM cells_{w} GROUP BY r, c
)"""
        for w in CMS_SWEEP_WIDTHS
    )
    return f"""
WITH vocab AS MATERIALIZED (
  SELECT t AS term, COUNT(*)::BIGINT AS cnt
  FROM (SELECT unnest({_SQL_TOKENS}) AS t FROM documents)
  GROUP BY 1
),
top AS MATERIALIZED (
  SELECT term AS t, cnt AS exact_count FROM vocab
  ORDER BY cnt DESC, term LIMIT {CMS_SWEEP_K}
),
{cell_ctes}
{' UNION ALL '.join(blocks)}
"""


PENDING_QUERIES["sketch_cms_error_sweep"] = sketch_cms_error_sweep
PENDING_ORACLE["sketch_cms_error_sweep"] = _sql_cms_sweep()


# --- KMV k-sweep calibration — PENDING round 7 ---------------------------------
#
# The distinct-count twin of the CMS width sweep: the same per-type user
# stream sketched at k = 16 / 64 / 256 minimum values, scored against the
# exact distinct count — estimate (the production (k−1)/v_k tail with the
# small-range exact branch) and |error| in ppm of the exact count, floored
# once on identical doubles. Error contracts ~1/√k; the report makes the
# knee visible next to the quantile and CMS calibration rows. Scale shape:
# per k one type-partitioned top-k-by-hash window over the DISTINCT hash
# table, then bounded type-grain scoring against one exact-distinct
# aggregate shared across all three k.

KMV_SWEEP_KS = [16, 64, 256]


def sketch_kmv_error_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    out = None
    for k in KMV_SWEEP_KS:
        est = sketch_kmv_distinct(spark, sf_dir, k=k).select(
            "event_type", F.col("kmv_estimate").alias("est")
        )
        row = est.join(F.broadcast(exact), "event_type").select(
            F.lit(k).cast("long").alias("k"),
            "event_type", "n_exact",
            F.col("est").alias("kmv_estimate"),
            F.floor(
                F.abs(F.col("est") - F.col("n_exact"))
                * F.lit(1000000.0)
                / F.col("n_exact")
            ).cast("long").alias("err_ppm"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def _sql_kmv_sweep() -> str:
    blocks = []
    for k in KMV_SWEEP_KS:
        blocks.append(f"""
SELECT CAST({k} AS BIGINT) AS k, per.event_type, x.n_exact,
       CAST(FLOOR(
         (CASE WHEN n_tracked < {k}
               THEN CAST(n_tracked AS DOUBLE)
               ELSE {float(k - 1)} / (CAST({_SQL_HEX12} AS BIGINT) / {_NORM!r})
          END) * 1000000.0) AS DOUBLE) / 1000000.0 AS kmv_estimate,
       CAST(FLOOR(ABS(
         CAST(FLOOR(
           (CASE WHEN n_tracked < {k}
                 THEN CAST(n_tracked AS DOUBLE)
                 ELSE {float(k - 1)} / (CAST({_SQL_HEX12} AS BIGINT) / {_NORM!r})
            END) * 1000000.0) AS DOUBLE) / 1000000.0
         - x.n_exact) * 1000000.0 / x.n_exact) AS BIGINT) AS err_ppm
FROM (
  SELECT event_type, COUNT(*) AS n_tracked,
         MAX(CASE WHEN rn = {k} THEN h END) AS h
  FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM hashed
  ) WHERE rn <= {k}
  GROUP BY event_type
) per
JOIN x ON x.event_type = per.event_type""")
    return f"""
WITH hashed AS MATERIALIZED (
  SELECT DISTINCT event_type,
         substring(md5(CAST(user_id AS VARCHAR)), 1, {_HEX_DIGITS}) AS h
  FROM events
),
x AS MATERIALIZED (
  SELECT event_type, COUNT(DISTINCT user_id)::BIGINT AS n_exact
  FROM events GROUP BY event_type
)
{' UNION ALL '.join(blocks)}
"""


PENDING_QUERIES["sketch_kmv_error_sweep"] = sketch_kmv_error_sweep
PENDING_ORACLE["sketch_kmv_error_sweep"] = _sql_kmv_sweep()


# --- Round-7 registration wave 1 ------------------------------------------
# Flip these pending rows into the driver contract: the r6 green rows freed
# window slots (rotation policy in COVERAGE.md; order in
# queries/__init__._WINDOW_FRONT). The functions above are unchanged — the
# flip only moves the (query, oracle) pair between registries.
_REGISTER_WAVE1 = (
    "events_cusum_changepoint",
    "events_holt_linear",
    "sketch_kmv_intersect",
    "sketch_cms_join_size",
    "events_anomaly_seasonal",
)
for _n in _REGISTER_WAVE1:
    QUERIES[_n] = PENDING_QUERIES.pop(_n)
    ORACLE[_n] = PENDING_ORACLE.pop(_n)
del _n


# --- KMV set-DIFFERENCE estimate (theta AnotB) — PENDING round 8+ -----------
#
# The last leg of the sketch set algebra after union (registered) and
# intersection (wave 1): est|A\B| from bottom-k states alone — the theta
# sketch's AnotB operation (Dasgupta et al., DataSketches). Under the
# UNION's threshold theta_U = h_k(A ∪ B), every tracked hash h < theta_U
# is below BOTH input thresholds (theta_U <= min(theta_A, theta_B), since
# the union keeps the k smallest of either side), so membership of h in
# each side's bottom-k state is an EXACT set query for these hashes:
# rho_{A\B} = |{h in K_U : h in A, h not in B}| / |K_U| estimates
# |A\B| / |A ∪ B|, and est|A\B| = rho_{A\B} × est_union. The three rho
# numerators PARTITION K_U (n_common + n_anotb + n_bnota = n_tracked —
# law-pinned), so the intersect and the two difference estimates sum to
# the union estimate exactly. Exact set differences ride along for the
# error columns. Sketch work is |types|·k rows; the corpus pays the same
# one distinct (type, hash) projection as every KMV row.


def sketch_theta_difference(
    spark: SparkSession, sf_dir: str, k: int = KMV_K
) -> DataFrame:
    from pyspark import StorageLevel

    ev = load_table(spark, sf_dir, "events")
    # same diamond-lineage persists as sketch_kmv_intersect (scan audit)
    hashed = ev.select(
        "event_type",
        F.substring(F.md5(F.col("user_id").cast("string")), 1, _HEX_DIGITS).alias("h"),
    ).distinct().persist(StorageLevel.MEMORY_AND_DISK)
    w = Window.partitionBy("event_type").orderBy("h")
    kstate = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("event_type", "h")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    types = hashed.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .join(types.select(F.col("event_type").alias("type_b")))
        .filter(F.col("type_a") < F.col("type_b"))
    )
    members = pairs.select(
        "type_a", "type_b", F.explode(F.array("type_a", "type_b")).alias("event_type")
    )
    merged = (
        members.join(kstate, "event_type").select("type_a", "type_b", "h").distinct()
    )
    wm = Window.partitionBy("type_a", "type_b").orderBy("h")
    ranked = merged.withColumn("rn", F.row_number().over(wm)).filter(F.col("rn") <= k)
    ka = kstate.select(F.col("event_type").alias("type_a"), "h", F.lit(1).alias("ia"))
    kb = kstate.select(F.col("event_type").alias("type_b"), "h", F.lit(1).alias("ib"))
    marked = (
        ranked.join(ka, ["type_a", "h"], "left")
        .join(kb, ["type_b", "h"], "left")
        .select(
            "type_a", "type_b", "rn", "h",
            F.coalesce("ia", F.lit(0)).alias("ia"),
            F.coalesce("ib", F.lit(0)).alias("ib"),
        )
    )
    per = marked.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_tracked"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("hk"),
        F.sum(F.when((F.col("ia") == 1) & (F.col("ib") == 0), 1).otherwise(0))
        .cast("long")
        .alias("n_anotb"),
        F.sum(F.when((F.col("ia") == 0) & (F.col("ib") == 1), 1).otherwise(0))
        .cast("long")
        .alias("n_bnota"),
    )
    vk = F.conv(F.col("hk"), 16, 10).cast("long") / F.lit(_NORM)
    est_union = F.when(
        F.col("n_tracked") < k, F.col("n_tracked").cast("double")
    ).otherwise(F.lit(float(k - 1)) / vk)
    frac = lambda c: F.col(c).cast("double") / F.col("n_tracked").cast("double")  # noqa: E731
    du = ev.select("event_type", "user_id").distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )
    da = du.groupBy(F.col("event_type").alias("type_a")).agg(
        F.count(F.lit(1)).cast("long").alias("n_a")
    )
    db = du.groupBy(F.col("event_type").alias("type_b")).agg(
        F.count(F.lit(1)).cast("long").alias("n_b")
    )
    ia2 = du.select(F.col("event_type").alias("type_a"), "user_id")
    ib2 = du.select(F.col("event_type").alias("type_b"), "user_id")
    exact_int = (
        pairs.join(ia2, "type_a")
        .join(ib2, ["type_b", "user_id"])
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_int"))
    )
    ex = (
        pairs.join(F.broadcast(da), "type_a")
        .join(F.broadcast(db), "type_b")
        .join(exact_int, ["type_a", "type_b"], "left")
        .select(
            "type_a", "type_b",
            (F.col("n_a") - F.coalesce("n_int", F.lit(0))).cast("long").alias(
                "n_exact_a_minus_b"
            ),
            (F.col("n_b") - F.coalesce("n_int", F.lit(0))).cast("long").alias(
                "n_exact_b_minus_a"
            ),
        )
    )
    t6 = lambda c: (F.floor(c * F.lit(1000000.0)).cast("double") / F.lit(1000000.0))  # noqa: E731
    return (
        per.join(ex, ["type_a", "type_b"])
        .select(
            "type_a", "type_b", "n_tracked", "n_anotb", "n_bnota",
            "n_exact_a_minus_b", "n_exact_b_minus_a",
            t6(frac("n_anotb") * est_union).alias("theta_a_minus_b_estimate"),
            t6(frac("n_bnota") * est_union).alias("theta_b_minus_a_estimate"),
        )
    )


_SQL_THETA_DIFF = f"""
WITH hashed AS (
  SELECT DISTINCT event_type,
         substring(md5(CAST(user_id AS VARCHAR)), 1, {_HEX_DIGITS}) AS h
  FROM events
),
kstate AS (
  SELECT event_type, h FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM hashed
  ) WHERE rn <= {KMV_K}
),
types AS (SELECT DISTINCT event_type FROM hashed),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM types a JOIN types b ON a.event_type < b.event_type
),
members AS (
  SELECT type_a, type_b, unnest([type_a, type_b]) AS event_type FROM pairs
),
merged AS (
  SELECT DISTINCT m.type_a, m.type_b, k.h
  FROM members m JOIN kstate k USING (event_type)
),
ranked AS (
  SELECT type_a, type_b, h,
         row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn
  FROM merged
  QUALIFY rn <= {KMV_K}
),
marked AS (
  SELECT r.type_a, r.type_b, r.rn, r.h,
         CASE WHEN ka.h IS NULL THEN 0 ELSE 1 END AS ia,
         CASE WHEN kb.h IS NULL THEN 0 ELSE 1 END AS ib
  FROM ranked r
  LEFT JOIN kstate ka ON ka.event_type = r.type_a AND ka.h = r.h
  LEFT JOIN kstate kb ON kb.event_type = r.type_b AND kb.h = r.h
),
per AS (
  SELECT type_a, type_b,
         COUNT(*) AS n_tracked,
         MAX(CASE WHEN rn = {KMV_K} THEN h END) AS h,
         SUM(CASE WHEN ia = 1 AND ib = 0 THEN 1 ELSE 0 END) AS n_anotb,
         SUM(CASE WHEN ia = 0 AND ib = 1 THEN 1 ELSE 0 END) AS n_bnota
  FROM marked GROUP BY type_a, type_b
),
du AS (SELECT DISTINCT event_type, user_id FROM events),
dc AS (SELECT event_type, COUNT(*) AS n FROM du GROUP BY 1),
exact_int AS (
  SELECT p.type_a, p.type_b, COUNT(*) AS n_int
  FROM pairs p
  JOIN du ua ON ua.event_type = p.type_a
  JOIN du ub ON ub.event_type = p.type_b AND ub.user_id = ua.user_id
  GROUP BY p.type_a, p.type_b
),
est AS (
  SELECT type_a, type_b, n_tracked, n_anotb, n_bnota,
         (CASE WHEN n_tracked < {KMV_K}
               THEN CAST(n_tracked AS DOUBLE)
               ELSE {float(KMV_K - 1)} / (CAST({_SQL_HEX12} AS BIGINT) / {_NORM!r})
          END) AS est_union
  FROM per
)
SELECT e.type_a, e.type_b,
       CAST(e.n_tracked AS BIGINT) AS n_tracked,
       CAST(e.n_anotb AS BIGINT) AS n_anotb,
       CAST(e.n_bnota AS BIGINT) AS n_bnota,
       CAST(da.n - COALESCE(xi.n_int, 0) AS BIGINT) AS n_exact_a_minus_b,
       CAST(db.n - COALESCE(xi.n_int, 0) AS BIGINT) AS n_exact_b_minus_a,
       CAST(FLOOR(CAST(e.n_anotb AS DOUBLE) / e.n_tracked * e.est_union
                  * 1000000.0) AS DOUBLE) / 1000000.0 AS theta_a_minus_b_estimate,
       CAST(FLOOR(CAST(e.n_bnota AS DOUBLE) / e.n_tracked * e.est_union
                  * 1000000.0) AS DOUBLE) / 1000000.0 AS theta_b_minus_a_estimate
FROM est e
JOIN dc da ON da.event_type = e.type_a
JOIN dc db ON db.event_type = e.type_b
LEFT JOIN exact_int xi ON xi.type_a = e.type_a AND xi.type_b = e.type_b
"""

PENDING_QUERIES["sketch_theta_difference"] = sketch_theta_difference
PENDING_ORACLE["sketch_theta_difference"] = _SQL_THETA_DIFF


# --- intersection estimator shoot-out — PENDING round 8+ ----------------------
#
# The eval row for the sketch set algebra (the ann_recall_report pattern):
# per type pair, the two sketch-only intersection estimators side by side
# against the exact answer —
# - KMV rho (registered ``sketch_kmv_intersect``, composed verbatim):
#   |K_U ∩ A ∩ B|/|K_U| × est_union;
# - HLL inclusion-exclusion: est(A) + est(B) − est(A ∪ B), where the union
#   sketch is the per-register MAX of the two register tables (the HLL
#   merge law) and each estimate is the registered estimator tail. The
#   textbook caveat this row measures: inclusion-exclusion compounds three
#   estimators' errors and can go NEGATIVE for small intersections
#   (clamped at 0), which is exactly why theta/KMV sketches exist.
# Sketch work is |types|·(k + M) rows; the corpus pays the same hashed
# projections the registered rows pay. Estimates are floored to 1e-6 once
# at the end; error columns are integer PPM against max(1, exact).


def _hll_est_over(regs: DataFrame, keys: list[str]):
    """The registered HLL estimator tail (hll_report), generic over the
    grouping keys, returning full-precision doubles for composition."""
    per = regs.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("registers_used"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_SUFFIX_BITS + 1} - mj)"))
        .cast("long").alias("s_used"),
    )
    two43 = 1 << (_HLL_SUFFIX_BITS + 1)
    s_int = F.col("s_used") + (F.lit(HLL_M) - F.col("registers_used")) * F.lit(two43)
    e_raw = F.lit(_HLL_ALPHA * HLL_M * HLL_M * float(two43)) / s_int.cast("double")
    zeros = F.lit(HLL_M) - F.col("registers_used")
    est = F.when(
        (e_raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double")),
    ).otherwise(e_raw)
    return per.select(*keys, est.alias("est"))


def sketch_intersection_method_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    regs = hll_registers(ev)
    per_type = _hll_est_over(regs, ["event_type"])
    types = regs.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .join(types.select(F.col("event_type").alias("type_b")))
        .filter(F.col("type_a") < F.col("type_b"))
    )
    members = pairs.select(
        "type_a", "type_b", F.explode(F.array("type_a", "type_b")).alias("event_type")
    )
    union_regs = (
        members.join(regs, "event_type")
        .groupBy("type_a", "type_b", "reg")
        .agg(F.max("mj").alias("mj"))
    )
    est_u = _hll_est_over(union_regs, ["type_a", "type_b"]).withColumnRenamed(
        "est", "est_u"
    )
    ea = per_type.select(F.col("event_type").alias("type_a"), F.col("est").alias("est_a"))
    eb = per_type.select(F.col("event_type").alias("type_b"), F.col("est").alias("est_b"))
    hll = (
        est_u.join(F.broadcast(ea), "type_a")
        .join(F.broadcast(eb), "type_b")
        .select(
            "type_a", "type_b",
            F.greatest(
                F.lit(0.0), F.col("est_a") + F.col("est_b") - F.col("est_u")
            ).alias("hll_ie_raw"),
        )
    )
    kmv = sketch_kmv_intersect(spark, sf_dir).select(
        "type_a", "type_b", "n_exact_intersect", "kmv_intersect_estimate"
    )
    t6 = lambda c: (F.floor(c * F.lit(1000000.0)).cast("double") / F.lit(1000000.0))  # noqa: E731
    err = lambda est: F.floor(  # noqa: E731
        F.abs(est - F.col("n_exact_intersect").cast("double"))
        * F.lit(1000000.0)
        / F.greatest(F.lit(1.0), F.col("n_exact_intersect").cast("double"))
    ).cast("long")
    return kmv.join(hll, ["type_a", "type_b"]).select(
        "type_a", "type_b", "n_exact_intersect",
        "kmv_intersect_estimate",
        t6(F.col("hll_ie_raw")).alias("hll_incl_excl_estimate"),
        err(F.col("kmv_intersect_estimate")).alias("kmv_err_ppm"),
        err(t6(F.col("hll_ie_raw"))).alias("hll_err_ppm"),
    )


def _sql_hll_est_over(regs_cte: str, keys: str) -> str:
    two43 = 1 << (_HLL_SUFFIX_BITS + 1)
    raw = f"{_HLL_ALPHA * HLL_M * HLL_M * float(two43)!r} / CAST(s_used + ({HLL_M} - registers_used) * {two43} AS DOUBLE)"
    return f"""
  SELECT {keys},
         (CASE WHEN {raw} <= {2.5 * HLL_M!r} AND {HLL_M} - registers_used > 0
               THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / CAST({HLL_M} - registers_used AS DOUBLE))
               ELSE {raw} END) AS est
  FROM (SELECT {keys}, COUNT(*) AS registers_used,
               SUM(CAST(POWER(2, {_HLL_SUFFIX_BITS + 1} - mj) AS BIGINT)) AS s_used
        FROM {regs_cte} GROUP BY {keys})
"""


_SQL_IE_ERR = (
    "CAST(FLOOR(abs({est} - CAST(n_exact_intersect AS DOUBLE)) * 1000000.0"
    " / GREATEST(1.0, CAST(n_exact_intersect AS DOUBLE))) AS BIGINT)"
)
_SQL_T6 = "CAST(FLOOR(({x}) * 1000000.0) AS DOUBLE) / 1000000.0"

_SQL_INTERSECT_METHODS = f"""
WITH hashed AS (
  SELECT event_type,
         {_sql_hex_int('CAST(user_id AS VARCHAR)', _HEX_DIGITS)} AS v
  FROM events
),
split AS (
  SELECT event_type,
         v // {1 << _HLL_SUFFIX_BITS} AS reg,
         v % {1 << _HLL_SUFFIX_BITS} AS w
  FROM hashed
),
regs AS (
  SELECT event_type, reg, MAX({_rho_case('w')}) AS mj
  FROM split GROUP BY event_type, reg
),
types AS (SELECT DISTINCT event_type FROM regs),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM types a JOIN types b ON a.event_type < b.event_type
),
members AS (
  SELECT type_a, type_b, unnest([type_a, type_b]) AS event_type FROM pairs
),
union_regs AS (
  SELECT m.type_a, m.type_b, r.reg, MAX(r.mj) AS mj
  FROM members m JOIN regs r USING (event_type)
  GROUP BY 1, 2, 3
),
est_t AS ({_sql_hll_est_over('regs', 'event_type')}),
est_u AS ({_sql_hll_est_over('union_regs', 'type_a, type_b')}),
hll AS (
  SELECT u.type_a, u.type_b,
         GREATEST(0.0, ea.est + eb.est - u.est) AS hll_ie_raw
  FROM est_u u
  JOIN est_t ea ON ea.event_type = u.type_a
  JOIN est_t eb ON eb.event_type = u.type_b
),
kmv AS (SELECT * FROM (
{_SQL_KMV_INTERSECT}
) _kmv)
SELECT k.type_a, k.type_b, k.n_exact_intersect,
       k.kmv_intersect_estimate,
       {_SQL_T6.format(x='h.hll_ie_raw')} AS hll_incl_excl_estimate,
       {_SQL_IE_ERR.format(est='k.kmv_intersect_estimate')} AS kmv_err_ppm,
       {_SQL_IE_ERR.format(est=_SQL_T6.format(x='h.hll_ie_raw'))} AS hll_err_ppm
FROM kmv k JOIN hll h ON h.type_a = k.type_a AND h.type_b = k.type_b
"""

PENDING_QUERIES["sketch_intersection_method_report"] = sketch_intersection_method_report
PENDING_ORACLE["sketch_intersection_method_report"] = _SQL_INTERSECT_METHODS


# --- Round-8 registration: the whole pending layer flips in ----------------
# VERDICT r7 #1: the driver's 50-row window gates which rows get CHECKED per
# round, not how many may be REGISTERED — holding locally hash-verified
# operators out of the contract understates coverage and risks rows never
# receiving a driver row. Window order lives in queries/__init__.
flip_pending(PENDING_QUERIES, PENDING_ORACLE, QUERIES, ORACLE)


# --- HLL precision sweep — round 10 -----------------------------------------
#
# The HLL half of the sketch-calibration family (CMS width sweep, KMV
# k-sweep above): the same per-type user stream sketched at m = 16 / 64 /
# 256 registers, scored against the exact distinct count. Error contracts
# ~1.04/sqrt(m); the report makes the memory/accuracy knee visible next to
# the KMV rows (HLL state is m 6-bit maxima vs KMV's k 48-bit hashes — the
# sweep is the evidence for choosing registers over order statistics at a
# given budget). Reference parity: ClickHouse exposes exactly this family
# as uniqHLL12/uniqCombined with fixed precisions; the sweep is how a
# deployment picks one.
#
# Scale shape: ONE events scan; the 48-bit hash fans out through a 3-row
# precision grid (explode of a literal array — no extra scan, no persist of
# corpus-grain state), and the per-(p, type, register) MAX partial-aggs
# map-side, so the single shuffle carries at most sum(m) = 336 rows per
# (type, partition) regardless of cardinality — the mergeable-sketch
# property the fixed-m query above pins, held across all three precisions.
#
# Determinism: register index = top-p bits, rho = (48-p)+1 - bitlen(suffix)
# with bitlen as ONE shared 48-arm integer CASE ladder (rho >= 1 because
# the suffix is < 2^(48-p)); the harmonic denominator is the exact integer
# sum(2^((48-p)+1-mj)) with empty registers contributing 2^((48-p)+1); the
# only floating point is alpha*m^2*2^(B+1)/S plus the standard
# linear-counting branch, micro-floored once on identical doubles (the
# proven sketch_hll_distinct device, parameterized by p).

HLL_SWEEP_PS = [4, 6, 8]
_HLL_TOTAL_BITS = _HEX_DIGITS * 4  # 48


def _bitlen_case(col: str, bits: int = _HLL_TOTAL_BITS) -> str:
    """Highest-set-bit position (bitlen(0) = 0) as an integer CASE ladder —
    one generated string, two engines; rho_B(w) = B + 1 - bitlen(w)."""
    arms = " ".join(
        f"WHEN {col} >= {1 << (bits - 1 - i)} THEN {bits - i}" for i in range(bits)
    )
    return f"(CASE {arms} ELSE 0 END)"


def sketch_hll_error_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hashed = ev.select(
        "event_type",
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, _HEX_DIGITS), 16, 10
        ).cast("long").alias("v"),
    )
    grid = hashed.select(
        "event_type", "v",
        F.explode(F.array(*[F.lit(p) for p in HLL_SWEEP_PS])).alias("p"),
    )
    suffix = f"(v % shiftleft(CAST(1 AS BIGINT), {_HLL_TOTAL_BITS} - p))"
    split = grid.select(
        "p", "event_type",
        F.expr(f"shiftright(v, {_HLL_TOTAL_BITS} - p)").alias("reg"),
        (
            F.lit(_HLL_TOTAL_BITS + 1) - F.col("p")
            - F.expr(_bitlen_case(suffix)).cast("int")
        ).cast("int").alias("rho"),
    )
    regs = split.groupBy("p", "event_type", "reg").agg(F.max("rho").alias("mj"))
    per = regs.groupBy("p", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("registers_used"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_TOTAL_BITS} + 1 - p - mj)")
        ).cast("long").alias("s_used"),
    )
    consts = spark.createDataFrame(
        [(p, 1 << p, 0.7213 / (1.0 + 1.079 / (1 << p))) for p in HLL_SWEEP_PS],
        "p int, m bigint, alpha double",
    )
    two_b1 = F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_TOTAL_BITS} + 1 - p)")
    j = per.join(F.broadcast(consts), "p")
    m_d = F.col("m").cast("double")
    s_int = F.col("s_used") + (F.col("m") - F.col("registers_used")) * two_b1
    e_raw = F.col("alpha") * m_d * m_d * two_b1.cast("double") / s_int.cast("double")
    zeros = F.col("m") - F.col("registers_used")
    est = F.when(
        (e_raw <= F.lit(2.5) * m_d) & (zeros > 0),
        m_d * F.log(m_d / zeros.cast("double")),
    ).otherwise(e_raw)
    t6 = F.floor(est * F.lit(1000000.0)).cast("double") / F.lit(1000000.0)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    return j.join(F.broadcast(exact), "event_type").select(
        F.col("p").cast("long").alias("p"),
        F.col("m").alias("m"),
        "event_type",
        "n_exact",
        "registers_used",
        t6.alias("hll_estimate"),
        F.floor(
            F.abs(t6 - F.col("n_exact").cast("double"))
            * F.lit(1000000.0) / F.col("n_exact").cast("double")
        ).cast("long").alias("err_ppm"),
    )


def _sql_hll_sweep() -> str:
    grid_rows = ", ".join(
        f"({p}, {1 << p}, {0.7213 / (1.0 + 1.079 / (1 << p))!r})"
        for p in HLL_SWEEP_PS
    )
    tb = _HLL_TOTAL_BITS
    suffix = f"(h.v % (CAST(1 AS BIGINT) << ({tb} - g.p)))"
    est = """(CASE WHEN e_raw <= 2.5 * CAST(m AS DOUBLE) AND m - registers_used > 0
              THEN CAST(m AS DOUBLE) * ln(CAST(m AS DOUBLE) / CAST(m - registers_used AS DOUBLE))
              ELSE e_raw END)"""
    t6 = f"CAST(FLOOR({est} * 1000000.0) AS DOUBLE) / 1000000.0"
    return f"""
WITH hashed AS MATERIALIZED (
  SELECT event_type,
         {_sql_hex_int('CAST(user_id AS VARCHAR)', _HEX_DIGITS)} AS v
  FROM events
),
grid AS (SELECT * FROM (VALUES {grid_rows}) AS t(p, m, alpha)),
split AS (
  SELECT g.p, g.m, g.alpha, h.event_type,
         h.v // (CAST(1 AS BIGINT) << ({tb} - g.p)) AS reg,
         CAST({tb} + 1 - g.p - {_bitlen_case(suffix)} AS INTEGER) AS rho
  FROM hashed h, grid g
),
regs AS (
  SELECT p, m, alpha, event_type, reg, MAX(rho) AS mj
  FROM split GROUP BY 1, 2, 3, 4, 5
),
per AS (
  SELECT p, m, alpha, event_type,
         CAST(COUNT(*) AS BIGINT) AS registers_used,
         CAST(SUM(CAST(1 AS BIGINT) << ({tb} + 1 - p - mj)) AS BIGINT) AS s_used
  FROM regs GROUP BY 1, 2, 3, 4
),
exact AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY 1
),
scored AS (
  SELECT p, m, event_type, registers_used,
         alpha * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)
           * CAST(CAST(1 AS BIGINT) << ({tb} + 1 - p) AS DOUBLE)
           / CAST(s_used + (m - registers_used) * (CAST(1 AS BIGINT) << ({tb} + 1 - p)) AS DOUBLE)
           AS e_raw
  FROM per
)
SELECT CAST(s.p AS BIGINT) AS p, CAST(s.m AS BIGINT) AS m, s.event_type,
       x.n_exact, s.registers_used,
       {t6} AS hll_estimate,
       CAST(FLOOR(ABS({t6} - CAST(x.n_exact AS DOUBLE))
                  * 1000000.0 / CAST(x.n_exact AS DOUBLE)) AS BIGINT) AS err_ppm
FROM scored s JOIN exact x ON x.event_type = s.event_type
"""


QUERIES["sketch_hll_error_sweep"] = sketch_hll_error_sweep
ORACLE["sketch_hll_error_sweep"] = _sql_hll_sweep()


# --- Bottom-k MinHash Jaccard error sweep — round 11 ---------------------------
#
# Completes the error-sweep family (bloom: FP rate, CMS: overcount, KMV/
# HLL: cardinality) with the estimator the DEDUP layer actually relies
# on: bottom-k (KMV) Jaccard (Broder 1997 / Bar-Yossef 2002 — hash the
# UNION of two sets, keep the k smallest, count how many live in both;
# E[matches/k] = J). Sets are the word-3-shingle vocabularies of ADJACENT
# sources in lexicographic order (19 pairs — linear fan-out, every source
# sits in at most 2 pairs; the all-pairs picture belongs to
# dedup_cross_source_matrix). Per (k, pair): exact Jaccard in ppm, the
# bottom-k estimate, and the absolute error — the curve that justifies
# MinHash signature sizes in dedup_minhash_lsh.
#
# Hash = md5 hex of the shingle, compared as a string: engine-identical,
# uniform, and already the house KMV device. Integer ppm throughout.
#
# Scale shape: one documents scan -> distinct (source, shingle) -> a
# 2-row bounded fan-out to (pair, side) -> per-pair membership rollup ->
# ONE ranking window per pair over union shingles. No joins beyond the
# 20-row broadcast rank table; no all-pairs blowup.

BOTTOMK_JACCARD_KS = (16, 64, 256)


def sketch_bottomk_jaccard_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_postgresql_clickhouse_spark.functions.text import tokens, word_shingles

    docs = load_table(spark, sf_dir, "documents")
    # Partition pinning: documents.parquet is 1-2 splits locally and AQE
    # coalesces a bare repartition's reader back to ONE task (tiny shuffle
    # bytes, heavy downstream CPU), so the shingle build ran serially —
    # 43 s at sf0.1. An RDD-materialized base (localCheckpoint) pins the
    # 32 partitions where a lazy repartition cannot. Ranks come from the
    # RAW source column (no shingle work), so the expensive shingle tree
    # below is consumed exactly once and needs no fence of its own.
    docs_p = docs.repartition(
        spark.sparkContext.defaultParallelism
    ).localCheckpoint(eager=True)
    ranks = (
        docs_p.select("source").distinct()
        .select(
            "source",
            F.row_number().over(Window.orderBy("source")).cast("long").alias("r"),
        )
    )
    sh = (
        docs_p.select("source", word_shingles(tokens(F.col("text"))).alias("shs"))
        .select("source", F.explode("shs").alias("sh"))
        .distinct()
    )
    # source with rank r is the LEFT member of pair r and the RIGHT member
    # of pair r-1; pair ids 1..n_sources-1. n_src rides as a broadcast
    # one-row aggregate — the first cut used an unpartitioned window
    # (rowsBetween over the whole frame), which funnels every row through
    # ONE task: 36.6 s at sf0.1 for what is otherwise a 1.5 s plan.
    nsrc = ranks.agg(F.max("r").alias("n_src"))
    sided = sh.join(F.broadcast(ranks), "source").select(
        "sh",
        F.col("r").alias("r"),
    )
    fan = sided.crossJoin(F.broadcast(nsrc)).select(
        "sh",
        F.explode(
            F.filter(
                F.array(
                    F.struct(F.col("r").alias("pair_id"), F.lit(1).alias("is_a")),
                    F.struct((F.col("r") - 1).alias("pair_id"), F.lit(0).alias("is_a")),
                ),
                lambda s: (s["pair_id"] >= 1) & (s["pair_id"] < F.col("n_src")),
            )
        ).alias("m"),
    ).select("sh", F.col("m.pair_id").alias("pair_id"), F.col("m.is_a").alias("is_a"))
    member = fan.groupBy("pair_id", "sh").agg(
        F.max("is_a").alias("in_a"),
        F.max(1 - F.col("is_a")).alias("in_b"),
    )
    w = Window.partitionBy("pair_id").orderBy(F.md5("sh"), "sh")
    ranked = member.withColumn("rn", F.row_number().over(w))
    per_pair = ranked.groupBy("pair_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_union"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_inter"),
        *[
            F.sum(
                F.when(F.col("rn") <= k, F.col("in_a") * F.col("in_b")).otherwise(0)
            ).cast("long").alias(f"m_{k}")
            for k in BOTTOMK_JACCARD_KS
        ],
    )
    arms = F.array(
        *[
            F.struct(F.lit(k).cast("long").alias("k"), F.col(f"m_{k}").alias("matches"))
            for k in BOTTOMK_JACCARD_KS
        ]
    )
    out = per_pair.select(
        "pair_id", "n_union", "n_inter", F.explode(arms).alias("a")
    )
    est = F.expr("a.matches * 1000000 div least(a.k, n_union)")
    exact = F.expr("n_inter * 1000000 div n_union")
    return out.select(
        F.col("a.k").alias("k"),
        F.col("pair_id").cast("long").alias("pair_id"),
        "n_union", "n_inter",
        exact.cast("long").alias("jaccard_exact_ppm"),
        est.cast("long").alias("jaccard_est_ppm"),
        F.abs(est - exact).cast("long").alias("abs_err_ppm"),
    )


def _sql_bottomk_jaccard() -> str:
    from cdc_postgresql_clickhouse_spark.queries.dedup import _SQL_TOKENS

    shingles = (
        "unnest(list_transform(range(1, len(toks) - 1), "
        "i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))"
    )
    marms = ",\n         ".join(
        f"SUM(CASE WHEN rn <= {k} THEN in_a * in_b ELSE 0 END)::BIGINT AS m_{k}"
        for k in BOTTOMK_JACCARD_KS
    )
    unions = " UNION ALL ".join(
        f"SELECT {k} AS k, pair_id, n_union, n_inter, m_{k} AS matches FROM per_pair"
        for k in BOTTOMK_JACCARD_KS
    )
    return f"""
WITH sh AS MATERIALIZED (
  SELECT DISTINCT source, sh FROM (
    SELECT source, {shingles} AS sh
    FROM (SELECT source, {_SQL_TOKENS} AS toks FROM documents)
  )
),
ranks AS (
  SELECT source, row_number() OVER (ORDER BY source)::BIGINT AS r
  FROM (SELECT DISTINCT source FROM sh)
),
ns AS (SELECT MAX(r) AS n_src FROM ranks),
fan AS (
  SELECT sh.sh, p.pair_id, p.is_a
  FROM sh JOIN ranks USING (source) CROSS JOIN ns,
       LATERAL (VALUES (r, 1), (r - 1, 0)) AS p(pair_id, is_a)
  WHERE p.pair_id >= 1 AND p.pair_id < ns.n_src
),
member AS MATERIALIZED (
  SELECT pair_id, sh, MAX(is_a) AS in_a, MAX(1 - is_a) AS in_b
  FROM fan GROUP BY 1, 2
),
ranked AS (
  SELECT pair_id, in_a, in_b,
         row_number() OVER (PARTITION BY pair_id ORDER BY md5(sh), sh) AS rn
  FROM member
),
per_pair AS MATERIALIZED (
  SELECT pair_id,
         COUNT(*)::BIGINT AS n_union,
         SUM(in_a * in_b)::BIGINT AS n_inter,
         {marms}
  FROM ranked GROUP BY pair_id
)
SELECT CAST(k AS BIGINT) AS k, CAST(pair_id AS BIGINT) AS pair_id,
       n_union, n_inter,
       (n_inter * 1000000 // n_union)::BIGINT AS jaccard_exact_ppm,
       (matches * 1000000 // LEAST(k, n_union))::BIGINT AS jaccard_est_ppm,
       ABS((matches * 1000000 // LEAST(k, n_union))
           - (n_inter * 1000000 // n_union))::BIGINT AS abs_err_ppm
FROM ({unions})
"""


QUERIES["sketch_bottomk_jaccard_sweep"] = sketch_bottomk_jaccard_sweep
ORACLE["sketch_bottomk_jaccard_sweep"] = _sql_bottomk_jaccard()
