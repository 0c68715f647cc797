"""Multimodal dataflow queries with DuckDB oracles: the Arrow/`mapInPandas`
decode / resize / frame-sample stages of ``operators/multimodal.py``, each
verified end-to-end against a pure-SQL twin.

Why an oracle is possible at all: the codec bodies are deterministic
byte-level fakes (the real Pillow/ffmpeg hooks are stubbed — not in this
container), and the fixture payloads are the documents' UTF-8 bytes, which
are pure ASCII at every SF (asserted in tests) — so byte arithmetic equals
character arithmetic and DuckDB can replay the exact same math in SQL.
That makes these rows the *strong* form of the multimodal claim: the
driver's value-hash compare certifies that bytes moved through Arrow into
Python, were transformed, and came back bit-identical to the declared
semantics — not merely that a schema existed. Swapping a real codec in
changes one function per modality and drops only the oracle, not the test
harness.

Scale shape: every stage is a single `mapInPandas` pass — Arrow batches,
no shuffle, partitioning preserved; metadata-only predicates prune before
bytes are ever read (see `multimodal_binary_meta` in queries/text.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_postgresql_clickhouse_spark.operators.multimodal import (
    audio_frames,
    blob_table,
    decode_blobs,
    resize_blobs,
    sample_frames,
)
from cdc_postgresql_clickhouse_spark.sources.registry import load_table


def _blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return blob_table(load_table(spark, sf_dir, "documents").select("doc_id", "text"))


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling through the real mapInPandas dataflow: up to 8 frames
    of 64 payload bytes each, one md5 per frame."""
    return sample_frames(_blobs(spark, sf_dir), every_n_bytes=64, max_frames=8)


def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode through mapInPandas, then reduce the float feature vector to
    engine-exact integers: (width, height, channels) from the fake decoder
    and the argmax bin of the byte-histogram feature (ties -> smallest bin;
    distinct histogram counts differ by >= 1/len >> float32 eps, so the
    rounded-float argmax equals the integer-count argmax)."""
    dec = decode_blobs(_blobs(spark, sf_dir))
    return dec.select(
        "doc_id",
        "format",
        "width",
        "height",
        "channels",
        (F.array_position(F.col("feature"), F.array_max("feature")) - 1)
        .cast("int")
        .alias("feature_argmax"),
    )


def multimodal_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-stride resize through mapInPandas: the stand-in for pixel
    resampling keeps every stride-th byte up to the 64-byte budget; output
    is the resized payload's md5 + size (the dedup-after-resize shape)."""
    return resize_blobs(_blobs(spark, sf_dir), target_w=64, target_h=64)


def multimodal_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio framing through mapInPandas: 'wav' blobs windowed into
    32-sample frames with per-frame RMS energy. Metadata-first pruning: the
    format predicate runs JVM-side BEFORE any payload enters Python. The
    operator's real path decodes RIFF WAV via stdlib ``wave`` (unit-tested
    with a synthesized file); the fixture's UTF-8 payloads take the
    deterministic 8-bit-PCM fake the oracle replays."""
    wav = _blobs(spark, sf_dir).filter(F.col("format") == "wav")
    return audio_frames(wav)


# audio_frames first: never driver-checked yet, and the registry window is
# position-sensitive (rotation policy rule 2 — see queries/__init__.py)
QUERIES = {
    "multimodal_audio_frames": multimodal_audio_frames,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_decode_stats": multimodal_decode_stats,
    "multimodal_resize_stats": multimodal_resize_stats,
}

# hex-nibble value of md5 char i (1-based) — engine-portable digest-byte math
def _nib(h: str, i: int) -> str:
    return f"(instr('0123456789abcdef', substring({h}, {i}, 1)) - 1)"


def _digest_byte(h: str, byte_idx: int) -> str:
    # md5 digest byte b = int(hex[2b:2b+2], 16)
    return f"({_nib(h, 2 * byte_idx + 1)} * 16 + {_nib(h, 2 * byte_idx + 2)})"


ORACLE = {
    "multimodal_frame_sample": """
WITH d AS (
  SELECT doc_id, text,
         least(8, greatest(1, length(text) // 64)) AS nf
  FROM documents
),
fr AS (SELECT doc_id, text, unnest(range(nf)) AS i FROM d)
SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
       md5(substring(text, CAST(i * 64 + 1 AS INT), 64)) AS frame_md5
FROM fr
""",
    "multimodal_decode_stats": f"""
WITH d AS (SELECT doc_id, text, length(text) AS nb, md5(text) AS h FROM documents),
meta AS (
  SELECT doc_id,
         CASE nb % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS format,
         CAST(64 + {_digest_byte('h', 0)} % 192 AS INTEGER) AS width,
         CAST(64 + {_digest_byte('h', 1)} % 192 AS INTEGER) AS height,
         CAST(3 AS INTEGER) AS channels
  FROM d
),
chars AS (SELECT doc_id, text, unnest(range(nb)) AS i FROM d),
hist AS (
  SELECT doc_id, ascii(substring(text, CAST(i + 1 AS INT), 1)) % 16 AS k, COUNT(*) AS c
  FROM chars GROUP BY 1, 2
),
am AS (
  SELECT doc_id, CAST(MIN(k) AS INTEGER) AS feature_argmax
  FROM (SELECT doc_id, k, c, MAX(c) OVER (PARTITION BY doc_id) AS mc FROM hist)
  WHERE c = mc GROUP BY doc_id
)
SELECT m.doc_id, m.format, m.width, m.height, m.channels, a.feature_argmax
FROM meta m JOIN am a ON a.doc_id = m.doc_id
""",
    # data[::stride][:64] for stride = max(len // 64, 1): characters at
    # positions 0, stride, 2*stride, ... — md5 of their in-order concatenation
    "multimodal_resize_stats": """
WITH d AS (
  SELECT doc_id, text, length(text) AS nb,
         greatest(length(text) // 64, 1) AS stride
  FROM documents
),
n AS (
  SELECT doc_id, text, stride,
         least((nb + stride - 1) // stride, 64) AS n_out
  FROM d
),
picks AS (SELECT doc_id, text, stride, n_out, unnest(range(n_out)) AS i FROM n),
agg AS (
  SELECT doc_id,
         md5(string_agg(substring(text, CAST(i * stride + 1 AS INT), 1), '' ORDER BY i)) AS resized_md5,
         CAST(MAX(n_out) AS BIGINT) AS resized_bytes
  FROM picks GROUP BY doc_id
)
SELECT doc_id, CAST(64 AS INTEGER) AS width, CAST(64 AS INTEGER) AS height,
       resized_md5, resized_bytes
FROM agg
""",
}

# fake 8-bit-PCM framing: sample = byte - 128 (ASCII text ⇒ byte = code
# point); integer sum-of-squares per frame, then one sqrt + FLOOR-truncate —
# the exact double ops the Python fake performs
ORACLE["multimodal_audio_frames"] = """
WITH d AS (
  SELECT doc_id, text, length(text) AS nb
  FROM documents WHERE length(text) % 3 = 2
),
fr AS (
  SELECT doc_id, text, nb, unnest(range(CAST(ceil(nb / 32.0) AS BIGINT))) AS j
  FROM d
),
sl AS (
  SELECT doc_id, CAST(j AS INTEGER) AS frame_idx,
         list_transform(
           list_filter(str_split(substring(text, CAST(j * 32 + 1 AS INT), 32), ''), c -> c <> ''),
           c -> ascii(c) - 128) AS s
  FROM fr
)
SELECT doc_id, frame_idx,
       CAST(len(s) AS INTEGER) AS n_samples,
       FLOOR(sqrt(CAST(list_reduce(list_transform(s, x -> x * x), (a, b) -> a + b) AS DOUBLE) / len(s)) * 1000000.0) / 1000000.0 AS rms
FROM sl
WHERE len(s) > 0
"""


# --- perceptual-hash near-dup over the multimodal payloads ------------------
#
# Image-style near-duplicate detection through the REAL Arrow dataflow: the
# dedup fixture corpus (originals + derived near-copies) becomes binary
# payloads, a mapInPandas stage computes a 60-bit perceptual hash
# (byte-histogram aHash — the codec-agnostic plumbing a decoded-pixel aHash
# would use), and the signature feeds the SAME banding/verify machinery as
# the text SimHash (4 x 15-bit bands, Hamming <= threshold). The oracle
# replays the byte math in SQL (ASCII fixture ⇒ chars are bytes), so the
# driver hash-verifies bytes -> Arrow -> Python -> signature -> self-join
# end-to-end. Near-copies differ by a removed first token, so histograms
# differ by a few counts -> small Hamming distances by construction.
#
# Scope: the registered form matches INGESTED payloads (the derived copies)
# against the CATALOG (originals) — the copy-detection direction — rather
# than all-pairs. On this TEXT stand-in corpus the byte histogram barely
# discriminates between unrelated documents (same-language letter
# frequencies), so all-pairs banding would degenerate toward cross-join; on
# real decoded pixels the 8x8 aHash is discriminative and all-pairs banding
# blocks properly. The catalog×ingest join keeps the fixture run honest:
# candidates are |catalog-bucket| x |ingest-bucket|, and the Hamming verify
# still has both true copies and false candidates to separate.

PHASH_HAMMING_MAX = 4
PHASH_SCOPE_IDS = 300
PHASH_BANDS = 4


def _phash_band_width() -> int:
    from cdc_postgresql_clickhouse_spark.operators.multimodal import PHASH_BITS

    assert PHASH_BITS % PHASH_BANDS == 0
    return PHASH_BITS // PHASH_BANDS


def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from cdc_postgresql_clickhouse_spark.operators.multimodal import (
        perceptual_hash,
    )
    from cdc_postgresql_clickhouse_spark.queries.dedup import (
        DERIVED_OFFSET,
        _corpus,
    )

    corpus = _corpus(spark, sf_dir).filter(
        (F.col("doc_id") < PHASH_SCOPE_IDS) | (F.col("doc_id") >= DERIVED_OFFSET)
    )
    # n_bytes > 0: the oracle's unnest(range(nb)) drops empty docs entirely,
    # so a zero-length payload must not contribute a sig=0 row here either
    # (ADVICE r4) — and a 0-byte blob has no histogram to hash anyway.
    blobs = blob_table(corpus).filter(F.col("n_bytes") > 0)
    width = _phash_band_width()
    mask = (1 << width) - 1
    sigs = perceptual_hash(blobs)
    banded = (
        sigs.withColumn("band", F.explode(F.sequence(F.lit(0), F.lit(PHASH_BANDS - 1))))
        .withColumn("bv", F.expr(f"shiftright(phash, CAST(band * {width} AS INT)) & {mask}"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a = banded.filter(F.col("doc_id") < DERIVED_OFFSET).alias("a")
    b = banded.filter(F.col("doc_id") >= DERIVED_OFFSET).alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bv") == F.col("b.bv")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("CAST(bit_count(a.phash ^ b.phash) AS BIGINT)").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= PHASH_HAMMING_MAX)
    )


def _sql_phash() -> str:
    from cdc_postgresql_clickhouse_spark.operators.multimodal import PHASH_BITS
    from cdc_postgresql_clickhouse_spark.queries.dedup import _SQL_CORPUS, DERIVED_OFFSET

    width = _phash_band_width()
    mask = (1 << width) - 1
    return f"""
WITH corpus AS ({_SQL_CORPUS}),
scoped AS (
  SELECT doc_id, text FROM corpus
  WHERE doc_id < {PHASH_SCOPE_IDS} OR doc_id >= {DERIVED_OFFSET}
),
d AS (SELECT doc_id, text, length(text) AS nb FROM scoped),
chars AS (SELECT doc_id, nb, unnest(range(nb)) AS i FROM d),
hist AS (
  SELECT c.doc_id, MAX(c.nb) AS nb,
         ord(substring(d.text, CAST(c.i AS INT) + 1, 1)) % {PHASH_BITS} AS bin,
         COUNT(*) AS cnt
  FROM chars c JOIN d ON d.doc_id = c.doc_id
  GROUP BY c.doc_id, bin
),
fp AS (
  SELECT doc_id,
         SUM(CASE WHEN cnt * {PHASH_BITS} > nb
                  THEN (CAST(1 AS BIGINT) << CAST(bin AS INT)) ELSE 0 END) AS phash
  FROM hist GROUP BY doc_id
),
banded AS (
  SELECT doc_id, phash, band, (phash >> CAST(band * {width} AS INT)) & {mask} AS bv
  FROM fp, (SELECT unnest(range({PHASH_BANDS})) AS band)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
FROM banded a
JOIN banded b ON a.band = b.band AND a.bv = b.bv
WHERE a.doc_id < {DERIVED_OFFSET} AND b.doc_id >= {DERIVED_OFFSET}
  AND bit_count(xor(a.phash, b.phash)) <= {PHASH_HAMMING_MAX}
"""


QUERIES["multimodal_phash_neardup"] = multimodal_phash_neardup
ORACLE["multimodal_phash_neardup"] = _sql_phash()


# --- Aspect-ratio bucketing — round 10 ---------------------------------------
#
# The vision-training batching staple (SDXL-style bucketed sampling): every
# decoded image is assigned to the nearest bucket from a fixed aspect-ratio
# ladder, and the report shows how the corpus distributes over buckets and
# how much canvas each bucket wastes — per image, the letterbox waste of
# fitting its aspect inside the bucket's (1e6 - fill ppm, where fill is the
# smaller/larger ratio quotient). Training loaders consume exactly this
# table to size per-bucket batches and to decide whether the ladder needs
# more rungs.
#
# Spark side runs the REAL decode dataflow (Arrow mapInPandas, same stage
# the decode-stats query audits) — the oracle replays the fake codec's
# width/height byte math in SQL (md5 digest bytes 0/1), so the driver
# hash-verifies bytes -> Python -> dims -> bucket assignment end-to-end.
#
# Scale shape: decode is a no-shuffle mapInPandas pass; bucket assignment
# is a broadcast join against the 7-rung literal ladder + one per-doc
# lexicographic MIN (map-side combinable); the report is a 7-row rollup.
# Integer milli/ppm arithmetic throughout; ties on |ratio - rung| break to
# the smaller rung on both engines.

AR_LADDER = [(1, 2), (9, 16), (3, 4), (1, 1), (4, 3), (16, 9), (2, 1)]


def multimodal_aspect_ratio_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec = decode_blobs(_blobs(spark, sf_dir)).select(
        "doc_id",
        F.expr("width * 1000 div height").cast("long").alias("ratio_milli"),
    )
    ladder = spark.createDataFrame(
        [(w, h, w * 1000 // h) for w, h in AR_LADDER],
        "bucket_w int, bucket_h int, bucket_milli bigint",
    )
    assigned = (
        dec.join(F.broadcast(ladder))
        .groupBy("doc_id", "ratio_milli")
        .agg(
            F.min(
                F.struct(
                    F.abs(F.col("ratio_milli") - F.col("bucket_milli")).alias("d"),
                    F.col("bucket_milli").alias("bm"),
                    F.col("bucket_w").alias("bw"),
                    F.col("bucket_h").alias("bh"),
                )
            ).alias("pick")
        )
        .select(
            "doc_id", "ratio_milli",
            F.col("pick.bm").alias("bucket_milli"),
            F.col("pick.bw").alias("bucket_w"),
            F.col("pick.bh").alias("bucket_h"),
        )
    )
    fill = F.when(
        F.col("ratio_milli") <= F.col("bucket_milli"),
        F.expr("ratio_milli * 1000000 div bucket_milli"),
    ).otherwise(F.expr("bucket_milli * 1000000 div ratio_milli"))
    per = assigned.withColumn("waste_ppm", F.lit(1000000) - fill).groupBy(
        "bucket_w", "bucket_h", "bucket_milli"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_images"),
        F.expr("sum(waste_ppm) div count(1)").cast("long").alias("mean_waste_ppm"),
    )
    total = per.agg(F.sum("n_images").alias("nt"))
    return per.join(F.broadcast(total)).select(
        F.col("bucket_w").cast("long").alias("bucket_w"),
        F.col("bucket_h").cast("long").alias("bucket_h"),
        "bucket_milli", "n_images",
        F.expr("n_images * 1000000 div nt").cast("long").alias("share_ppm"),
        "mean_waste_ppm",
    )


def _sql_ar_buckets() -> str:
    ladder_rows = ", ".join(f"({w}, {h}, {w * 1000 // h})" for w, h in AR_LADDER)
    hx = "md5(text)"
    return f"""
WITH dims AS (
  SELECT doc_id,
         64 + {_digest_byte(hx, 0)} % 192 AS width,
         64 + {_digest_byte(hx, 1)} % 192 AS height
  FROM documents
),
ratio AS (SELECT doc_id, (width * 1000 // height)::BIGINT AS ratio_milli FROM dims),
ladder AS (SELECT * FROM (VALUES {ladder_rows}) AS t(bucket_w, bucket_h, bucket_milli)),
assigned AS (
  SELECT doc_id, ratio_milli, bucket_milli, bucket_w, bucket_h FROM (
    SELECT r.*, l.*,
           row_number() OVER (
             PARTITION BY r.doc_id
             ORDER BY ABS(r.ratio_milli - l.bucket_milli), l.bucket_milli
           ) AS rn
    FROM ratio r, ladder l
  ) WHERE rn = 1
),
per AS (
  SELECT bucket_w, bucket_h, bucket_milli,
         COUNT(*)::BIGINT AS n_images,
         (SUM(1000000 - CASE WHEN ratio_milli <= bucket_milli
                             THEN ratio_milli * 1000000 // bucket_milli
                             ELSE bucket_milli * 1000000 // ratio_milli END)
          // COUNT(*))::BIGINT AS mean_waste_ppm
  FROM assigned GROUP BY 1, 2, 3
)
SELECT CAST(bucket_w AS BIGINT) AS bucket_w, CAST(bucket_h AS BIGINT) AS bucket_h,
       bucket_milli, n_images,
       (n_images * 1000000 // (SELECT SUM(n_images) FROM per))::BIGINT AS share_ppm,
       mean_waste_ppm
FROM per
"""


QUERIES["multimodal_aspect_ratio_buckets"] = multimodal_aspect_ratio_buckets
ORACLE["multimodal_aspect_ratio_buckets"] = _sql_ar_buckets()


# --- Perceptual-hash hamming-radius sweep — round 10 (session 2) ---------------
#
# The dedup-ROI curve for the image modality: pair volume and source-doc
# coverage at each hamming radius over the SAME banded candidate set as
# multimodal_phash_neardup. The sweep stops at PHASH_BANDS - 1: with B
# bands, pigeonhole guarantees a shared band only for hamming <= B - 1,
# so those radii are EXACT counts — radius B (= PHASH_HAMMING_MAX here)
# can drop a pair whose differing bits fall one per band and is excluded
# rather than reported as exact. The curve reads how aggressively an
# image-dedup threshold trades precision for recall, the phash twin of
# dedup_roi_curve.
#
# Scale shape: the audited banded-join plan once, then a |radii|-row
# literal-grid rollup of its (already tiny) pair output.

PHASH_SWEEP_RADII = tuple(range(min(PHASH_HAMMING_MAX, PHASH_BANDS - 1) + 1))


def multimodal_phash_hamming_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = multimodal_phash_neardup(spark, sf_dir)
    grid = pairs.select(
        "doc_a", "hamming",
        F.explode(F.array(*[F.lit(r) for r in PHASH_SWEEP_RADII])).alias("radius"),
    ).filter(F.col("hamming") <= F.col("radius"))
    return grid.groupBy("radius").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.countDistinct("doc_a").cast("long").alias("n_src_docs"),
    ).select(F.col("radius").cast("long").alias("radius"), "n_pairs", "n_src_docs")


def _sql_phash_sweep() -> str:
    radii = ", ".join(str(r) for r in PHASH_SWEEP_RADII)
    return f"""
WITH pairs AS MATERIALIZED ({ORACLE["multimodal_phash_neardup"]})
SELECT CAST(radius AS BIGINT) AS radius,
       COUNT(*)::BIGINT AS n_pairs,
       COUNT(DISTINCT doc_a)::BIGINT AS n_src_docs
FROM pairs, (SELECT unnest([{radii}]) AS radius)
WHERE hamming <= radius
GROUP BY radius
"""


QUERIES["multimodal_phash_hamming_sweep"] = multimodal_phash_hamming_sweep
ORACLE["multimodal_phash_hamming_sweep"] = _sql_phash_sweep()


# --- Exact binary dedup savings report — round 11 ------------------------------
#
# The storage-planning view of the multimodal table that the text-side
# dedup family (dedup_exact on normalized text) does not give: exact
# BYTE-level duplicate groups keyed by content_md5 within each sniffed
# format, and what deleting all-but-one copy of each group saves. This is
# the first pass every multimodal ingest runs — identical payloads arrive
# repeatedly via re-crawls and mirrors, and byte-exact dedup is free
# (hash + groupBy) relative to the perceptual pass (multimodal_phash_*)
# that follows it. Per format: object/byte counts, duplicate-group
# profile, and savings in bytes and ppm. The duplicate payload mass uses
# each group's OWN byte size (payloads in one md5 group have equal size
# by construction — pinned via max=min in the group fold).
#
# Scale shape: one scan of (format, md5, n_bytes) metadata — the payload
# column is PRUNED from the plan (metadata-only predicate, the module's
# north star) -> groupBy(md5) -> bounded per-format fold. No byte
# movement at all.

def multimodal_bytes_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    blobs = _blobs(spark, sf_dir).select("format", "content_md5", "n_bytes")
    groups = blobs.groupBy("format", "content_md5").agg(
        F.count(F.lit(1)).cast("long").alias("copies"),
        F.max("n_bytes").cast("long").alias("sz"),
    )
    return groups.groupBy("format").agg(
        F.sum("copies").cast("long").alias("n_objects"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.col("copies") * F.col("sz")).cast("long").alias("total_bytes"),
        F.sum(F.when(F.col("copies") > 1, 1).otherwise(0)).cast("long")
        .alias("dup_groups"),
        F.sum((F.col("copies") - 1) * F.col("sz")).cast("long")
        .alias("reclaimable_bytes"),
    ).select(
        "format", "n_objects", "n_distinct", "total_bytes", "dup_groups",
        "reclaimable_bytes",
        # NULL-on-undefined (ADVICE r11): a format bucket of zero-length
        # payloads would divide by zero — guard like the kappa family.
        F.expr(
            "CASE WHEN total_bytes > 0"
            " THEN reclaimable_bytes * 1000000 div total_bytes END"
        ).cast("long").alias("savings_ppm"),
    )


ORACLE["multimodal_bytes_dedup_report"] = """
WITH blobs AS (
  SELECT CASE WHEN LENGTH(text) % 3 = 0 THEN 'png'
              WHEN LENGTH(text) % 3 = 1 THEN 'jpeg'
              ELSE 'wav' END AS format,
         md5(text) AS content_md5,
         LENGTH(text)::BIGINT AS n_bytes
  FROM documents
),
groups AS (
  SELECT format, content_md5, COUNT(*)::BIGINT AS copies,
         MAX(n_bytes)::BIGINT AS sz
  FROM blobs GROUP BY 1, 2
)
SELECT format,
       SUM(copies)::BIGINT AS n_objects,
       COUNT(*)::BIGINT AS n_distinct,
       SUM(copies * sz)::BIGINT AS total_bytes,
       SUM(CASE WHEN copies > 1 THEN 1 ELSE 0 END)::BIGINT AS dup_groups,
       SUM((copies - 1) * sz)::BIGINT AS reclaimable_bytes,
       (CASE WHEN SUM(copies * sz) > 0
             THEN SUM((copies - 1) * sz) * 1000000 // SUM(copies * sz)
        END)::BIGINT AS savings_ppm
FROM groups GROUP BY format
"""
QUERIES["multimodal_bytes_dedup_report"] = multimodal_bytes_dedup_report


# --- Silence segmentation (VAD front-end) — round 11 ---------------------------
#
# The segmentation step every audio pipeline runs after framing
# (multimodal_audio_frames): frames below an RMS energy gate are
# "silence", and CONTIGUOUS silent runs — the gaps-and-islands device,
# islands keyed by frame_idx minus the silent-frame rank — become the
# segments a VAD would cut, yielding per-clip structure: segment count,
# longest pause, silence share. Splitting long audio on silence is how
# training clips are actually minted from raw recordings. The gate
# (44.0, between the fixture's Q1 and median) keeps both classes
# populated; rms is already the floored-micro double the frames oracle
# pins, so the comparison is engine-exact.
#
# Scale shape: the audio mapInPandas pass (format-pruned JVM-side), then
# ONE window pair partitioned by doc — frames per doc are bounded by
# payload bytes / frame length, so the window state is clip-local.

SILENCE_RMS = 44.0


def multimodal_silence_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    fr = multimodal_audio_frames(spark, sf_dir).select(
        "doc_id", "frame_idx", (F.col("rms") < F.lit(SILENCE_RMS)).alias("silent")
    )
    wd = Window.partitionBy("doc_id").orderBy("frame_idx")
    runs = fr.withColumn(
        "grp",
        F.col("frame_idx")
        - F.sum(F.col("silent").cast("int")).over(wd)
        + F.lit(1),
    )
    segs = (
        runs.filter(F.col("silent"))
        .groupBy("doc_id", "grp")
        .agg(F.count(F.lit(1)).cast("long").alias("run_len"))
    )
    per_doc = fr.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        F.sum(F.col("silent").cast("long")).cast("long").alias("n_silent"),
    )
    seg_stats = segs.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.max("run_len").cast("long").alias("longest_run"),
    )
    return per_doc.join(seg_stats, "doc_id", "left").select(
        "doc_id", "n_frames", "n_silent",
        F.coalesce("n_segments", F.lit(0)).cast("long").alias("n_segments"),
        F.coalesce("longest_run", F.lit(0)).cast("long").alias("longest_run"),
        F.expr("n_silent * 1000000 div n_frames").cast("long").alias("silence_ppm"),
    )


_SQL_AUDIO_FRAMES_BASE = ORACLE["multimodal_audio_frames"]

ORACLE["multimodal_silence_segments"] = f"""
WITH frames AS MATERIALIZED ({_SQL_AUDIO_FRAMES_BASE}),
flagged AS (
  SELECT doc_id, frame_idx, (rms < {SILENCE_RMS!r}) AS silent FROM frames
),
runs AS (
  SELECT doc_id, frame_idx, silent,
         frame_idx - SUM(CASE WHEN silent THEN 1 ELSE 0 END) OVER (
           PARTITION BY doc_id ORDER BY frame_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1 AS grp
  FROM flagged
),
segs AS (
  SELECT doc_id, grp, COUNT(*)::BIGINT AS run_len
  FROM runs WHERE silent GROUP BY 1, 2
),
per_doc AS (
  SELECT doc_id, COUNT(*)::BIGINT AS n_frames,
         SUM(CASE WHEN silent THEN 1 ELSE 0 END)::BIGINT AS n_silent
  FROM flagged GROUP BY doc_id
),
seg_stats AS (
  SELECT doc_id, COUNT(*)::BIGINT AS n_segments, MAX(run_len)::BIGINT AS longest_run
  FROM segs GROUP BY doc_id
)
SELECT p.doc_id, p.n_frames, p.n_silent,
       COALESCE(s.n_segments, 0)::BIGINT AS n_segments,
       COALESCE(s.longest_run, 0)::BIGINT AS longest_run,
       (p.n_silent * 1000000 // p.n_frames)::BIGINT AS silence_ppm
FROM per_doc p LEFT JOIN seg_stats s USING (doc_id)
"""
QUERIES["multimodal_silence_segments"] = multimodal_silence_segments
