package graft.queries

import graft.Tables
import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column query surface (training-data-pipeline operators).
  *
  * The fixtures carry no binary media, so payloads are fabricated from
  * `documents.text` (utf-8 bytes) — which makes the metadata path fully
  * oracle-checkable: byte length, content hash, and the stub decoder's
  * deterministic frame fan-out are all ANSI-SQL-expressible in DuckDB
  * (`encode(text)` gives the identical blob). The decode itself is the
  * clearly-marked stub seam in [[graft.operators.Multimodal]]; all plan
  * shapes (columnar binary storage, partition-batched decode, frame
  * explode, per-doc reaggregation, frame sampling, feature extraction)
  * are the real ones a production codec would run through.
  */
object MediaOps {
  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // media payload + typed metadata struct + per-doc frame counts from
    // the partition-batched stub decoder
    // caption-to-frame track alignment: per asset, each caption cue
    // attaches the temporally NEAREST sampled frame within a 4 s
    // tolerance (ties prefer backward — the merge_asof 'nearest'
    // convention), via the native as-of merge exec keyed on the asset.
    // The caption track derives deterministically from n_chars (one cue
    // per 120 chars at a 3.7 s cadence), the frame track is the stub
    // decoder's 8-frame fan-out at 25 fps/50 — so the whole alignment,
    // incl. tolerance misses and the equidistant tie, is oracle-checked.
    "multimodal_caption_align" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val frames = docs.select(col("doc_id"),
          explode(sequence(lit(0), lit(7))).as("frame_idx"))
        .select(col("doc_id"), col("frame_idx"),
          (col("frame_idx").cast("long") * lit(2000000L)).as("ts"))
      val captions = docs.select(col("doc_id"),
          explode(sequence(lit(0),
            expr("cast(n_chars div 120 as int)"))).as("cap_idx"))
        .withColumn("ts",
          col("cap_idx").cast("long") * lit(3700000L) + lit(500000L))
      graft.operators.AsOfJoin.asofNearestNative(captions, frames,
          Seq("doc_id"), "ts", "ts", Seq("frame_idx"),
          tolerance = Some(4000000L))
        .select(col("doc_id"), col("cap_idx"), col("ts"),
          col("asof_frame_idx"), col("asof_direction"))
        .orderBy(col("doc_id"), col("cap_idx"))
    }),

    "multimodal_media_meta" -> ((s, d) => {
      val media = Multimodal.withMediaColumn(Tables.documents(s, d))
      val nf = Multimodal.decodeFrames(s, media).groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_frames"))
        .withColumnRenamed("doc_id", "f_doc")
      media.join(nf, col("doc_id") === col("f_doc"))
        .select(col("doc_id"),
          col("media_meta.media_type").as("media_type"),
          col("media_meta.n_bytes").as("n_bytes"),
          col("media_meta.content_hash").as("content_hash"),
          col("n_frames"))
        .orderBy(col("doc_id"))
    }),

    // audio windowing: each payload (16-bit PCM view of the bytes)
    // explodes into overlapping sample windows on the 25ms/10ms-style
    // grid (sized to the fixture's byte lengths so docs span the 0..10+
    // window range, short docs hitting the no-window edge) — pure
    // metadata arithmetic, integer-exact, the map-side fan-out a real
    // featurizer feeds from
    "multimodal_audio_windows" -> ((s, d) => {
      Multimodal.audioWindows(
          Multimodal.withMediaColumn(Tables.documents(s, d)),
          windowSamples = 64, hopSamples = 25)
        .orderBy(col("doc_id"), col("win_idx"))
    }),

    // decode -> sample every 2nd frame -> feature-extract: the full
    // multimodal pipeline; deterministic shape (1 sampled frame per doc,
    // fixed feature dim) is oracle-checked, feature values are the stub's
    "multimodal_frame_features" -> ((s, d) => {
      val media = Multimodal.withMediaColumn(Tables.documents(s, d))
      val frames = Multimodal.decodeFrames(s, media)
      val sampled = Multimodal.sampleFrames(frames, every = 2)
      Multimodal.frameFeatures(s, sampled, dim = 8)
        .select(col("doc_id"), col("frame_idx"),
          size(col("embedding")).as("n_dims"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // perceptual-hash media dedup: 63-bit code per payload, Hamming-ball
    // pairs via the pigeonhole-complete chunk-combination blocking
    // (Dedup.hammingPairs64 — banded shuffle keys, never all-pairs).
    // The scenario is re-upload dedup: the corpus plus a re-ingested
    // batch (every 7th payload under a fresh id) — each re-upload must
    // pair with its original at distance 0. Unlike simhash (whose
    // 64-bit fold is not SQL-expressible) the stub code is pure hex
    // arithmetic, so this one is FULLY oracle-checked: blocking +
    // verify must reproduce DuckDB's brute-force all-pairs
    // shot-boundary detection: 8 synthetic frames per doc, two 4-frame
    // "shots" whose codes share a 63-bit base with a <=2-bit in-shot
    // jitter — the only >=tau Hamming jump is the shot boundary. Codes
    // are hex arithmetic (the codec seam's SQL-expressible stand-in),
    // so the whole detector is oracle-exact
    "multimodal_scene_cuts" -> ((s, d) => {
      val frames = Tables.documents(s, d)
        .where(col("text").isNotNull)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0), lit(7))).as("frame_idx"))
        .withColumn("__hex",
          md5(concat(col("text"), lit(":"),
            expr("frame_idx div 4").cast("string"))))
        .withColumn("__base",
          shiftleft(conv(substring(col("__hex"), 1, 8), 16, 10)
            .cast("long").bitwiseAND(lit(0x7FFFFFFFL)), 32)
            .bitwiseOR(conv(substring(col("__hex"), 9, 8), 16, 10)
              .cast("long")))
        .withColumn("code",
          col("__base").bitwiseXOR(
            expr("shiftleft(cast(1 as bigint), frame_idx % 4)")))
      Multimodal.sceneCuts(frames, col("doc_id"), col("frame_idx"),
          col("code"), tau = 10)
        .orderBy(col("asset_id"), col("frame_idx"))
    }),

    "multimodal_phash_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val reupload = docs.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + lit(1000000L))
      val media = Multimodal.withMediaColumn(docs.unionByName(reupload))
      // Hamming <= 4: the standard 64-bit-phash re-upload operating
      // point, and the blocking sweet spot — C(6,2)=15 band keys per
      // row; <= 8 would force C(12,4)=495 bands (20x the explode and
      // self-join) to keep the keyspace >= 16 bits, for pairs that a
      // random-bit corpus doesn't contain
      Multimodal.phashPairs(media, col("doc_id"), maxDist = 4)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // re-upload CLUSTERS: the phash pair stream closed into groups by
    // distributed connected components (one asset id per re-upload
    // family, however long the chain of near-identical variants) —
    // the grouping a dedup pipeline actually acts on. Oracle replays
    // the closure with a recursive CTE over the same pair predicate
    "multimodal_phash_clusters" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val reupload = docs.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + lit(1000000L))
      val all = docs.unionByName(reupload)
      val media = Multimodal.withMediaColumn(all)
      val pairs = Multimodal.phashPairs(media, col("doc_id"), maxDist = 4)
      graft.operators.Dedup.connectedComponents(
          all.select(col("doc_id")), pairs, "doc_id", "doc_a", "doc_b")
        .select(col("node").as("doc_id"), col("component"))
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "multimodal_caption_align" ->
      """WITH caps AS (
        |  SELECT doc_id,
        |    CAST(UNNEST(range(0, n_chars // 120 + 1)) AS INT) AS cap_idx
        |  FROM documents),
        |c AS (SELECT doc_id, cap_idx,
        |    CAST(cap_idx AS BIGINT) * 3700000 + 500000 AS ts
        |  FROM caps),
        |fr AS (
        |  SELECT doc_id, CAST(UNNEST(range(0, 8)) AS INT) AS frame_idx
        |  FROM (SELECT DISTINCT doc_id FROM documents)),
        |f AS (SELECT doc_id, frame_idx,
        |    CAST(frame_idx AS BIGINT) * 2000000 AS ts
        |  FROM fr),
        |bk AS (
        |  SELECT c.doc_id, c.cap_idx, f.frame_idx, f.ts,
        |    ROW_NUMBER() OVER (PARTITION BY c.doc_id, c.cap_idx
        |      ORDER BY f.ts DESC, f.frame_idx) AS rn
        |  FROM c JOIN f ON c.doc_id = f.doc_id AND f.ts <= c.ts
        |    AND c.ts - f.ts <= 4000000),
        |fw AS (
        |  SELECT c.doc_id, c.cap_idx, f.frame_idx, f.ts,
        |    ROW_NUMBER() OVER (PARTITION BY c.doc_id, c.cap_idx
        |      ORDER BY f.ts, f.frame_idx) AS rn
        |  FROM c JOIN f ON c.doc_id = f.doc_id AND f.ts >= c.ts
        |    AND f.ts - c.ts <= 4000000),
        |pick AS (
        |  SELECT c.doc_id, c.cap_idx, c.ts,
        |    b.frame_idx AS b_idx, b.ts AS b_ts,
        |    fo.frame_idx AS f_idx, fo.ts AS f_ts
        |  FROM c
        |  LEFT JOIN bk b ON b.doc_id = c.doc_id AND b.cap_idx = c.cap_idx
        |    AND b.rn = 1
        |  LEFT JOIN fw fo ON fo.doc_id = c.doc_id
        |    AND fo.cap_idx = c.cap_idx AND fo.rn = 1)
        |SELECT doc_id, cap_idx, ts,
        |  CASE WHEN b_ts IS NOT NULL AND (f_ts IS NULL
        |      OR ts - b_ts <= f_ts - ts)
        |    THEN b_idx ELSE f_idx END AS asof_frame_idx,
        |  CASE WHEN b_ts IS NULL AND f_ts IS NULL THEN NULL
        |    WHEN b_ts IS NOT NULL AND (f_ts IS NULL
        |      OR ts - b_ts <= f_ts - ts)
        |    THEN 'backward' ELSE 'forward' END AS asof_direction
        |FROM pick
        |ORDER BY doc_id, cap_idx""".stripMargin,

    "multimodal_media_meta" ->
      """SELECT doc_id, 'image/fake' AS media_type,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS content_hash, CAST(2 AS BIGINT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,

    "multimodal_audio_windows" ->
      """WITH b AS (SELECT doc_id,
        |    CAST(octet_length(encode(text)) // 2 AS BIGINT) AS n_samples
        |  FROM documents),
        |w AS (SELECT doc_id, n_samples,
        |    CASE WHEN n_samples >= 64
        |      THEN (n_samples - 64) // 25 + 1 ELSE 0 END AS nw
        |  FROM b),
        |e AS (SELECT doc_id, n_samples,
        |    UNNEST(range(0, nw)) AS i FROM w)
        |SELECT doc_id, n_samples, i AS win_idx,
        |  i * 25 AS start_sample, i * 25 + 64 AS end_sample,
        |  (i * 25 * 1000) // 16000 AS start_ms,
        |  ((i * 25 + 64) * 1000) // 16000 AS end_ms
        |FROM e ORDER BY doc_id, win_idx""".stripMargin,

    "multimodal_frame_features" ->
      """SELECT doc_id, CAST(0 AS INTEGER) AS frame_idx,
        |  CAST(8 AS INTEGER) AS n_dims
        |FROM documents ORDER BY doc_id""".stripMargin,

    // same hex base + bit jitter, same lag window, exact bit_count
    "multimodal_scene_cuts" ->
      """WITH f AS (
        |  SELECT doc_id, i AS frame_idx,
        |    xor(
        |      (CAST(('0x' || substr(md5(text || ':' ||
        |          CAST(i // 4 AS VARCHAR)), 1, 8)) AS BIGINT)
        |         & 2147483647) * 4294967296
        |      + CAST(('0x' || substr(md5(text || ':' ||
        |          CAST(i // 4 AS VARCHAR)), 9, 8)) AS BIGINT),
        |      CAST(1 AS BIGINT) << CAST(i % 4 AS INTEGER)) AS code
        |  FROM (SELECT doc_id, text FROM documents
        |        WHERE text IS NOT NULL),
        |    UNNEST(range(8)) AS r(i)
        |), lagd AS (
        |  SELECT doc_id AS asset_id, frame_idx, code,
        |    LAG(code) OVER w AS prev,
        |    LAG(frame_idx) OVER w AS prev_idx
        |  FROM f WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)
        |)
        |SELECT asset_id, prev_idx, frame_idx,
        |  CAST(bit_count(xor(code, prev)) AS BIGINT) AS hamming
        |FROM lagd
        |WHERE prev IS NOT NULL AND bit_count(xor(code, prev)) >= 10
        |ORDER BY asset_id, frame_idx""".stripMargin,

    // brute-force all-pairs reference for the banded blocking plan: the
    // identical 63-bit code from md5 hex halves, exact bit_count Hamming
    "multimodal_phash_dedup" ->
      """WITH u AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
        |), p AS (
        |  SELECT doc_id,
        |    (CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT)
        |       & 2147483647) * 4294967296
        |    + CAST(('0x' || substr(md5(text), 9, 8)) AS BIGINT) AS ph
        |  FROM u)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.ph, b.ph)) AS INTEGER) AS hamming
        |FROM p a JOIN p b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.ph, b.ph)) <= 4
        |ORDER BY doc_a, doc_b""".stripMargin,

    "multimodal_phash_clusters" ->
      """WITH RECURSIVE u AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
        |), p AS (
        |  SELECT doc_id,
        |    (CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT)
        |       & 2147483647) * 4294967296
        |    + CAST(('0x' || substr(md5(text), 9, 8)) AS BIGINT) AS ph
        |  FROM u),
        |good AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM p a JOIN p b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.ph, b.ph)) <= 4),
        |edges AS (SELECT doc_a AS eu, doc_b AS ev FROM good
        |  UNION SELECT doc_b, doc_a FROM good),
        |reach(node, label) AS (
        |  SELECT doc_id, doc_id FROM u
        |  UNION
        |  SELECT e.eu, r.label FROM edges e JOIN reach r ON e.ev = r.node)
        |SELECT node AS doc_id, MIN(label) AS component
        |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin
  )
}
