package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trigram-postings substring search — the code-search index design
  * (Google Code Search / Zoekt, public write-ups): a literal pattern can
  * only occur in a document that contains EVERY trigram of the pattern,
  * so an inverted index of (trigram, doc) postings turns "grep 100 TB"
  * into an index probe over |pattern| postings lists plus an exact
  * verify on the few candidates — the full-corpus text scan happens
  * once at BUILD time, never per query.
  *
  * Trigram keys are the codegen'd rolling code-point hashes the
  * duplicate-span machinery already uses ([[graft.functions.CharWindowHashes]]),
  * NOT the raw strings: 8-byte fixed-width keys keep the postings table
  * compact and its shuffle cheap. Hash collisions can only ADD
  * candidates (never lose one), and the verify step removes them — the
  * result is exactly `contains(text, pattern)`, which is what the
  * DuckDB oracle checks.
  *
  * Scale shape: build is one map-only explode + a distinct shuffle
  * keyed on (hash, doc) — the one corpus-sized pass. A probe touches
  * only the pattern's ~|pattern| hash keys (broadcast IN-filter on the
  * postings scan — with the index written range-clustered on gram_hash
  * the filter prunes FILES too), one count-distinct per surviving doc,
  * then a semi-join + exact contains() on candidates only. */
object TextIndex {

  /** Trigram window: the standard code-search operating point — short
    * enough that any 3+-char pattern decomposes, long enough that
    * postings lists stay selective. */
  val Gram = 3

  /** Build the postings index: one `(gram_hash, doc_id)` row per
    * DISTINCT trigram per document (presence, not positions — the
    * verify step re-checks the actual text, so positions would buy
    * nothing and cost index size). */
  def buildPostings(df: DataFrame, idCol: String, text: Column)
      : DataFrame =
    df.filter(text.isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(graft.functions.ShingleFunctions
          .char_window_hashes(text, Gram))).as("gram_hash"))
      .distinct()

  /** The pattern's trigram hash keys, computed by the SAME expression
    * the index build ran — one 1-row local plan, so driver and executors
    * can never disagree on the hash. */
  def patternHashes(spark: SparkSession, pattern: String): Seq[Long] = {
    require(pattern.codePointCount(0, pattern.length) >= Gram,
      s"pattern shorter than $Gram code points cannot use the index " +
        "(fall back to a contains() scan)")
    spark.range(1)
      .select(explode(array_distinct(graft.functions.ShingleFunctions
        .char_window_hashes(lit(pattern), Gram))).as("h"))
      .collect().map(_.getLong(0)).toSeq
  }

  /** Candidate doc ids: documents whose postings cover EVERY pattern
    * trigram. May contain hash-collision false positives; never misses
    * a true match. */
  def candidates(postings: DataFrame, spark: SparkSession,
      pattern: String): DataFrame = {
    val hs = patternHashes(spark, pattern)
    postings.filter(col("gram_hash").isin(hs: _*))
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("gram_hash")).as("__ti_n"))
      .filter(col("__ti_n") === hs.size)
      .select(col("doc_id"))
  }

  /** Incremental ingest: upsert the batch's postings into a PERSISTED
    * index keyed on (gram_hash, doc_id) — replaying a batch is a no-op,
    * and the old corpus is never re-shingled (the
    * [[Dedup.exactKeepIncremental]] production-loop pattern). This is
    * the shape that makes the index pay at scale: the corpus-sized
    * trigram pass happens once per ingested batch, and every later
    * probe reads only the persisted postings. */
  def appendPostings(df: DataFrame, idCol: String, text: Column,
      indexPath: String): Unit =
    graft.sinks.ParquetUpsert.upsert(
      buildPostings(df, idCol, text), indexPath,
      Seq("gram_hash", "doc_id"))

  /** Probe a persisted index (see [[appendPostings]]). */
  def searchIndexed(indexPath: String, df: DataFrame, idCol: String,
      text: Column, pattern: String): DataFrame =
    search(df.sparkSession.read.parquet(indexPath), df, idCol, text,
      pattern)

  /** Index-assisted exact substring search: semantically identical to
    * `df.filter(contains(text, pattern))`, but only candidate documents
    * are read and verified. `df` must be the corpus the index was built
    * from (a stale index can miss newer documents — rebuild or
    * incrementally [[appendPostings]] on ingest). */
  def search(postings: DataFrame, df: DataFrame, idCol: String,
      text: Column, pattern: String): DataFrame = {
    if (pattern.codePointCount(0, pattern.length) < Gram)
      df.filter(text.contains(pattern)) // too short to decompose: scan
    else
      df.join(
          candidates(postings, df.sparkSession, pattern)
            .withColumnRenamed("doc_id", idCol),
          Seq(idCol), "left_semi")
        .filter(text.contains(pattern)) // collision scrub: exact verify
  }

  /** Exact PHRASE search over the token stream — consecutive-token
    * match, the retrieval primitive substring search can't express
    * (substring "table scan" also hits "…portable scans…"; the phrase
    * form tokenizes first). Classical positional-postings query: each
    * phrase term's postings shift left by its offset, and a position
    * where ALL offsets land is a phrase start — duplicate terms in the
    * phrase just contribute their own offsets, so "the cat the" works
    * unchanged.
    *
    * Returns (idCol, n_matches, first_pos) per matching document.
    *
    * Scale shape: one map-only posexplode with an IN-filter down to
    * the phrase's terms (the postings actually shuffled are the
    * phrase-term postings, not the corpus), a broadcast join against
    * the |phrase|-row offset table, then ONE shuffle keyed on
    * (doc, start). Complements [[search]]: that one answers substring
    * containment via the trigram index, this one token adjacency. */
  def phraseSearch(df: DataFrame, idCol: String, text: Column,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val spark = df.sparkSession
    import spark.implicits._
    val offsets = phrase.zipWithIndex.toDF("term", "__k")
    df.where(text.isNotNull)
      .select(col(idCol),
        posexplode(TextAnalysis.tokens(text)).as(Seq("pos", "term")))
      .where(col("term").isin(phrase.distinct: _*))
      .join(broadcast(offsets), "term")
      .select(col(idCol), (col("pos") - col("__k")).as("__start"))
      .where(col("__start") >= 0)
      .groupBy(col(idCol), col("__start"))
      .agg(count(lit(1)).as("__hits"))
      .where(col("__hits") === phrase.length)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matches"),
        min(col("__start")).cast("long").as("first_pos"))
  }

  /** Minimal cover window — proximity ranking: per doc, the length (in
    * tokens, inclusive) of the SMALLEST window containing ALL query
    * terms, the classic IR proximity signal that separates "terms
    * scattered across 3 pages" from "terms in one sentence" where
    * bag-of-words scoring cannot. Sweep formulation: at each query-term
    * occurrence p, the best cover ending at p spans
    * [min over terms of last-occurrence-before-p, p]; the per-term
    * last-occurrences are running conditional MAX windows over the
    * doc's (position-sorted) query-term postings, so the whole operator
    * is |terms| window aggregates over the FILTERED postings (the
    * IN-filter cuts the corpus to query-term rows before any shuffle),
    * one doc-keyed exchange, no self-join, no quadratic pair scan.
    *
    * Returns (idCol, n_covers, min_cover) for docs containing all
    * terms — n_covers counts the query-term positions at which a full
    * cover ends (every one after the first occurrence of the rarest
    * prefix); min_cover >= |terms|, == |terms| iff some adjacent run
    * holds all of them. */
  def minCoverSpan(df: DataFrame, idCol: String, text: Column,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty && terms.distinct.size == terms.size,
      s"need distinct query terms: $terms")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val lastCols = terms.zipWithIndex.map { case (t, i) =>
      max(when(col("term") === t, col("pos"))).over(w).as(s"__l$i")
    }
    df.where(text.isNotNull)
      .select(col(idCol),
        posexplode(TextAnalysis.tokens(text)).as(Seq("pos", "term")))
      .where(col("term").isin(terms: _*))
      .select(col(idCol) +: col("pos") +: lastCols: _*)
      .where(terms.indices.map(i => col(s"__l$i").isNotNull)
        .reduce(_ && _))
      .withColumn("__cover",
        col("pos") - least(terms.indices.map(i => col(s"__l$i")): _*)
          + 1)
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_covers"),
        min(col("__cover")).cast("long").as("min_cover"))
  }

  /** All strings reachable from `w` by up to `d` single-character
    * deletions, `w` itself included — the SymSpell key set, generated
    * as ONE nested array expression (no explode until the caller keys
    * on it). The empty string IS a legitimate key when len(w) <= d
    * (dropping it would lose pairs like ("a","b") whose only shared
    * deletion is "") — its bucket links only the length-<=d vocabulary,
    * a bounded set; "" is merely never expanded FURTHER (the filter
    * below), which is a no-op semantically and keeps the transform
    * total. */
  private def deletionSet(w: Column, d: Int): Column = {
    def delOnce(xs: Column): Column =
      array_distinct(flatten(transform(
        filter(xs, x => length(x) > 0),
        x => transform(sequence(lit(1), length(x)), i =>
          concat(x.substr(lit(1), i - lit(1)),
            x.substr(i + lit(1), length(x)))))))
    var acc = array(w)
    var cur = array(w)
    (1 to d).foreach { _ =>
      cur = delOnce(cur)
      acc = array_union(acc, cur)
    }
    acc
  }

  /** SymSpell fuzzy term lookup (Garbe's deletion-neighborhood trick,
    * public algorithm): every (query, vocab) pair within Levenshtein
    * distance `maxEdits` shares at least one up-to-`maxEdits`-deletions
    * variant, so candidates come from an equi-join of the two deletion
    * key sets and only candidates pay the exact distance check — a
    * 100 TB corpus never sees the |Q| x |V| brute-force product the
    * oracle runs at gate scale.
    *
    * Output: (query_term, match_term, dist), one row per matched pair.
    *
    * Scale shape: key generation is map-only, |rows| x (len choose <=d)
    * keys; the join is keyed on the deletion string. Catalyst hoists
    * the distance bound INTO the join condition (verified in
    * TextIndexSpec's plan test): each raw candidate row pays one
    * levenshtein as an early prune — duplicates of a pair reachable
    * through several shared deletions pay it per copy, but non-matches
    * die before the dedup exchange, the better trade (multiplicity per
    * pair is <= the handful of shared deletion variants). The surviving
    * pairs dedup and the output projection recomputes the distance once
    * per match. Hot keys are
    * bounded by vocabulary words per deletion variant (a vocabulary
    * property, not a corpus-size one — vocab is distinct terms; the ""
    * key's bucket is exactly the length-<=d words). */
  def fuzzyLookup(vocab: DataFrame, termCol: String, queries: DataFrame,
      queryCol: String, maxEdits: Int): DataFrame = {
    require(maxEdits >= 1 && maxEdits <= 2,
      s"maxEdits=$maxEdits out of [1,2]")
    val v = vocab.select(col(termCol).as("__w"))
      .where(col("__w").isNotNull).distinct()
      .select(col("__w"), explode(deletionSet(col("__w"), maxEdits))
        .as("__k"))
    val q = queries.select(col(queryCol).as("__q"))
      .where(col("__q").isNotNull).distinct()
      .select(col("__q"), explode(deletionSet(col("__q"), maxEdits))
        .as("__k"))
    q.join(v, "__k")
      .select(col("__q"), col("__w")).distinct()
      // compute the O(|q|*|w|) edit distance ONCE per candidate pair —
      // filter + projection as separate levenshtein calls would pay it
      // twice (Catalyst doesn't CSE across the Filter/Project boundary)
      .withColumn("dist",
        levenshtein(col("__q"), col("__w")).cast("long"))
      .where(col("dist") <= maxEdits)
      .select(col("__q").as("query_term"), col("__w").as("match_term"),
        col("dist"))
  }
}
