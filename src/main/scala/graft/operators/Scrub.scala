package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII / pattern scrubbing for training-data pipelines: redact every match
  * of a pattern list from a text column and report per-pattern match
  * counts.
  *
  * Pure codegen'd column transforms (`regexp_replace` / `regexp_count`) —
  * map-only at any scale, no shuffle, no UDFs. Patterns are applied IN
  * ORDER to the running redacted text (so an earlier pattern can't leak a
  * fragment a later pattern would have caught differently); counts are
  * measured against the text each pattern actually saw.
  *
  * Regexes must stay in the ANSI-portable subset (character classes,
  * bounded repetition, alternation — no lookaround, no backrefs) so the
  * same pattern text runs identically on Spark (java.util.regex) and any
  * RE2-based engine, keeping the operator oracle-checkable.
  */
object Scrub {

  /** A redaction rule: counts land in column `n_<name>`. */
  final case class Rule(name: String, pattern: String, replacement: String)

  /** The standard PII rule set: emails, IPv4 addresses, long digit runs
    * (phone/account numbers). Deliberately simple, portable regexes —
    * production sets swap in stricter ones through the same seam. */
  val PiiRules: Seq[Rule] = Seq(
    Rule("email", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
    Rule("ipv4", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}",
      "<IP>"),
    Rule("digits", "[0-9]{6,}", "<NUM>"))

  /** Adds `text_clean` plus one `n_<rule>` count column per rule.
    * `text` is left untouched (callers drop it when they want the
    * scrubbed corpus only). */
  def redact(df: DataFrame, text: Column, rules: Seq[Rule] = PiiRules)
      : DataFrame = {
    require(rules.nonEmpty && rules.map(_.name).distinct.size == rules.size,
      s"rule names must be unique and non-empty: ${rules.map(_.name)}")
    val (cleaned, counts) =
      rules.foldLeft((text, Seq.empty[(String, Column)])) {
        case ((t, cs), r) =>
          (regexp_replace(t, r.pattern, r.replacement),
            cs :+ (s"n_${r.name}", regexp_count(t, lit(r.pattern))))
      }
    counts.foldLeft(df.withColumn("text_clean", cleaned)) {
      case (d, (name, c)) => d.withColumn(name, c)
    }
  }

  /** Corpus text normalization — the canonical first stage of every text
    * pipeline: Unicode NFC (native [[graft.functions.NfcNormalize]], so
    * composed/decomposed twins unify before any hashing or shingling) →
    * lowercase → whitespace-run collapse → trim. Entirely map-only
    * codegen'd column transforms; the whitespace class is spelled out
    * (`[ \t\r\n\f]`) because java.util.regex's `\s` and RE2's differ on
    * vertical tab — the explicit class is engine-portable, keeping the
    * operator oracle-checkable. */
  def normalize(df: DataFrame, text: Column,
      outCol: String = "text_norm"): DataFrame =
    df.withColumn(outCol,
      trim(regexp_replace(
        lower(graft.functions.NormalizeFunctions.nfc_normalize(text)),
        "[ \\t\\r\\n\\f]+", " ")))

  /** HTML/markup stripping — the web-corpus extraction stage (the
    * heuristic core of trafilatura/jusText-style extractors, minus their
    * DOM scoring): drop script/style payloads WITH their content, drop
    * comments, drop remaining tags, decode the five predefined XML
    * entities plus nbsp, collapse whitespace. Pure codegen'd
    * regexp_replace/replace chain — map-only at any scale — and every
    * pattern stays in the Java-regex ∩ RE2 portable subset ((?is) inline
    * flags, non-greedy `.*?`, no lookaround), so the operator is
    * oracle-checkable against an RE2 engine verbatim.
    *
    * Order is load-bearing: script/style first (their BODIES must go —
    * tag-stripping alone would leak JS/CSS text into the corpus), then
    * comments, then tags; `&amp;` decodes LAST so `&amp;lt;` yields the
    * literal `&lt;` rather than double-decoding to `<`. */
  def stripMarkup(df: DataFrame, text: Column,
      outCol: String = "text_plain"): DataFrame = {
    val noScript = regexp_replace(text,
      "(?is)(<script[^>]*>.*?</script>)|(<style[^>]*>.*?</style>)", " ")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = Seq(
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""), ("&#39;", "'"),
        ("&nbsp;", " "), ("&amp;", "&"))
      .foldLeft(noTags) { case (c, (ent, ch)) =>
        replace(c, lit(ent), lit(ch))
      }
    df.withColumn(outCol,
      trim(regexp_replace(decoded, "[ \\t\\r\\n\\f]+", " ")))
  }

  /** Keyed pseudonymization of identifier columns — the PII control
    * between redaction (destroys joins) and plaintext (leaks): each
    * value is replaced IN PLACE by `p_` + the first 16 md5 nibbles of
    * salt:value, so equal values map to equal tokens across every
    * table sharing the salt (referential integrity survives — joins,
    * group-bys, and dedup still work on the pseudonymized data) while
    * the originals never leave the cluster. Deterministic and
    * cross-engine (the md5-hex protocol every sampler here uses);
    * 64-bit tokens make birthday collisions negligible below ~2³²
    * distinct values. Rotating the salt unlinkably re-keys a release.
    * NULL stays NULL. Map-only. */
  def pseudonymize(df: DataFrame, cols: Seq[String], salt: String)
      : DataFrame = {
    require(cols.nonEmpty, "pseudonymize needs at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"no column '$c'"))
    cols.foldLeft(df) { (acc, c) =>
      acc.withColumn(c,
        when(col(c).isNotNull,
          concat(lit("p_"), substring(
            md5(concat(lit(salt), lit(":"), col(c).cast("string"))),
            1, 16))))
    }
  }

  /** Blocklist hit report: one row per (id, phrase) with the exact
    * occurrence count, via the codegen'd Aho-Corasick pass
    * ([[graft.functions.MultiPatternCounts]]) — ONE scan of each text
    * for the whole phrase list, every (pattern, start) occurrence
    * counted (a pattern's own overlaps included). Map-only: the
    * automaton rides the plan, no join, no shuffle; only matched
    * (id, ordinal, count) rows survive the explode. */
  def blocklistHits(df: DataFrame, id: Column, text: Column,
      phrases: Seq[String]): DataFrame = {
    import graft.functions.AhoCorasickFunctions.multi_pattern_counts
    df.select(id,
        posexplode(multi_pattern_counts(text, phrases))
          .as(Seq("__pi", "n_hits")))
      .filter(col("n_hits") > 0)
      .select(id,
        element_at(typedLit(phrases), col("__pi") + 1).as("phrase"),
        col("n_hits"))
  }

  /** Blocklist FILTER: rows whose text contains NO blocklist phrase —
    * the corpus-cleaning gate itself. Same single automaton pass;
    * `aggregate` folds the count vector so nothing explodes. NULL text
    * passes (nothing to match). */
  def blocklistKeep(df: DataFrame, text: Column, phrases: Seq[String])
      : DataFrame = {
    import graft.functions.AhoCorasickFunctions.multi_pattern_counts
    df.filter(text.isNull ||
      aggregate(multi_pattern_counts(text, phrases),
        lit(0L), (acc, x) => acc + x) === 0L)
  }
}
