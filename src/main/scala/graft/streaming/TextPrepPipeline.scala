package graft.streaming

import graft.operators.{Scrub, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming text preparation: the quality gate + language filter + PII
  * scrub stage of the training-data pipeline as a STATELESS streaming
  * transform.
  *
  * Every operator in the chain is a pure column transform (no window, no
  * state store, no watermark), so exactly one plan serves batch and
  * `readStream` unchanged — the "continuous ingest" half of the corpus
  * pipeline. Cross-batch exact dedup is the stateful stage and lives
  * separately: [[EventsPipeline.dedupStream]] within a stream's
  * watermark, [[graft.operators.Dedup.exactKeepIncremental]] against the
  * persistent corpus index.
  */
object TextPrepPipeline {

  /** Gate on quality features + language-ID, then redact PII; emits the
    * surviving docs with `lang_pred`, quality columns, `text_clean`, and
    * per-rule redaction counts. */
  def cleanDocs(docs: DataFrame, minTokens: Int = 5,
      minAlpha: Double = 0.5): DataFrame = {
    val scored = TextAnalysis.qualityFeatures(docs, col("text"))
      .withColumn("lang_pred", TextAnalysis.langId(col("text")))
    val gated = scored.filter(col("n_tokens") >= minTokens &&
      col("alpha_ratio") > minAlpha && col("lang_pred") =!= "und")
    Scrub.redact(gated, col("text"))
  }
}
