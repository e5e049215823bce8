package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language-ID heuristic, document
  * fingerprinting. All pure column expressions (codegen'd, narrow — no
  * shuffle), designed to run inside the same scan as filtering so a 100 TB
  * corpus is scored in one pass.
  */
object TextStats {

  /** whitespace tokenization + a BPE-ish subword count proxy: words plus
    * extra units for every 4 chars of long words. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** subword-unit estimate: ceil(len/4) summed over words — a cheap,
    * deterministic stand-in for a BPE vocab (no model shipped). */
  def subwordCount(text: Column): Column =
    aggregate(tokens(text), lit(0),
      (acc, w) => acc + ceil(length(w) / lit(4.0)).cast("int"))

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), w => lower(w).isin(stopwords: _*)))

  /** Quality score in [0,1]: length band + punctuation ratio + stopword
    * presence — the usual pre-training heuristics, deterministic and
    * SQL-expressible for the oracle. */
  def qualityScore(text: Column): Column = {
    val n = length(text)
    val punct = n - length(regexp_replace(text, "[\\.,;:!\\?]", ""))
    val punctRatio = punct.cast("double") / greatest(n, lit(1)).cast("double")
    val stopRatio = stopwordCount(text).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")
    val lenScore = when(n.between(50, 2000), 1.0)
      .when(n.between(10, 5000), 0.5).otherwise(0.0)
    round(lenScore * 0.4 + least(stopRatio * lit(4.0), lit(1.0)) * 0.4 +
      (lit(1.0) - least(punctRatio * lit(10.0), lit(1.0))) * 0.2, 4)
  }

  /** n-gram language-ID heuristic: script ratio first (CJK vs latin), then
    * an English stopword-density check. */
  def langId(text: Column): Column = {
    val n = greatest(length(text), lit(1))
    val cjk = n - length(regexp_replace(text, "[\\x{4e00}-\\x{9fff}]", ""))
    val stopRatio = stopwordCount(text).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")
    when(cjk.cast("double") / n.cast("double") > 0.3, "zh")
      .when(stopRatio > 0.02, "en")
      .otherwise("unk")
  }

  /** Document fingerprint: hash of the whitespace-normalized, lowercased
    * text. md5 (not xxhash64) so external engines can reproduce it. */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))
}
