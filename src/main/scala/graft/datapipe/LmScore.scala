package graft.datapipe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring (the CCNet-shape filter: train a
  * cheap LM on a reference slice, score every document by its mean token
  * log-probability, keep/route by the score). The reference engine has no
  * LM filter — this is a beyond-reference training-pipeline operator, the
  * standard third leg next to dedup and heuristic quality scores.
  *
  * Scale shape (the part that matters at 100 TB):
  *  - the model is pruned by a COUNT THRESHOLD, not a global top-K — a
  *    pure filter after the word-count aggregate, no global sort, no
  *    single-reducer ranking. Vocabulary after pruning is ~10^6..10^7
  *    rows; the training pass over the reference slice is one explode +
  *    one two-phase aggregate (map-side partials absorb hot stopwords).
  *  - scoring reduces each doc to its DISTINCT-word counts before touching
  *    the model: the exchange carries (doc, word, n) — bounded by distinct
  *    words per doc — never one row per token.
  *  - the model join's hot keys ("the" appears in ~every doc) are a JOIN,
  *    so AQE skew-split applies; at pruned-vocab sizes Spark's AQE will
  *    broadcast the model side outright when it fits.
  *  - out-of-vocabulary words get a fixed floor log-prob instead of being
  *    dropped, so gibberish is penalized rather than ignored.
  */
object LmScore {

  /** Train a pruned unigram LM over `ref`: one row per word with
    * `count >= minCount`, `logp = ln(count / total)` where `total` counts
    * ALL words (including pruned ones), keeping the retained probabilities
    * proper. The total is a scalar aggregate (driver-side single value). */
  def train(ref: DataFrame, textCol: String, minCount: Long = 3L): DataFrame = {
    val cnt = ref
      .select(explode(TextStats.tokens(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
    val total = cnt.agg(sum("c")).first().getLong(0).toDouble
    cnt.where(col("c") >= minCount)
      .select(col("w"), log(col("c").cast("double") / total).as("logp"))
  }

  /** Score every document: mean token log-probability under `model`
    * ((w, logp) rows from [[train]]); unseen words score `floorLogp`.
    * Returns (id, n_tokens, avg_logp) — higher is more reference-like.
    * All-whitespace docs have no tokens and produce no row. */
  def score(docs: DataFrame, model: DataFrame, idCol: String, textCol: String,
            floorLogp: Double = -12.0): DataFrame =
    docs
      .select(col(idCol), explode(TextStats.tokens(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("n"))
      .join(model, Seq("w"), "left")
      .groupBy(col(idCol))
      .agg(sum("n").as("n_tokens"),
        round(sum(col("n") * coalesce(col("logp"), lit(floorLogp))) / sum("n"), 6)
          .as("avg_logp"))
}
