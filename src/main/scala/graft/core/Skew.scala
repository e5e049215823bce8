package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed joins and aggregations.
  *
  * AQE's skew-join split handles most skew at runtime (and the engine
  * enables it everywhere), but it only triggers on sort-merge joins whose
  * partition sizes exceed its thresholds; a hot key inside a broadcast-less
  * equi-join below the threshold, or a skewed groupBy, still serializes on
  * one reducer. Salting is the static fix: fan the hot keys out over
  * `salts` sub-keys, replicate the small side once per salt, and the hot
  * key's rows spread over `salts` reducers. The corpus's planted hot root
  * (one celebrity mid owning ~30% of reposts — gen/Corpus) is exactly this
  * shape.
  *
  * Cost model: the big side gains one narrow column (no extra shuffle
  * volume beyond the join's own); the small side is replicated ×salts —
  * use ONLY when the small side is small enough that `salts` copies still
  * broadcast or shuffle cheaply.
  */
object Skew {

  /** Deterministic salt in [0, salts) for a row of the BIG side — derived
    * from the row's other columns when available (`entropy`), else from the
    * key itself via a spread hash (monotonically-assigned ids hash to
    * adjacent values; xxhash64 spreads them). */
  def salt(entropy: Column, salts: Int): Column =
    pmod(xxhash64(entropy), lit(salts))

  /** Equi-join `big ⋈ small` on `key`, salted `salts` ways: the big side
    * tags each row with a deterministic salt from `entropy` (a column of
    * the big side — any well-distributed value, e.g. its row id); the
    * small side is replicated once per salt value. Result equals the plain
    * join exactly (verified in SkewSpec). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 entropy: Column, salts: Int = 8,
                 joinType: String = "inner"): DataFrame = {
    // parity with the plain join holds only when unmatched SMALL-side rows
    // never surface: right/full outer would emit each unmatched small row
    // once PER SALT (it was replicated `salts` times). Restrict to the
    // parity-safe set rather than silently duplicating.
    val safe = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti")
    require(safe.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin: joinType '$joinType' replicates unmatched small-side rows " +
        s"once per salt — only ${safe.mkString("/")} preserve plain-join parity")
    val b = big.withColumn("__salt", salt(entropy, salts))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    b.join(s, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Skew-safe count per key: partial count on (key, salt), then final
    * count on key — the hot key's first-phase work spreads over `salts`
    * reducers and the second phase sees at most `salts` rows per key. */
  def saltedCount(df: DataFrame, key: String, entropy: Column,
                  salts: Int = 8): DataFrame =
    df.withColumn("__salt", salt(entropy, salts))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").as("n"))
}
