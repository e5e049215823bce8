package graft.stages

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S16 — the reference's in-memory staging buffer semantics
  * (weibo/WeiboManager.kt:5–46): `infoMap[type][key] = row` is
  * last-write-wins per key in arrival order; `getFlattenList` explodes
  * list-valued entries to (key, value) rows. Spark image: a keyed max_by
  * aggregate over an ingest-sequence column (two-phase hash agg — the
  * partial side already collapses per-partition duplicates), and explode.
  */
object Staging {

  /** Keep the LAST row per key by `seqCol` (arrival order). */
  def lastWriteWins(df: DataFrame, keyCols: Seq[String], seqCol: String): DataFrame = {
    val payload = struct(df.columns.map(col): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(max_by(payload, col(seqCol)).as("_row"))
      .select(col("_row.*"))
  }

  /** getFlattenList (WeiboManager.kt:27–40): (key, list) → (key, value). */
  def flatten(df: DataFrame, keyCol: String, listCol: String,
              valueName: String): DataFrame =
    df.select(col(keyCol), explode(col(listCol)).as(valueName))
}
