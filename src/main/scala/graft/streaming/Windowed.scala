package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked tumbling-window aggregation — ONE implementation for batch
  * and `readStream` (withWatermark is a no-op on a batch Dataset, so the
  * same code path is driver-oracle-checked in batch and exercised with a
  * MemoryStream + append-mode finalization in StreamingSpec). */
object Windowed {

  /** (window_start_epoch, key, n) tumbling counts. */
  def eventCounts(events: DataFrame, tsCol: String, keyCol: String,
                  windowLen: String = "1 hour",
                  watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        col(keyCol), col("n"))
}
