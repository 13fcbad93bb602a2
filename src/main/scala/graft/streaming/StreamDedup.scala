package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact-dedup — the online counterpart of Dedup.d01. Keys on
  * md5(normalized text) with `dropDuplicatesWithinWatermark`, so the
  * dedup state store holds only watermark-recent keys: at ingest rates
  * of a 100 TB/day pipeline the state is bounded by (rate × delay), not
  * by corpus history, and exactly-once sinks see each novel document
  * once. Documents older than the watermark that reappear are treated
  * as new — the standard bounded-state trade; a compacted key table
  * handles the long-tail exactly like batch d01. */
object StreamDedup {

  /** Deduplicate a stream with `ts` (event-time) and `text` columns. */
  def dedup(docs: DataFrame, watermarkDelay: String = "30 minutes"): DataFrame =
    docs.withColumn("dup_key",
        md5(lower(regexp_replace(trim(col("text")), "\\s+", " "))))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("dup_key")
}
