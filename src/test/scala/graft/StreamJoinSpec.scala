package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream interval join with watermarks on both sides — the state
  * store only retains rows inside the watermark horizon, so join state is
  * bounded by (event rate × interval), not by history. */
class StreamJoinSpec extends GraftSuite {

  private def ts(minute: Int): Timestamp = new Timestamp(1700000000000L + minute * 60000L)

  test("click-view attribution joins within the 10-minute window only") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[(Timestamp, Long)]
    val clicks = MemoryStream[(Timestamp, Long)]
    val v = views.toDF().toDF("vts", "vuser").withWatermark("vts", "30 minutes")
    val c = clicks.toDF().toDF("cts", "cuser").withWatermark("cts", "30 minutes")
    val joined = v.join(c,
      expr("vuser = cuser AND cts >= vts AND cts <= vts + interval 10 minutes"))
      .select(col("vuser").as("user"), col("vts"), col("cts"))
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      views.addData((ts(0), 1L), (ts(0), 2L))
      clicks.addData((ts(5), 1L), (ts(20), 2L)) // user 1 in window; user 2 too late
      q.processAllAvailable()
      // advance both watermarks so results emit
      views.addData((ts(120), 9L))
      clicks.addData((ts(120), 9L))
      q.processAllAvailable()
      val rows = spark.table("attrib").collect()
        .map(r => r.getAs[Long]("user")).toSet
      assert(rows.contains(1L), "in-window click-view pair missing")
      assert(!rows.contains(2L), "out-of-window pair must not join")
    } finally q.stop()
  }
}
