package graft.streaming

import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** UDP record emission — the reference's RecordLogger (LoggerTest.java:
  * 15-18 loops `recordLogger.log("...")` into a Spring UDP adapter).
  *
  * Spark-first shape: a foreachBatch sink whose partitions open their own
  * sockets on the EXECUTORS and emit rows as datagrams — no driver
  * funnel, so emission bandwidth scales with the cluster, and a socket is
  * opened once per partition, not per record. */
object UdpSink {

  /** Stream the `value` string column of `lines` to host:port as UDP
    * datagrams, one per row. */
  def emit(lines: DataFrame, host: String, port: Int): StreamingQuery =
    lines.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        emitBatch(batch, host, port)
      }
      .start()

  /** One batch's emission — also usable from batch jobs directly. */
  def emitBatch(batch: Dataset[Row], host: String, port: Int): Unit =
    batch.select("value").foreachPartition { rows: Iterator[Row] =>
      val socket = new DatagramSocket()
      val addr = InetAddress.getByName(host)
      try rows.foreach { r =>
        val bytes = r.getString(0).getBytes(UTF_8)
        socket.send(new DatagramPacket(bytes, bytes.length, addr, port))
      } finally socket.close()
    }
}
