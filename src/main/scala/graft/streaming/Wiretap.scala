package graft.streaming

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming wiretap: dynamic multi-subscriber regex routing.
  *
  * Re-expression of the reference's RealTimeCdrWiretap
  * (RealTimeCdrWiretap.java:30-78): subscribers register regex
  * "interests" at runtime and matching records are routed to them,
  * tagged by subscriber.
  *
  * Spark-first shape: the interest set is snapshotted at plan time and
  * folded into the record scan as LITERAL `regexp_like` branches (one
  * when() per interest, matches collected map-side and exploded) —
  * records are the 100 TB side, interests are dozens of patterns each
  * compiled once per task; see [[route]] for why this beats the
  * broadcast-table form. Dynamism comes from foreachBatch: the routing
  * plan is rebuilt from the current registry snapshot each micro-batch,
  * so a `register` call takes effect on the next batch without
  * restarting the query — no per-record driver RPC, no state store. On
  * a multi-tenant cluster the registry would live in a compacted table
  * snapshotted into the plan the same way.
  */
class Wiretap {

  private val interests = TrieMap.empty[String, String] // subscriber -> regex

  def register(subscriber: String, regex: String): Unit = interests.put(subscriber, regex)
  def deregister(subscriber: String): Unit = interests.remove(subscriber)
  def snapshot: Map[String, String] = interests.toMap

  /** Route a (batch) DataFrame with a `value` string column against the
    * CURRENT interest set → (subscriber, value) rows.
    *
    * The interest set is snapshotted at PLAN time, so each pattern is
    * folded in as a LITERAL `regexp_like` — codegen compiles every
    * regex once per task. The first cut cross-joined a broadcast
    * (subscriber, pattern) table instead; semantically identical, but
    * a non-foldable pattern column makes RLike recompile the regex PER
    * ROW — measured 12.1 s vs 1s-class for 3 interests over the 10M
    * CDR corpus (CDR_BENCH r14). One scan, one when() per interest,
    * matching subscribers collected map-side and exploded — no join,
    * no per-record driver traffic; dynamism still comes from the
    * per-batch re-plan in [[routeDynamic]]. Registering MORE interests
    * adds one compiled-regex evaluation per record each — the
    * broadcast-table form only wins if interests outgrow what a plan
    * can hold (thousands), far past the reference's "dozens of
    * subscribers" regime. */
  def route(lines: DataFrame): DataFrame = {
    val pats = snapshot.toSeq.sortBy(_._1)
    if (pats.isEmpty) {
      lines.sparkSession.emptyDataFrame
        .withColumn("subscriber", lit("")).withColumn("value", lit(""))
        .limit(0)
    } else {
      val matched = array(pats.map { case (sub, pat) =>
        when(regexp_like(col("value"), lit(pat)), lit(sub))
      }: _*)
      lines.select(explode(array_compact(matched)).as("subscriber"),
        col("value"))
    }
  }

  /** Dynamic streaming routing: each micro-batch re-snapshots the
    * registry, so registrations apply from the next batch on. `onBatch`
    * receives the routed (subscriber, value) batch — the per-subscriber
    * channel fan-out of the reference. */
  def routeDynamic(lines: DataFrame, onBatch: DataFrame => Unit): StreamingQuery =
    lines.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) => onBatch(route(batch)) }
      .start()
}
