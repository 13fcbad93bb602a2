// scratch: per-stage profile of a query — where does the wall go?
// sbt "runMain graft.StageProf q45_supplier_count_by_class" (or the raw-
// java launcher); SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS /
// SPARK_GRAFT_MAX_PARTITION honored like Bench. Prints, for the SECOND
// (warm) execution: total wall, then every stage's wall, summed executor
// task time, task count, and shuffle-read bytes — the gap between the
// query wall and Σ stage walls is driver/planning/scheduling time that
// no stage owns (the "Spark session floor" of the sf1 decomposition,
// made visible).
package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
object StageProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scale/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = ToolConf(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION", "128m"))
      // shuffled-hash-over-SMJ parity with Bench (rationale there)
      .config("spark.sql.join.preferSortMergeJoin",
        (sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "0") == "1").toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class St(id: Int, name: String, wallMs: Long, runMs: Long,
      tasks: Int, shufReadMb: Double, inputMb: Double)
    val stages = scala.collection.mutable.ArrayBuffer[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {
          c <- si.completionTime; s <- si.submissionTime
        } yield c - s).getOrElse(0L)
        stages.synchronized {
          stages += St(si.stageId, si.name.linesIterator.next().take(70),
            wall, si.taskMetrics.executorRunTime, si.numTasks,
            si.taskMetrics.shuffleReadMetrics.totalBytesRead / 1048576.0,
            si.taskMetrics.inputMetrics.bytesRead / 1048576.0)
        }
      }
    })
    args.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).count() // warm: JIT + codegen + page cache
      Thread.sleep(500)
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain
      stages.synchronized {
        val sumWall = stages.map(_.wallMs).sum / 1000.0
        println(f"QUERY $n wall $wall%.3f s, ${stages.size} stages, " +
          f"sum(stage wall) $sumWall%.3f s, unowned ${wall - sumWall}%.3f s")
        stages.sortBy(-_.wallMs).foreach { s =>
          println(f"  stage ${s.id}%4d wall ${s.wallMs / 1000.0}%7.3f s " +
            f"run ${s.runMs / 1000.0}%8.3f s tasks ${s.tasks}%4d " +
            f"in ${s.inputMb}%7.1f MB shufRead ${s.shufReadMb}%7.1f MB  ${s.name}")
        }
      }
    }
    spark.stop()
  }
}
