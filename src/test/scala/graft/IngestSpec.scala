package graft

import java.io.{BufferedWriter, FileOutputStream, OutputStreamWriter}
import java.util.zip.GZIPOutputStream
import graft.sources.FsIO
import graft.streaming.Ingest

class IngestSpec extends GraftSuite {

  test("batch ingest reads gzip text transparently into compressed parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gz").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    // one gzip file + one plain file: codec is inferred per file
    val gz = new BufferedWriter(new OutputStreamWriter(
      new GZIPOutputStream(new FileOutputStream(s"$dir/in/part1.log.gz"))))
    (1 to 100).foreach(i => gz.write(s"<13> host rec $i\n"))
    gz.close()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/in/part2.log"),
      (101 to 150).map(i => s"<13> host rec $i").mkString("\n").getBytes)
    val n = Ingest.ingestText(spark, s"$dir/in", s"$dir/out", compression = "zstd")
    assert(n == 150)
    val back = spark.read.parquet(s"$dir/out")
    assert(back.columns.toSet == Set("line", "src_file"))
    assert(back.select("src_file").distinct().count() == 2)
  }

  test("fs round-trip preserves rows for every format") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fsio").toString
    val df = Tables.nation(spark, sf)
    FsIO.formats.filter(_ != "text").foreach { fmt =>
      val back = FsIO.roundTrip(df, dir, fmt)
      assert(back.count() == df.count(), s"$fmt lost rows")
      assert(back.columns.sorted.sameElements(df.columns.sorted), s"$fmt lost columns")
    }
    // text needs a single string column
    val txt = FsIO.roundTrip(df.selectExpr("n_name AS value"), dir, "text")
    assert(txt.count() == df.count())
  }
}
