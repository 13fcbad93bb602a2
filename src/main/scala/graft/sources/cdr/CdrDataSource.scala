package graft.sources.cdr

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPInputStream
import scala.jdk.CollectionConverters._
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for the reference's CDR/syslog line format
  * (IngestTest.java:112): `<pri> … {SET}[USERn]: EVENT: proto p …`.
  *
  * `spark.read.format("graft-cdr").load(dir)` yields structured rows
  * (pri, cdr_set, user_id, event, proto, line) straight off raw `.log` /
  * `.log.gz` files — the scan parallelizes per file (one InputPartition
  * each; a production variant would extend FileFormat for intra-file
  * splits of uncompressed files), gzip is decoded per partition, and
  * unparseable lines surface with null fields rather than failing the
  * scan. Demonstrates the V2 read path end-to-end: TableProvider →
  * Table → ScanBuilder → Batch → PartitionReaderFactory. */
class CdrDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-cdr"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = CdrTable.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new CdrTable(properties.asScala.getOrElse("path",
      throw new IllegalArgumentException("graft-cdr requires a path")))
}

object CdrTable {
  val Schema: StructType = StructType(Seq(
    StructField("pri", IntegerType),
    StructField("cdr_set", StringType),
    StructField("user_id", LongType),
    StructField("event", StringType),
    StructField("proto", IntegerType),
    StructField("line", StringType, nullable = false)))

  val LinePattern: scala.util.matching.Regex =
    """<(\d+)>.*\{([^}]*)\}\[USER(\d+)\]:\s*([A-Z0-9]+):\s*proto (\d+).*""".r
}

/** Java-serializable Hadoop Configuration carrier (the Writable
  * round-trip, same shape Spark uses internally) — lets the scan ship
  * the SESSION Hadoop conf to executor-side readers, so spark.hadoop.*
  * settings (S3A credentials, endpoints, timeouts) apply to the CDR
  * source exactly as they do to built-in file sources. */
class SerializableHadoopConf(@transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

class CdrTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-cdr:$path"
  override def schema(): StructType = CdrTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new CdrScan(path,
        org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
    }
}

class CdrScan(path: String, hadoopConf: org.apache.hadoop.conf.Configuration)
    extends Scan with Batch {
  override def readSchema(): StructType = CdrTable.Schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val hadoopPath = new Path(path)
    val fs = hadoopPath.getFileSystem(hadoopConf)
    val files = fs.listStatus(hadoopPath).filter(_.isFile).map(_.getPath.toString)
    files.sorted.map(f => CdrInputPartition(f): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new CdrReaderFactory(new SerializableHadoopConf(hadoopConf))
}

case class CdrInputPartition(file: String) extends InputPartition

class CdrReaderFactory(conf: SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new CdrPartitionReader(partition.asInstanceOf[CdrInputPartition].file, conf)
}

class CdrPartitionReader(file: String, conf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {
  private val hadoopPath = new Path(file)
  private val fs = hadoopPath.getFileSystem(conf.value)
  private val raw = fs.open(hadoopPath)
  private val reader = new BufferedReader(new InputStreamReader(
    if (file.endsWith(".gz")) new GZIPInputStream(raw) else raw, UTF_8))
  private var current: InternalRow = _

  override def next(): Boolean = {
    val line = reader.readLine()
    if (line == null) { current = null; false }
    else {
      current = line match {
        case CdrTable.LinePattern(pri, set, user, event, proto) =>
          InternalRow(pri.toInt, UTF8String.fromString(set), user.toLong,
            UTF8String.fromString(event), proto.toInt, UTF8String.fromString(line))
        case _ =>
          InternalRow(null, null, null, null, null, UTF8String.fromString(line))
      }
      true
    }
  }
  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
