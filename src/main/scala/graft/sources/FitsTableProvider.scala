package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 FITS connector — the "at scale" ingestion path SURVEY.md
  * §2.1 names for import_images: `spark.read.format("fits").load(glob)`
  * yields long-form pixels `(img_id, y, x, v)` plus the header map, one
  * input partition per file (the natural FITS parallelism — files are
  * independent HDU streams, like the reference's per-epoch file loop).
  *
  * Column pruning is pushed into the reader: a query that only touches the
  * header map (metadata scans) never decodes pixel data, and a pixels-only
  * query never materializes the header strings per row. Options:
  * `hdu` (default 1) selects the image HDU, as the reference reads
  * `hdu[1].data` (core.py:45).
  *
  * Registered by class name: `.format("graft.sources.FitsTableProvider")`.
  */
class FitsTableProvider extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FitsTableProvider.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new FitsTable(properties.get("path"),
      Option(properties.get("hdu")).map(_.toInt).getOrElse(1))
}

object FitsTableProvider {
  val schema: StructType = StructType(Seq(
    StructField("img_id", StringType),
    StructField("header", MapType(StringType, StringType)),
    StructField("y", LongType),
    StructField("x", LongType),
    StructField("v", DoubleType)))
}

private class FitsTable(path: String, hduIndex: Int)
    extends Table with SupportsRead {
  override def name(): String = s"fits:$path"
  override def schema(): StructType = FitsTableProvider.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FitsScanBuilder(path, hduIndex)
}

private class FitsScanBuilder(path: String, hduIndex: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = FitsTableProvider.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new FitsScan(path, hduIndex, required)
}

private class FitsScan(path: String, hduIndex: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    // resolve the glob on the driver; one partition per file
    val hconf = SparkSession.active.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(hconf)
    val statuses = Option(fs.globStatus(p))
      .map(_.toSeq).getOrElse(Seq.empty)
      .flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq else Seq(st)
      }
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
    statuses.map(st =>
      FitsInputPartition(st.getPath.toString): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FitsReaderFactory(hduIndex, required.fieldNames)
}

private case class FitsInputPartition(file: String) extends InputPartition

private class FitsReaderFactory(hduIndex: Int, columns: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FitsPartitionReader(
      partition.asInstanceOf[FitsInputPartition].file, hduIndex, columns)
}

/** Streams one file's pixels as InternalRows. The header map is converted
  * once per file; pixel decode is skipped entirely when `v` is pruned. */
private class FitsPartitionReader(file: String, hduIndex: Int,
    columns: Array[String]) extends PartitionReader[InternalRow] {
  import org.apache.spark.sql.catalyst.util.ArrayBasedMapData

  // pruning must not change cardinality (one row per pixel regardless of
  // projection) — it only controls whether the data block gets decoded
  private val needPixels = columns.contains("v")
  private val bytes: Array[Byte] = {
    val hconf = new org.apache.hadoop.conf.Configuration()
    val p = new Path(file)
    val fs = p.getFileSystem(hconf)
    val len = fs.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    buf
  }
  private val hdus = Fits.parseHdus(bytes)
  private val hdu = if (hduIndex < hdus.length) Some(hdus(hduIndex)) else None
  private val (width, height) = hdu match {
    case Some(h) if h.axes.length == 2 => (h.axes.head, h.axes(1))
    case _ => (0, 0)
  }
  private val values: Array[Double] = hdu match {
    case Some(h) if needPixels && h.axes.length == 2 => Fits.pixelValues(bytes, h)
    case _ => Array.empty
  }
  private val headerData = hdu.map { h =>
    val ks = h.header.keys.toArray
    ArrayBasedMapData(
      ks.map(k => UTF8String.fromString(k): Any),
      ks.map(k => UTF8String.fromString(h.header(k)): Any))
  }.orNull
  private val imgId = UTF8String.fromString(file)

  private val total = if (hdu.isEmpty) 0 else width * height
  private var i = -1

  override def next(): Boolean = { i += 1; i < total }

  override def get(): InternalRow = {
    val y = if (width > 0) (i / width).toLong else 0L
    val x = if (width > 0) (i % width).toLong else 0L
    InternalRow.fromSeq(columns.toSeq.map {
      case "img_id" => imgId
      case "header" => headerData
      case "y" => y
      case "x" => x
      case "v" => if (i < values.length) values(i) else 0.0
      case other => throw new IllegalArgumentException(s"unknown column $other")
    })
  }

  override def close(): Unit = ()
}
