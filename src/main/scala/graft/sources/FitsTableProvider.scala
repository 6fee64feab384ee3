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
    // ship the SESSION hadoop conf to the executors — a fresh
    // Configuration() would silently drop filesystem credentials/settings
    // that the driver-side glob planning used
    new FitsReaderFactory(hduIndex, required.fieldNames,
      new SerializableHadoopConf(
        SparkSession.active.sessionState.newHadoopConf()))
}

private case class FitsInputPartition(file: String) extends InputPartition

/** Java-serializable wrapper for the session Hadoop configuration (the
  * upstream helper with these semantics is private[spark]). */
private class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
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

private class FitsReaderFactory(hduIndex: Int, columns: Array[String],
    conf: SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FitsPartitionReader(
      partition.asInstanceOf[FitsInputPartition].file, hduIndex, columns, conf)
}

/** Streams one file's pixels as InternalRows, block-wise: headers are
  * parsed by streaming 2880-byte blocks, the target HDU's data extent is
  * located by offset arithmetic (Long offsets — >2 GiB files are fine),
  * and pixels decode from ~1 MiB positioned reads. Peak heap per task is
  * one chunk, independent of frame size. The header map is converted once
  * per file; data bytes are never read when `v` is pruned. */
private class FitsPartitionReader(file: String, hduIndex: Int,
    columns: Array[String], conf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.catalyst.util.ArrayBasedMapData

  // pruning must not change cardinality (one row per pixel regardless of
  // projection) — it only controls whether data blocks get read at all
  private val needPixels = columns.contains("v")
  private val path = new Path(file)
  private val fs = path.getFileSystem(conf.value)
  private val fileLen = fs.getFileStatus(path).getLen
  private val in = fs.open(path)
  private def readAt(off: Long, buf: Array[Byte]): Unit =
    in.readFully(off, buf)

  private val hdu = Fits.locateHdu(readAt, fileLen, hduIndex)
  private val (width, height) = hdu match {
    case Some(h) if h.axes.length == 2 => (h.axes.head, h.axes(1))
    case _ => (0, 0)
  }
  private val (bitpix, bscale, bzero) = hdu match {
    case Some(h) => (h.bitpix,
      h.header.get("BSCALE").map(_.toDouble).getOrElse(1.0),
      h.header.get("BZERO").map(_.toDouble).getOrElse(0.0))
    case None => (8, 1.0, 0.0)
  }
  private val bytesPerPx = math.max(1, math.abs(bitpix) / 8)
  private val headerData = hdu.map { h =>
    val ks = h.header.keys.toArray
    ArrayBasedMapData(
      ks.map(k => UTF8String.fromString(k): Any),
      ks.map(k => UTF8String.fromString(h.header(k)): Any))
  }.orNull
  private val imgId = UTF8String.fromString(file)

  private val total: Long =
    if (hdu.exists(_.axes.length == 2)) width.toLong * height else 0L
  private var i = -1L

  // chunked decode state: `chunk` holds pixels [chunkStart, chunkStart+chunkLen)
  private val chunkPixels = math.max(1, (1 << 20) / bytesPerPx)
  private var chunk: java.nio.ByteBuffer = null
  private var chunkStart = 0L
  private var chunkLen = 0L
  private def refill(px: Long): Unit = {
    val n = math.min(chunkPixels.toLong, total - px).toInt
    val bytes = new Array[Byte](n * bytesPerPx)
    in.readFully(hdu.get.dataOffset + px * bytesPerPx, bytes)
    chunk = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    chunkStart = px
    chunkLen = n
  }
  private def decode(px: Long): Double = {
    // the guard uses the LOADED length, not the nominal chunk size: the
    // final partial chunk is shorter, and a non-sequential access (pushed
    // filters, reordered reads) past it must trigger a refill, not an
    // out-of-bounds read of the short buffer
    if (chunk == null || px >= chunkStart + chunkLen || px < chunkStart)
      refill(px)
    val o = ((px - chunkStart) * bytesPerPx).toInt
    val raw = bitpix match {
      case 8   => (chunk.get(o) & 0xff).toDouble
      case 16  => chunk.getShort(o).toDouble
      case 32  => chunk.getInt(o).toDouble
      case 64  => chunk.getLong(o).toDouble
      case -32 => chunk.getFloat(o).toDouble
      case -64 => chunk.getDouble(o)
      case b   => throw new IllegalArgumentException(s"BITPIX $b unsupported")
    }
    bzero + bscale * raw
  }

  // reused output row: the scan exec copies each row into an UnsafeRow
  private val colCodes: Array[Int] = columns.map {
    case "img_id" => 0
    case "header" => 1
    case "y" => 2
    case "x" => 3
    case "v" => 4
    case other => throw new IllegalArgumentException(s"unknown column $other")
  }
  private val rowVals = new Array[Any](columns.length)
  private val row = new GenericInternalRow(rowVals)

  override def next(): Boolean = { i += 1; i < total }

  override def get(): InternalRow = {
    var c = 0
    while (c < colCodes.length) {
      rowVals(c) = colCodes(c) match {
        case 0 => imgId
        case 1 => headerData
        case 2 => if (width > 0) i / width else 0L
        case 3 => if (width > 0) i % width else 0L
        case 4 => if (needPixels) decode(i) else 0.0
      }
      c += 1
    }
    row
  }

  override def close(): Unit = in.close()
}
