package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, Path, PathFilter}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** The java.nio checkpoint file manager must honor the CheckpointFileManager
  * contract Spark's streaming commit protocol depends on: atomic
  * rename-on-close, FileAlreadyExists on a losing non-overwrite commit,
  * FileNotFound on missing reads/lists, recursive delete — plus run a REAL
  * stateful streaming query end to end with identical results. */
class NioCheckpointFileManagerSpec extends SparkSpec {

  private def newFm(dir: String) =
    new NioCheckpointFileManager(new Path(dir), new Configuration(false))

  private def write(fm: NioCheckpointFileManager, p: Path, s: String,
      overwrite: Boolean): Unit = {
    val out = fm.createAtomic(p, overwrite)
    out.write(s.getBytes(StandardCharsets.UTF_8))
    out.close()
  }

  private def readAll(fm: NioCheckpointFileManager, p: Path): String = {
    val in = fm.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](4096)
      var n = in.read(tmp)
      while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
      new String(buf.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  test("createAtomic commits on close; temp file never visible afterwards") {
    val dir = graft.TempDirs.create("nio_cfm_atomic")
    val fm = newFm(dir)
    val p = new Path(s"$dir/offsets/0")
    write(fm, p, "batch-0", overwrite = false)
    assert(fm.exists(p))
    assert(readAll(fm, p) === "batch-0")
    // no temp or crc siblings left behind
    val leftovers = Files.list(Paths.get(dir, "offsets")).toArray.map(_.toString)
    assert(leftovers.length === 1, s"unexpected siblings: ${leftovers.toSeq}")
  }

  test("non-overwrite commit against an existing file loses loudly and " +
      "keeps the original") {
    val dir = graft.TempDirs.create("nio_cfm_race")
    val fm = newFm(dir)
    val p = new Path(s"$dir/commits/7")
    write(fm, p, "winner", overwrite = false)
    intercept[FileAlreadyExistsException] {
      write(fm, p, "loser", overwrite = false)
    }
    assert(readAll(fm, p) === "winner")
    // overwrite=true replaces
    write(fm, p, "replaced", overwrite = true)
    assert(readAll(fm, p) === "replaced")
  }

  test("cancel discards the temp file and commits nothing") {
    val dir = graft.TempDirs.create("nio_cfm_cancel")
    val fm = newFm(dir)
    val p = new Path(s"$dir/state/1.delta")
    val out = fm.createAtomic(p, overwriteIfPossible = true)
    out.write("abandoned".getBytes(StandardCharsets.UTF_8))
    out.cancel()
    assert(!fm.exists(p))
    assert(Files.list(Paths.get(dir, "state")).toArray.isEmpty)
  }

  test("open and list raise FileNotFoundException on missing paths; " +
      "delete is recursive and idempotent") {
    val dir = graft.TempDirs.create("nio_cfm_missing")
    val fm = newFm(dir)
    intercept[java.io.FileNotFoundException] {
      fm.open(new Path(s"$dir/nope"))
    }
    intercept[java.io.FileNotFoundException] {
      fm.list(new Path(s"$dir/nodir"), new PathFilter {
        override def accept(p: Path): Boolean = true
      })
    }
    fm.mkdirs(new Path(s"$dir/a/b"))
    write(fm, new Path(s"$dir/a/b/f"), "x", overwrite = true)
    val listed = fm.list(new Path(s"$dir/a/b"))
    assert(listed.length === 1 && listed.head.getLen === 1)
    fm.delete(new Path(s"$dir/a"))
    assert(!fm.exists(new Path(s"$dir/a")))
    fm.delete(new Path(s"$dir/a")) // second delete: no-op, no throw
  }

  test("positioned and sequential reads agree (state-store replay shape)") {
    val dir = graft.TempDirs.create("nio_cfm_seek")
    val fm = newFm(dir)
    val p = new Path(s"$dir/snapshot")
    write(fm, p, "0123456789", overwrite = true)
    val in = fm.open(p)
    try {
      in.seek(4)
      assert(in.getPos === 4)
      val b = new Array[Byte](3)
      assert(in.read(b, 0, 3) === 3)
      assert(new String(b, StandardCharsets.UTF_8) === "456")
      val pb = new Array[Byte](2)
      in.readFully(1L, pb) // positioned read must not disturb position
      assert(new String(pb, StandardCharsets.UTF_8) === "12")
      assert(in.getPos === 7)
    } finally in.close()
  }

  test("a stateful streaming aggregation runs end to end on the nio " +
      "manager with batch-identical results") {
    import spark.implicits._
    val ck = graft.TempDirs.create("nio_cfm_stream_ck")
    val prevFm = spark.conf.getOption(
      "spark.sql.streaming.checkpointFileManagerClass")
    // mirror the harness wrapper exactly: Spark's checksum manager STACKS
    // on top of the configured one for state-store files, so the
    // no-crc-siblings claim below holds only with checksums off (the
    // harness always runs this pair together)
    val ckSum = "spark.sql.streaming.checkpoint.fileChecksum.enabled"
    val prevCk = spark.conf.getOption(ckSum)
    spark.conf.set(ckSum, "false")
    spark.conf.set("spark.sql.streaming.checkpointFileManagerClass",
      NioCheckpointFileManager.className)
    try {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mem = MemoryStream[(Long, String, Double)]
      val counts = mem.toDF().toDF("id", "k", "v")
        .groupBy($"k").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      val q = counts.writeStream.outputMode(OutputMode.Complete())
        .format("memory").queryName("nio_cfm_out")
        .option("checkpointLocation", ck)
        .trigger(Trigger.ProcessingTime(0))
        .start()
      try {
        mem.addData((1L, "a", 1.0), (2L, "b", 2.0))
        q.processAllAvailable()
        mem.addData((3L, "a", 3.0), (4L, "c", 4.0))
        q.processAllAvailable()
        val got = spark.table("nio_cfm_out")
          .as[(String, Long, Double)].collect()
          .map { case (k, n, s) => k -> ((n, s)) }.toMap
        assert(got === Map("a" -> ((2L, 4.0)), "b" -> ((1L, 2.0)),
          "c" -> ((1L, 4.0))))
        // the checkpoint really went through the nio manager: offsets and
        // commits exist, with no Hadoop .crc siblings anywhere
        assert(Files.exists(Paths.get(ck, "offsets", "0")))
        assert(Files.exists(Paths.get(ck, "commits", "1")))
        val crcs = Files.walk(Paths.get(ck)).toArray.map(_.toString)
          .filter(_.endsWith(".crc"))
        assert(crcs.isEmpty, s"crc siblings: ${crcs.toSeq}")
      } finally q.stop()
    } finally {
      prevFm match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.checkpointFileManagerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.checkpointFileManagerClass")
      }
      prevCk match {
        case Some(v) => spark.conf.set(ckSum, v)
        case None => spark.conf.unset(ckSum)
      }
    }
  }

  test("non-local paths are rejected fast") {
    intercept[IllegalArgumentException] {
      new NioCheckpointFileManager(new Path("hdfs://nn/ck"),
        new Configuration(false))
    }
  }
}
