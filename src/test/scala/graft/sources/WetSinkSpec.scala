package graft.sources

import graft.{SparkSpec, TempDirs}

/** WetSink file-level semantics beyond the q186 gate: directory layout,
  * empty partitions, retry idempotency (rewrite replaces, never
  * duplicates), and read-back exclusion of in-progress temp files. */
class WetSinkSpec extends SparkSpec {
  import spark.implicits._

  private def rows(n: Int) = (0 until n)
    .map(i => (s"http://ex.com/$i", s"text Ω $i"))

  test("write → read round-trips every record across multiple files") {
    val dir = TempDirs.create("wet_spec")
    val manifest = WetSink.write(rows(10).toDS().repartition(3), dir)
    assert(manifest.map(_._2).sum === 10L)
    assert(manifest.forall(_._1.endsWith(".warc.wet.gz")))
    // every non-empty partition produced exactly one container file
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(files.toSeq === manifest.map(_._1).sorted)
    val back = WetSink.read(spark, dir)
      .select("uri", "wet_text").as[(String, String)].collect().toSet
    assert(back === rows(10).toSet)
  }

  test("empty partitions write no file; rewrite replaces instead of duplicating") {
    val dir = TempDirs.create("wet_spec_empty")
    // 2 rows over 8 partitions: at most 2 files
    val m1 = WetSink.write(rows(2).toDS().repartition(8), dir)
    assert(m1.size <= 2)
    // a retried/re-run write of the same partitioning REPLACES files
    // (temp + atomic rename), so the directory never double-counts
    WetSink.write(rows(2).toDS().repartition(8), dir)
    assert(WetSink.read(spark, dir).count() === 2L)
  }

  test("read-back ignores a stray .inprogress temp file") {
    val dir = TempDirs.create("wet_spec_tmp")
    WetSink.write(rows(3).toDS().coalesce(1), dir)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, ".part-junk.warc.wet.gz.inprogress"),
      Array[Byte](1, 2, 3))
    assert(WetSink.read(spark, dir).count() === 3L)
  }
}
