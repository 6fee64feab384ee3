package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String) =
    Files.createTempDirectory(s"graft-$name").toString + "/out"

  private val catalog = Seq(
    (1, 100.0, 5.0), (2, 400.0, 8.0), (3, -25.0, 1.0), (4, 250.0, 2.0))
    .toDF("id", "flux_fit", "flux_unc")

  test("CSV catalog sink filters positive flux, derives mag, round-trips") {
    val path = tmp("csv")
    CatalogSinks.writeCsvCatalog(catalog, "flux_fit", "flux_unc", path)
    val back = CatalogSinks.readCsvCatalog(spark, path)
    assert(back.count() === 3) // negative flux dropped (p_io.py:107)
    val m = back.filter($"id" === 1).select("mag").as[Double].head()
    assert(math.abs(m - (-2.5 * math.log10(100.0))) < 1e-9)
  }

  test("diagnostics text sink writes one summary line per group") {
    val path = tmp("txt")
    val df = Seq(("a", 1.0), ("a", 3.0), ("a", 2.0), ("b", 5.0))
      .toDF("g", "v")
    val summary = CatalogSinks.writeDiagnostics(df, "g", "v", path)
    assert(summary.count() === 2)
    val lines = spark.read.text(path).as[String].collect()
    assert(lines.length === 2)
    assert(lines.exists(_.startsWith("a | 3 | 1.0 | 3.0 | 2.0")))
  }

  test("partitioned parquet sink prunes by epoch on read") {
    val path = tmp("parq")
    val df = Seq((1, 10.0), (1, 11.0), (2, 20.0)).toDF("epoch_id", "v")
    CatalogSinks.writePartitioned(df, "epoch_id", path)
    val pruned = spark.read.parquet(path).filter($"epoch_id" === 1)
    assert(pruned.count() === 2)
    // partition pruning visible in the scan's file listing
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || pruned.inputFiles.length <= 2)
  }

  test("binaryFile source ingests opaque payloads with length metadata") {
    val dir = Files.createTempDirectory("graft-bin")
    Files.write(dir.resolve("img1.bin"), Array[Byte](1, 2, 3, 4))
    Files.write(dir.resolve("img2.bin"), Array[Byte](9, 9))
    val df = CatalogSinks.readBinary(spark, dir.toString + "/*.bin")
    val rows = df.select("length").as[Long].collect().sorted
    assert(rows.toSeq === Seq(2L, 4L))
  }

  test("ORC round-trip preserves schema and values") {
    val path = tmp("orc")
    CatalogSinks.writeOrc(catalog, path)
    val back = CatalogSinks.readOrc(spark, path)
    // ORC reads back nullable=true; names and types must survive exactly
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      catalog.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").as[(Int, Double, Double)].collect().toSeq ===
      catalog.orderBy("id").as[(Int, Double, Double)].collect().toSeq)
  }

  test("JSON round-trip preserves nested struct schema") {
    val path = tmp("json")
    val df = Seq((1L, "a", 2.5), (2L, "b", 3.5)).toDF("id", "s", "v")
      .withColumn("nested", struct($"s", $"v"))
    df.write.mode("overwrite").json(path)
    val back = spark.read.json(path)
    assert(back.count() === 2)
    assert(back.select("nested.s").as[String].collect().sorted.toSeq === Seq("a", "b"))
  }
}
