package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WET conversion sink as REAL FILES — the publishing shape of a crawl
  * extraction pipeline (Common Crawl ships `.warc.wet.gz`): a
  * partitioned directory of gzip MEMBER-STREAM containers, one file per
  * input partition, each member one `WARC-Type: conversion` record
  * ([[Warc.wetRecord]]).
  *
  * Scale posture (the KeyedParquetSink discipline applied to a raw
  * container format):
  *   - one container file per task, members streamed record-by-record
  *     through [[Warc.writeGz]] — bounded memory (one record in
  *     flight), no per-file driver work, no shuffle;
  *   - task-retry idempotent: the container is written to a hidden
  *     `.inprogress` temp name and atomically renamed, so a re-run of
  *     the same partition replaces its file instead of duplicating
  *     records, and a killed task never leaves a half-container a
  *     reader would walk;
  *   - `dir` must be a task-visible shared filesystem (object-store
  *     mount on a real cluster — the same contract every staged-replay
  *     harness and on-disk ANN index in this engine uses);
  *   - read-back is a distributed binaryFile scan + the same
  *     Content-Length walker that certifies the writer ([[Warc
  *     .recordsGz]]), so reader and writer cannot drift.
  */
object WetSink {

  /** Write `(uri, text)` rows under `dir`, one `.warc.wet.gz` container
    * per non-empty input partition. Runs the job eagerly; returns the
    * per-file manifest (file, n_records, n_bytes), bounded by the
    * partition count. */
  def write(rows: Dataset[(String, String)], dir: String)
      : Seq[(String, Long, Long)] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val name = f"part-$pid%05d.warc.wet.gz"
        val tmp = Paths.get(dir, s".$name.inprogress")
        val dst = Paths.get(dir, name)
        var n = 0L
        var nBytes = 0L
        val os = new java.io.BufferedOutputStream(Files.newOutputStream(tmp))
        try it.foreach { case (uri, text) =>
          val member = Warc.writeGz(Seq(Warc.wetRecord(uri, text)))
          os.write(member)
          nBytes += member.length
          n += 1
        } finally os.close()
        Files.move(tmp, dst, StandardCopyOption.REPLACE_EXISTING,
          StandardCopyOption.ATOMIC_MOVE)
        Iterator.single((name, n, nBytes))
      }
    }.collect().toSeq.sortBy(_._1)
  }

  /** Distributed read-back of a WET directory: binaryFile scan (hidden
    * `.inprogress` temp files are excluded by the glob) → member-stream
    * inflation → conversion records as
    * (uri, wet_text, n_bytes) — UTF-8 payload decode, scan-parallel. */
  def read(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc.wet.gz")
      .load(dir)
      .select(col("content")).as[Array[Byte]]
      .flatMap { bytes =>
        Warc.recordsGz(bytes)
          .filter(_.recordType.contains("conversion"))
          .map(r => (r.targetUri.getOrElse(""),
            new String(r.payload, java.nio.charset.StandardCharsets.UTF_8),
            r.payload.length.toLong))
      }
      .toDF("uri", "wet_text", "n_bytes")
  }
}
