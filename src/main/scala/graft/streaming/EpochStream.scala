package graft.streaming

import scala.collection.concurrent.TrieMap

import graft.pipeline.EpochPipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** The reference's per-epoch loop as a stream (SURVEY.md §2.9): epochs
  * land incrementally (new FITS sets in a directory ≙ new micro-batches),
  * and each micro-batch runs the REAL batch epoch pipeline per epoch —
  * combine → background → FWHM → detect → photometry → catalog, guards
  * included — then upserts keyed by epoch id. Re-delivered epochs
  * overwrite their own slot, so crash-and-rerun (README.md:22-27) is
  * idempotent end to end.
  */
object EpochStream {

  final case class Measured(x: Double, y: Double, flux: Double)

  /** Start the stream over long-form pixel rows
    * `(epoch_id, img_id, y, x, v)`. Results land in `store` (epoch →
    * status + measured stars) — a stand-in for any idempotent keyed sink. */
  def start(pixels: DataFrame, width: Int, height: Int, minStars: Int,
      store: TrieMap[Long, (String, Seq[Measured])]): StreamingQuery =
    pixels.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        // the epoch pipeline makes several passes over its pixels — pin
        // the micro-batch so each pass doesn't re-read the source
        val pinned = batch.persist()
        try {
          val epochs = pinned.select(col("epoch_id")).distinct()
            .collect().map(_.getLong(0)).sorted
          epochs.foreach { ep =>
            val px = pinned.filter(col("epoch_id") === ep).drop("epoch_id")
            val res = EpochPipeline.run(spark, px, width, height,
              minStars = minStars)
            val stars = res.catalog
              .select(col("xcentroid"), col("ycentroid"), col("flux"))
              .as[(Double, Double, Double)].collect()
              .map(t => Measured(t._1, t._2, t._3)).toSeq
            store.put(ep, (res.status, stars)) // idempotent upsert by epoch
          }
        } finally pinned.unpersist()
      }
      .start()
}
