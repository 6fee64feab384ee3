package graft.queries

import graft.{SparkEntry, SparkSpec}

/** The q125 certificate must carry REAL accuracy: every planted star
  * matched, flux within the solver contract, sub-0.2 px positions, FWHM
  * within 10% — the same planted-truth bars PipelineSpec holds the raw
  * solvers to, here asserted on the driver-visible certificate rows. */
class PhotometryCertSpec extends SparkSpec {

  test("q125 certifies flux, position, and FWHM recovery on sf0.001") {
    val rows = SparkEntry.queries("q125_photometry_accuracy")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === 5, "one certificate row per planted on-grid star")
    rows.foreach { r =>
      val (sx, sy) = (r.getDouble(0), r.getDouble(1))
      assert(r.getLong(2) >= 1, s"star ($sx,$sy) unmatched")
      assert(r.getDouble(3) < 0.15, s"flux_rel_err ${r.getDouble(3)} at ($sx,$sy)")
      assert(r.getDouble(4) < 0.2, s"pos_err_px ${r.getDouble(4)} at ($sx,$sy)")
      assert(r.getDouble(5) < 0.10, s"fwhm_rel_err ${r.getDouble(5)}")
    }
  }
}
