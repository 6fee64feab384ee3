package graft.queries

import graft.{SparkEntry, SparkSpec}

/** The q125 certificate must carry REAL accuracy: its (check, threshold,
  * pass) rows hash-match a constant oracle, so every check has to pass —
  * all planted stars matched, flux within the solver contract, sub-0.2 px
  * positions, FWHM within 10%. The raw error values behind the booleans
  * are asserted tightly in PipelineSpec/PhotometrySpec; here we pin the
  * driver-visible contract shape and that no check fails. */
class PhotometryCertSpec extends SparkSpec {

  test("q125 certifies flux, position, and FWHM recovery on sf0.001") {
    val rows = SparkEntry.queries("q125_photometry_accuracy")(
      spark, "/root/testdata/sf0.001").collect()
    val expected = Set("phot_stars_nonempty", "phot_all_stars_matched",
      "phot_max_flux_rel_err_le_0.15", "phot_max_pos_err_px_le_0.2",
      "phot_max_fwhm_rel_err_le_0.10")
    assert(rows.map(_.getString(0)).toSet === expected)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"certificate check ${r.getString(0)} failed")
    }
  }

  test("q125's oracle is the constant all-pass table") {
    val sql = SparkEntry.oracleSql("q125_photometry_accuracy")
    assert(sql.contains("phot_max_flux_rel_err_le_0.15") &&
      sql.contains("true"))
  }
}
