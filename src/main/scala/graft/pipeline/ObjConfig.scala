package graft.pipeline

/** Target-object configuration (obj_data.py:18-23): the typed analog of the
  * reference's flat constants module. Values flow into queries as literals
  * or broadcast structs; the canonical row mirrors the reference's target.
  */
final case class ObjConfig(ra: Double, dec: Double, pmra: Double,
    pmdec: Double, plx: Double, epoch: Double)

object ObjConfig {
  /** The reference's canonical target constants (StHa 34, obj_data.py:18-23). */
  val canonical: ObjConfig =
    ObjConfig(ra = 73.59863195295, dec = 17.16480415593, pmra = -2.222,
      pmdec = -12.554, plx = 6.9628, epoch = 2016.0)
}
