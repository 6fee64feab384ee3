package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine operator: a Spark query over the fixture tables and,
  * when SQL-expressible, the equivalent ANSI SQL the driver runs in DuckDB.
  *
  * Column names and types must line up exactly between `run` and `oracle` —
  * the driver sorts columns by name and hash-compares values (see the
  * builder contract in SparkEntry).
  */
final case class NamedQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    /** For oracle-free queries ONLY: why the omission is intentional and
      * which hash-gated certificate or ScalaTest carries its correctness.
      * Dumped by Verify as oracle_free.json so unverified queries are
      * explicitly annotated rather than silently accumulating. */
    note: Option[String] = None)
