package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named query: a Spark-first implementation plus (when SQL-expressible)
  * an equivalent ANSI-SQL oracle the driver runs in DuckDB over the same
  * parquet tables. Column names in `run`'s output and the oracle's SELECT
  * list must match exactly (the driver sorts columns by name before
  * hashing values).
  *
  * Determinism rules used throughout the query suite (so Spark and DuckDB
  * hash-match bit-for-bit):
  *   - money/ratio aggregates go through exact DECIMAL sums, then a single
  *     deterministic cast to DOUBLE (IEEE round-to-nearest is identical in
  *     both engines), never order-dependent double summation;
  *   - every query ends in a total ORDER BY;
  *   - no engine-specific hash functions — md5 hex strings (identical in
  *     Spark and DuckDB) are the shared deterministic hash primitive.
  */
final case class Q(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

object Q {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, Some(oracle), run)

  /** A query with no SQL-expressible oracle (driver does rows-only check). */
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, None, run)

  /** Planted-duplicate id: `id + offset`, guarded so a fixture whose base
    * ids ever reach `offset` fails LOUDLY instead of silently colliding
    * planted ids with real ones (which would corrupt the pair accounting
    * of every near-dup gate — d01/d05/d08/mm05). All shipped fixtures
    * stay far below the offsets (max doc_id 4 999 at sf0.1); the guard
    * is a codegen'd conditional, free on the happy path. */
  def plantedId(id: org.apache.spark.sql.Column, offset: Long)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    when(id < offset, id + offset).otherwise(raise_error(concat(
      lit(s"planted-id offset $offset collides with base id "),
      id.cast("string"))))
  }
}
