package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through the driver contract.
  *
  * @param name   stable query id (keys `SparkEntry.queries` / `BENCH`)
  * @param run    the Spark-native implementation; `dir` is a scale-factor
  *               directory holding the Parquet star schema (TESTDATA.md)
  * @param oracle equivalent ANSI SQL for DuckDB over the same tables; None
  *               for ops whose semantics aren't SQL-expressible (the driver
  *               then records a weaker rows-only check)
  */
final case class OpQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object OpQuery {
  def sql(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): OpQuery =
    OpQuery(name, run, Some(oracle))
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): OpQuery =
    OpQuery(name, run, None)
}
