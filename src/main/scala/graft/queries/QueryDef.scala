package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark DataFrame program plus (when the
  * semantics are SQL-expressible) an equivalent DuckDB SQL oracle over
  * the same parquet tables. Column names/aliases MUST match between the
  * two — the driver's compare sorts columns by name before hashing.
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(oracle: String)(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(build, Some(oracle))
  def noOracle(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(build, None)
}
