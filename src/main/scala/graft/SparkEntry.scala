package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{BtrdbQueries, DistillateQueries, EngineSqlQueries, EtlQueries, QueryDef, RelQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def all: Map[String, QueryDef] =
    BtrdbQueries.defs ++ RelQueries.defs ++ EtlQueries.defs ++
      EngineSqlQueries.defs ++ DistillateQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelQueries.defs("q1_agg").build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (name, d) => name -> d.build }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (name, QueryDef(_, Some(sql))) => name -> sql }
}
