package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared operator key from SURVEY.md §2C is registered here via the
  * module registries; `oracleSql` carries the DuckDB-equivalent SQL for the
  * driver's correctness gate.
  */
object SparkEntry {

  private lazy val all: Seq[Op] = {
    val ops = operators.Relational.ops ++ operators.TpchSuite.ops ++
      operators.TemporalSketchOps.ops ++ operators.StatsMlOps.ops ++
      operators.MetricsOps.ops ++ operators.MiningOps.ops ++
      operators.InferenceOps.ops ++ operators.RobustStatsOps.ops ++
      operators.RankStatsOps.ops ++
      operators.AnalyticsOps.ops ++
      operators.GraphOps.ops ++ operators.EtlOps.ops ++
      operators.SignalOps.ops ++
      operators.LlmOps.ops ++ operators.Multimodal.ops ++
      streaming.StreamOps.ops ++
      functions.FnFamilies.ops ++ functions.UdfOps.ops
    require(ops.map(_.key).distinct.size == ops.size, "duplicate operator keys")
    ops
  }

  /** Registered op count BEFORE the Map construction of [[queries]] — lets
    * tests assert no key was silently shadowed (Map dedupes; the require
    * above fires first, this keeps the guard visible at the test layer). */
  private[graft] def opCount: Int = all.size

  /** Flagship query (TPC-H-Q1-shaped pricing summary, SURVEY.md §7.3) on
    * sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.aggHashGroup.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2C. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(o => o.key -> o.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(o => o.oracle.map(sql => o.key -> sql)).toMap
}
