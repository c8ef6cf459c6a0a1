package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator from SURVEY.md §2C.
  *
  * @param key    registry key (one per §2C row)
  * @param fn     builds the operator's result over the testdata dir
  * @param oracle equivalent ANSI SQL runnable by DuckDB over the same
  *               parquet tables (None for non-SQL-expressible / approximate /
  *               hash-seeded / streaming ops — driver records rows-only)
  */
final case class Op(
    key: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** Table loaders for the driver testdata (see /root/repo/FIXTURES.md §A). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is nanosecond-precision parquet, which Spark 4 rejects by
      // default. Read nanos as long, then truncate to a microsecond
      // TimestampType — the same precision DuckDB resolves this file to, so
      // both engines order and bucket identical values (FIXTURES.md §A).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000L")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
