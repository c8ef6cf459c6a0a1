package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

/** Config-driven ingestion pipelines — the reference framework's design
  * re-expressed as idiomatic Scala (SURVEY.md §2A / §7.1).
  *
  * The reference (framework.py:45-80) models a pipeline as a typed config
  * plus a runner: validate → plan/dry-run → idempotent DDL → read →
  * write(append|overwrite|merge) or stream → post-write layout pass.
  * Literal unions become sealed traits; the URI-scheme factory
  * (framework.py:297-302) becomes pattern-match dispatch; Delta-specific
  * machinery (MERGE, OPTIMIZE ZORDER) becomes join-based upsert and
  * range-repartition clustering over parquet (§7.4) since no Delta jar
  * ships in this environment.
  *
  * Scale posture: every write path is a parallel DataFrame write — the
  * runner never collects; merge is one shuffle on the merge keys (or a
  * broadcast anti-join when the source batch is small, left to AQE).
  */
sealed trait WriteMode
object WriteMode {
  case object Append extends WriteMode
  case object Overwrite extends WriteMode
  /** Join-based upsert (framework.py:211-231 semantics, §7.4 rewrite). */
  final case class Merge(keys: Seq[String]) extends WriteMode
}

sealed trait IngestMode
object IngestMode {
  case object Batch extends IngestMode
  /** Open Auto Loader analog: checkpointed bounded file-stream drain. */
  final case class Stream(checkpointPath: String) extends IngestMode
}

/** Mirrors IngestionConfig (framework.py:45-80), trimmed to the fields with
  * engine behavior; catalog identity is `database.table` (OSS Spark has a
  * 2-level session catalog — divergence documented in SURVEY.md §7.4). */
final case class IngestionConfig(
    database: String,
    table: String,
    sourcePath: String,
    sourceFormat: String = "parquet",
    options: Map[String, String] = Map.empty,
    writeMode: WriteMode = WriteMode.Append,
    ingestMode: IngestMode = IngestMode.Batch,
    partitionBy: Seq[String] = Nil,
    clusterBy: Seq[String] = Nil,
    targetPath: Option[String] = None,
    schema: Option[org.apache.spark.sql.types.StructType] = None,
    comment: Option[String] = None,
    tableProperties: Map[String, String] = Map.empty,
    dryRun: Boolean = false) {

  def fullTableName: String = s"$database.$table"

  /** A1 (framework.py:121-126): cross-field rules, fail fast. */
  def validate(): Either[String, IngestionConfig] = {
    val errs = Seq(
      Option.when(database.isEmpty || table.isEmpty)("database/table required"),
      Option.when(sourcePath.isEmpty)("sourcePath required"),
      writeMode match {
        case WriteMode.Merge(keys) if keys.isEmpty =>
          Some("merge requires non-empty merge keys")
        case _ => None
      },
      ingestMode match {
        case IngestMode.Stream(cp) if cp.isEmpty =>
          Some("stream mode requires a checkpoint path")
        // schema-less streams are allowed: the runner tracks an inferred
        // schema next to the checkpoint and evolves it (Auto Loader analog)
        case _ => None
      },
      Option.when(!Set("parquet", "json", "csv").contains(sourceFormat))(
        s"unsupported format: $sourceFormat")
    ).flatten
    if (errs.isEmpty) Right(this) else Left(errs.mkString("; "))
  }

  /** A2 (framework.py:128-137): human-readable plan for dry runs. */
  def plan: String = {
    val mode = writeMode match {
      case WriteMode.Merge(keys) => s"merge on (${keys.mkString(", ")})"
      case m => m.toString.toLowerCase
    }
    val ingest = ingestMode match {
      case IngestMode.Batch => "batch"
      case IngestMode.Stream(cp) => s"stream (checkpoint=$cp)"
    }
    s"""Ingestion plan
       |  source : $sourceFormat @ $sourcePath ${if (options.nonEmpty) options else ""}
       |  target : $fullTableName${targetPath.map(p => s" (external @ $p)").getOrElse(" (managed)")}
       |  mode   : $ingest / $mode
       |  layout : partitionBy=${partitionBy.mkString(",")} clusterBy=${clusterBy.mkString(",")}
       |""".stripMargin
  }
}

/** A12/A13 (framework.py:271-302): source-scheme specialization + factory.
  * Cloud auth hooks are no-ops in the reference too (framework.py:273-274);
  * here each scheme just validates its URI shape. */
sealed trait SourceKind { def validateUri(uri: String): Either[String, Unit] }
object SourceKind {
  case object Local extends SourceKind {
    def validateUri(uri: String) =
      Either.cond(!uri.contains("://") || uri.startsWith("file://"),
        (), s"not a local path: $uri")
  }
  case object S3 extends SourceKind {
    def validateUri(uri: String) =
      Either.cond(uri.startsWith("s3://") || uri.startsWith("s3a://"),
        (), s"not an s3 uri: $uri")
  }
  case object Azure extends SourceKind {
    def validateUri(uri: String) =
      Either.cond(uri.startsWith("abfss://") || uri.startsWith("wasbs://"),
        (), s"not an azure uri: $uri")
  }
  /** framework.py:297-302 dispatch-on-scheme. */
  def forUri(uri: String): SourceKind =
    if (uri.startsWith("s3://") || uri.startsWith("s3a://")) S3
    else if (uri.startsWith("abfss://") || uri.startsWith("wasbs://")) Azure
    else Local
}

/** A14 (framework.py:93-108): validate → plan/dry-run → DDL → read → write. */
final class IngestionRunner(spark: SparkSession, cfg: IngestionConfig) {

  // every pipeline session gets the curated-dimension auto-broadcast rule
  // (graft.plans.BroadcastDimensionsRule) — idempotent, hint-respecting
  graft.plans.BroadcastDimensions.install(spark)

  /** Runs the pipeline; returns the plan string (dry-run) or the row count
    * written. */
  def run(): Either[String, Long] =
    for {
      c <- cfg.validate()
      _ <- SourceKind.forUri(c.sourcePath).validateUri(c.sourcePath)
      n <- if (c.dryRun) { println(c.plan); Right(0L) } else execute(c)
    } yield n

  /** A3 (framework.py:139-141): idempotent DDL. */
  private def ensureDatabase(c: IngestionConfig): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${c.database}")

  private def readBatch(c: IngestionConfig): DataFrame = {
    // A4 (framework.py:144-151): options loop + optional explicit schema
    var r = spark.read.options(c.options)
    c.schema.foreach(s => r = r.schema(s))
    if (c.schema.isEmpty && c.sourceFormat != "parquet")
      r = r.option("inferSchema", "true")
    r.format(c.sourceFormat).load(c.sourcePath)
  }

  private def execute(c: IngestionConfig): Either[String, Long] = {
    ensureDatabase(c)
    c.ingestMode match {
      case IngestMode.Batch =>
        val df = readBatch(c)
        c.writeMode match {
          case WriteMode.Merge(keys) => Right(mergeInto(c, df, keys))
          case m => Right(writeBatch(c, df, m))
        }
      case IngestMode.Stream(cp) => Right(writeStream(c, cp))
    }
  }

  /** A5 (framework.py:154-175): append/overwrite, partitioned, managed
    * (saveAsTable) or external (save + register). */
  private def writeBatch(c: IngestionConfig, df: DataFrame, m: WriteMode): Long = {
    val mode = if (m == WriteMode.Overwrite) "overwrite" else "append"
    var w = df.write.format("parquet").mode(mode)
    if (c.partitionBy.nonEmpty) w = w.partitionBy(c.partitionBy: _*)
    c.targetPath match {
      case Some(p) =>
        w.save(p)
        registerExternal(c, p, Some(df.schema))
      case None => w.saveAsTable(c.fullTableName)
    }
    applyMetadata(c)
    optimizePostWrite(c)
    spark.table(c.fullTableName).count()
  }

  /** A9 (framework.py:240-246): external registration over parquet. When an
    * explicit schema is known it goes into the DDL (a parquet table otherwise
    * takes its schema from one file footer — wrong once the layout has
    * evolved); a registration whose column set drifted from the given schema
    * is dropped and recreated so evolution is visible to catalog readers. */
  private def registerExternal(c: IngestionConfig, path: String,
      schema: Option[org.apache.spark.sql.types.StructType]): Unit = {
    val drifted = schema.exists(sch =>
      spark.catalog.tableExists(c.fullTableName) &&
        spark.table(c.fullTableName).columns.toSeq != sch.fieldNames.toSeq)
    if (drifted) spark.sql(s"DROP TABLE IF EXISTS ${c.fullTableName}")
    val cols = schema.map(sch => s" (${sch.toDDL})").getOrElse("")
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS ${c.fullTableName}$cols USING PARQUET LOCATION '$path'")
  }

  /** A10 (framework.py:248-255): comment + table properties (quote-escaped),
    * applied after every write like the reference. */
  private def applyMetadata(c: IngestionConfig): Unit = {
    c.comment.foreach { m =>
      spark.sql(
        s"COMMENT ON TABLE ${c.fullTableName} IS '${m.replace("'", "''")}'")
    }
    if (c.tableProperties.nonEmpty) {
      val kvs = c.tableProperties.toSeq.sortBy(_._1).map { case (k, v) =>
        s"'${k.replace("'", "''")}' = '${v.replace("'", "''")}'"
      }.mkString(", ")
      spark.sql(s"ALTER TABLE ${c.fullTableName} SET TBLPROPERTIES ($kvs)")
    }
  }

  /** A7 (framework.py:211-231) without Delta: matched rows take the source
    * version, unmatched target rows survive — source ∪ (target anti source),
    * one shuffle on the keys; bootstraps an empty target like
    * framework.py:218's limit(0) write. Rewrite is staged to a temp path then
    * swapped in (non-transactional window documented in SURVEY.md §7.5.3). */
  private def mergeInto(c: IngestionConfig, source: DataFrame, keys: Seq[String]): Long = {
    if (!spark.catalog.tableExists(c.fullTableName)) {
      source.limit(0).write.format("parquet").saveAsTable(c.fullTableName)
    }
    val target = spark.table(c.fullTableName)
    val merged = source.unionByName(
      target.join(source.select(keys.map(col): _*).distinct(), keys, "left_anti"))
    val staged = java.nio.file.Files.createTempDirectory("graft_merge_").toString
    merged.write.mode("overwrite").parquet(staged)
    spark.read.parquet(staged).write.mode("overwrite")
      .format("parquet").saveAsTable(c.fullTableName)
    applyMetadata(c)
    optimizePostWrite(c)
    spark.table(c.fullTableName).count()
  }

  /** A6 (framework.py:177-209) open analog: file stream → checkpointed
    * parquet append, drained bounded via AvailableNow. With no explicit
    * schema, the schema is tracked and evolved next to the checkpoint
    * (framework.py:15, 184-187 `cloudFiles.schemaLocation` /
    * `inferColumnTypes` analog). */
  private def writeStream(c: IngestionConfig, checkpoint: String): Long = {
    val target = c.targetPath.getOrElse(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:") +
        s"/${c.database}.db/${c.table}")
    val schema = c.schema.getOrElse(trackedSchema(c, checkpoint))
    val q = spark.readStream.options(c.options).schema(schema)
      .format(c.sourceFormat).load(c.sourcePath)
      .writeStream.format("parquet").option("path", target)
      .option("checkpointLocation", checkpoint)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    registerExternal(c, target, Some(schema))
    applyMetadata(c)
    spark.table(c.fullTableName).count()
  }

  /** Streaming schema tracking: infer the landing dir's current schema with
    * a batch read, merge it with the schema persisted by the previous run
    * (existing columns keep their position and type; NEW columns append —
    * older files read them as null), persist the merged schema next to the
    * checkpoint, and stream with it. Production note: at 100 TB the
    * inference read should be bounded to the newest landing files; the
    * persisted-merge logic is unchanged. */
  private def trackedSchema(c: IngestionConfig,
      checkpoint: String): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types.{DataType, StructType}
    val f = new java.io.File(checkpoint, "graft_schema.json")
    var r = spark.read.options(c.options)
    if (c.sourceFormat == "csv") r = r.option("inferSchema", "true")
    val inferred = r.format(c.sourceFormat).load(c.sourcePath).schema
    val merged =
      if (f.exists()) {
        val prev = DataType.fromJson(new String(
          java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
          .asInstanceOf[StructType]
        StructType(prev.fields ++
          inferred.fields.filterNot(x => prev.fieldNames.contains(x.name)))
      } else inferred
    f.getParentFile.mkdirs()
    java.nio.file.Files.write(f.toPath, merged.json.getBytes("UTF-8"))
    merged
  }

  /** A11 (framework.py:256-266) OPTIMIZE/ZORDER emulation, failure-tolerant:
    * range-repartition + sort-within-partitions on the cluster keys. */
  private def optimizePostWrite(c: IngestionConfig): Unit =
    if (c.clusterBy.nonEmpty) try {
      val t = spark.table(c.fullTableName)
      val staged = java.nio.file.Files.createTempDirectory("graft_opt_").toString
      t.repartitionByRange(c.clusterBy.map(col): _*)
        .sortWithinPartitions(c.clusterBy.map(col): _*)
        .write.mode("overwrite").parquet(staged)
      spark.read.parquet(staged).write.mode("overwrite")
        .format("parquet").saveAsTable(c.fullTableName)
    } catch { case e: Exception =>
      System.err.println(s"[ingest] optimize skipped: ${e.getMessage}")
    }
}
