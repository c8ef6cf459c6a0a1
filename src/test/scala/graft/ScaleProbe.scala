package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scale-proof runner (dev tool, test tree like [[PerfProbe]]): executes a
  * named set of registry keys against a scaled-up data dir (see
  * `tools/gen_sf.py`) WITHOUT dumping row-level output — each result is
  * materialized once through an aggregate pass that records the invariant
  * evidence the sf10 gate checks (`tools/check_sf10.py`):
  *
  *   - row count (for the ×N / == recurrence rules vs a reference run),
  *   - per-numeric-column min / max / null count (overflow canaries: a
  *     BIGINT count or sum that wrapped shows up as a negative min; a
  *     DOUBLE that blew up shows as Inf/NaN),
  *   - wall-clock seconds (the scale-shape evidence).
  *
  * Usage:
  *   SPARK_DRIVER_MEM=48g sbt -batch "Test/runMain graft.ScaleProbe \
  *     <dataDir> <out.json> key1,key2,..."
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir, outFile, keyCsv) = args
    val keys = keyCsv.split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sb = new StringBuilder("{")
    var first = true
    keys.foreach { k =>
      val fn = SparkEntry.queries.getOrElse(k,
        sys.error(s"unknown registry key: $k"))
      System.err.println(s"[scaleprobe] $k ...")
      val t0 = System.nanoTime()
      val cell =
        try {
          val df = fn(spark, dir)
          val numeric = df.schema.fields.filter(f => f.dataType match {
            case _: NumericType => true
            case _              => false
          }).map(_.name)
          val aggs = count(lit(1)).as("n") +:
            numeric.flatMap(c => Seq(
              min(col(c)).cast("double").as(s"min__$c"),
              max(col(c)).cast("double").as(s"max__$c"),
              sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls__$c")))
          val r = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).first()
          val secs = (System.nanoTime() - t0) / 1e9
          val cols = numeric.zipWithIndex.map { case (c, i) =>
            val base = 1 + i * 3
            val mn = if (r.isNullAt(base)) "null" else r.getDouble(base).toString
            val mx = if (r.isNullAt(base + 1)) "null"
                     else r.getDouble(base + 1).toString
            // sum() over an EMPTY result is NULL (a 0-row key is legal —
            // window_sma_cross legitimately has zero crossings at sf10)
            val nn = if (r.isNullAt(base + 2)) 0L else r.getLong(base + 2)
            s""""$c":{"min":${jNum(mn)},"max":${jNum(mx)},"nulls":$nn}"""
          }.mkString(",")
          s"""{"ok":true,"secs":${f(secs)},"rows":${r.getLong(0)},""" +
            s""""cols":{$cols}}"""
        } catch { case e: Throwable =>
          val secs = (System.nanoTime() - t0) / 1e9
          System.err.println(s"[scaleprobe] $k FAILED: " +
            s"${e.getClass.getName}: ${e.getMessage}")
          s"""{"ok":false,"secs":${f(secs)},"error":${jStr(
            s"${e.getClass.getName}: ${e.getMessage}")}}"""
        }
      if (!first) sb.append(",")
      first = false
      sb.append(jStr(k)).append(":").append(cell)
      System.err.println(s"[scaleprobe] $k done")
    }
    sb.append("}")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (sb.toString + "\n").getBytes("UTF-8"))
    println(s"[scaleprobe] wrote $outFile (${keys.length} keys)")
    spark.stop()
  }

  private def f(d: Double): String = "%.3f".format(d)

  /** JSON-legal numeric cell: Infinity/NaN (legal Scala doubles, illegal
    * JSON) are stringified so the canary survives json.load. */
  private def jNum(s: String): String =
    if (s == "null") "null"
    else if (s.exists(c => c.isLetter && c != 'E' && c != 'e')) jStr(s)
    else s

  private def jStr(s: String): String = "\"" + s.flatMap {
    case '"'          => "\\\""
    case '\\'         => "\\\\"
    case '\n'         => "\\n"
    case '\r'         => "\\r"
    case '\t'         => "\\t"
    case c if c < ' ' => "\\u%04x".format(c.toInt)
    case c            => c.toString
  } + "\""
}
