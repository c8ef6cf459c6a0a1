package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: binary column model, fixed-width feature contract,
  * partition-parallel determinism (the decode itself is a marked stub). */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("mm_feature_extract yields fixed-width L1-normalized features") {
    val df = SparkEntry.queries("mm_feature_extract")(spark, sfDir).cache()
    // features cross the comparison boundary as a comma-joined string of
    // 1e6-scaled ints (raw arrays crash the driver comparator)
    assert(df.schema("features_sig").dataType === StringType)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val fs = r.getString(2).split(",").map(_.toLong)
      assert(fs.length === operators.Multimodal.StubDecoder.dims)
      val l1 = fs.sum / 1e6
      assert(math.abs(l1 - 1.0) < 1e-3, s"L1 norm $l1 for doc ${r.getLong(0)}")
    }
  }

  test("mm_feature_extract is deterministic across partitions counts") {
    val a = SparkEntry.queries("mm_feature_extract")(spark, sfDir).collect()
    val b = SparkEntry.queries("mm_feature_extract")(spark, sfDir).collect()
    assert(a.toSeq === b.toSeq)
  }

  test("StubDecoder contract: empty payload is safe, output width fixed") {
    val z = operators.Multimodal.StubDecoder.decode(Array.emptyByteArray)
    assert(z.length === operators.Multimodal.StubDecoder.dims)
    assert(z.forall(_ == 0f))
  }
}
