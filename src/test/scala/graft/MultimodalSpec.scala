package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: binary column model, fixed-width feature contract,
  * partition-parallel determinism (the decode itself is a marked stub). */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("mm_feature_extract yields fixed-width L1-normalized features") {
    val df = SparkEntry.queries("mm_feature_extract")(spark, sfDir).cache()
    assert(df.schema("features").dataType ===
      ArrayType(DoubleType, containsNull = true))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val fs = r.getSeq[Double](2)
      assert(fs.length === operators.Multimodal.StubDecoder.dims)
      val l1 = fs.sum
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
