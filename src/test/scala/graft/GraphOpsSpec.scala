package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fixpoint invariants for the iterative graph operators (the DuckDB
  * recursive-CTE oracle pins exact values; these pin the algebraic
  * properties any correct fixpoint must satisfy). */
class GraphOpsSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val comps =
    SparkEntry.queries("graph_components")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private lazy val hops =
    SparkEntry.queries("graph_bfs_hops")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("graph_components labels every nation with its component minimum") {
    assert(comps.size === 25)
    // a component id is the minimum member id, so it labels itself
    comps.values.toSet.foreach((c: Long) => assert(comps(c) === c))
    assert(comps.forall { case (v, c) => c <= v })
  }

  test("graph_bfs_hops starts at the source and grows by unit steps") {
    assert(hops(0L) === 0L)
    // hop levels are contiguous: every level h > 0 has a level h-1
    val levels = hops.values.toSet
    levels.filter(_ > 0).foreach(h => assert(levels.contains(h - 1)))
  }

  test("BFS reaches exactly the component of the source vertex") {
    val sourceComp = comps(0L)
    val expected = comps.collect { case (v, c) if c == sourceComp => v }.toSet
    assert(hops.keySet === expected)
  }

  test("both fixpoints are reproducible across runs") {
    val again = SparkEntry.queries("graph_components")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === comps)
  }

  test("components contraction converges in O(log n) rounds on a path graph") {
    // a planted 1024-node path: the worst shape for plain min-label
    // propagation (needs ~n rounds — the O(diameter) trap at 100 TB).
    // large-star/small-star contraction must reach the fixpoint within
    // ⌈log2 n⌉ + 4 rounds; connectedComponents THROWS if maxIter is hit,
    // so a converged run IS the round-bound assertion.
    import spark.implicits._
    val n = 1024
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("u", "v")
    val labels = operators.LlmOps.connectedComponents(edges, maxIter = 14)
    val labs = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labs.size === n)
    assert(labs.values.forall(_ === 0L), "single path component labels to 0")
  }

  test("graph_link_predict proposes only non-edges within one component") {
    val rows = SparkEntry.queries("graph_link_predict")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    rows.foreach { case (u, v, cn, j) =>
      assert(u < v)
      assert(cn >= 1, "a predicted pair shares at least one neighbor")
      assert(j > 0.0 && j <= 1.0)
      // sharing a neighbor implies same connected component
      assert(comps(u) === comps(v))
    }
  }
}
