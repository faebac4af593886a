package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Geometry + determinism pins for the integer-ppm PageRank loop
  * (x84's engine). The oracle hash-gate proves the full pipeline on
  * real data; these prove the update rule itself on graphs whose
  * ranks are knowable by symmetry. */
class PageRankSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], nodes: Seq[Long], iters: Int = 4) =
    PageRank.pagerankPpm(
      edges.toDF("doc_a", "doc_b"), nodes.toDF("doc_id"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangle nodes rank equally; the isolated node sits at the teleport floor") {
    val pr = run(Seq(1L -> 2L, 2L -> 3L, 1L -> 3L), Seq(1L, 2L, 3L, 9L))
    assert(pr(1L) === pr(2L) && pr(2L) === pr(3L), s"symmetry broken: $pr")
    assert(pr(9L) === 150000L, s"isolated node must settle at 0.15: $pr")
    assert(pr(1L) > pr(9L))
  }

  test("star center outranks its leaves") {
    val pr = run(Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 1L -> 5L), Seq(1L, 2L, 3L, 4L, 5L))
    assert(pr(1L) > pr(2L), s"hub must outrank a leaf: $pr")
    assert(pr(2L) === pr(3L) && pr(3L) === pr(4L) && pr(4L) === pr(5L))
  }

  test("ranks are invariant under edge repartitioning and input order") {
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L, 1L -> 3L)
    val nodes = Seq(1L, 2L, 3L, 4L, 7L)
    val a = run(edges, nodes)
    val b = PageRank.pagerankPpm(
      edges.reverse.toDF("doc_a", "doc_b").repartition(7),
      nodes.reverse.toDF("doc_id").repartition(3), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("hand-computed two-node chain after one iteration") {
    // nodes {1,2}, edge 1-2, deg=1 both, pr0=1e6:
    // inflow(v) = 1e6; pr1 = 150000 + 850000*1e6 div 1e6 = 1000000
    val pr = run(Seq(1L -> 2L), Seq(1L, 2L), iters = 1)
    assert(pr(1L) === 1000000L && pr(2L) === 1000000L, s"$pr")
  }
}
