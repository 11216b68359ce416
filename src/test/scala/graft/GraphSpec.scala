package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Graph

/** Closed-form fixtures for the triangle census — graphs whose counts are
  * provable by hand, so the degree-oriented algorithm is checked against
  * arithmetic, not against another implementation.
  */
class GraphSpec extends AnyFunSuite with SparkSpec {

  private def stats(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    val r = Graph.triangleStats(edges.toDF("id_a", "id_b")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
  }

  test("K4: 6 edges, 12 wedges, 4 triangles, clustering 1.0") {
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    assert(stats(k4) == ((6L, 12L, 4L, 1.0)))
  }

  test("path 0-1-2-3: 2 wedges, no triangles") {
    assert(stats(Seq((0L, 1L), (1L, 2L), (2L, 3L))) == ((3L, 2L, 0L, 0.0)))
  }

  test("star: all wedges at the hub, no triangles") {
    val star = (1L to 4L).map(l => (0L, l))
    assert(stats(star) == ((4L, 6L, 0L, 0.0)))
  }

  test("two disjoint triangles: clustering exactly 1.0") {
    val tris = Seq((0L, 1L), (0L, 2L), (1L, 2L), (10L, 11L), (10L, 12L), (11L, 12L))
    assert(stats(tris) == ((6L, 6L, 2L, 1.0)))
  }

  test("triangle + pendant edge: the hub wedge stays open") {
    // nodes 0-1-2 closed, 2-3 pendant: wedges = C(2,2)? degrees 2,2,3,1 ->
    // wedges = 1 + 1 + 3 + 0 = 5, one triangle, clustering 3/5
    val g = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L))
    assert(stats(g) == ((4L, 5L, 1L, 0.6)))
  }
}
