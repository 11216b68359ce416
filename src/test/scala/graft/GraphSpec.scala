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

  // --------------------------------------------------------------------
  // k-core peel — closed-form fixtures
  // --------------------------------------------------------------------

  private def core(edges: Seq[(Long, Long)], k: Int,
      rounds: Int = 12): Map[Long, Long] = {
    import spark.implicits._
    Graph.kCore(edges.toDF("id_a", "id_b"), k, rounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("2-core of a path is empty (peels one vertex per end per round)") {
    val path = (0L until 9L).map(i => (i, i + 1))
    assert(core(path, 2) == Map.empty[Long, Long])
  }

  test("2-core of a cycle is the cycle itself") {
    val cycle = (0L until 5L).map(i => (i, (i + 1) % 5))
    assert(core(cycle, 2) == (0L until 5L).map(_ -> 2L).toMap)
  }

  test("cycle + tendril: the tendril strips, the cycle stays") {
    val cycle = (0L until 4L).map(i => (i, (i + 1) % 4))
    val tendril = Seq((0L, 10L), (10L, 11L), (11L, 12L))
    val got = core(cycle ++ tendril, 2)
    assert(got.keySet == (0L until 4L).toSet)
    assert(got(1L) == 2L && got(0L) == 2L,
      "in-core degree must not count the stripped tendril edge")
  }

  test("3-core: K4 survives, K4 + pendant triangle loses the triangle") {
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    assert(core(k4, 3) == (0L to 3L).map(_ -> 3L).toMap)
    // glue a triangle (3,10,11) onto vertex 3: its members have degree 2
    // inside the triangle, so the 3-core is still just K4
    val glued = k4 ++ Seq((3L, 10L), (3L, 11L), (10L, 11L))
    assert(core(glued, 3) == (0L to 3L).map(_ -> 3L).toMap)
  }

  test("bounded peel converges: extra rounds are no-ops (fixpoint)") {
    // a 20-path needs 10 rounds; at 12 rounds the result is the fixpoint
    // and matches a much deeper peel exactly
    val path = (0L until 20L).map(i => (i, i + 1))
    val mixed = path ++ (100L until 105L).map(i => (i, if (i == 104L) 100L else i + 1))
    assert(core(mixed, 2, rounds = 12) == core(mixed, 2, rounds = 30))
  }

  private def lpa(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    import spark.implicits._
    Graph.labelPropagation(edges.toDF("id_a", "id_b"), rounds)
      .select(col("id").as[Long], col("lbl").as[Long]).collect().toMap
  }

  test("labelPropagation: disjoint cliques each converge to one community") {
    val twoK3 = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L))
    val l = lpa(twoK3, 4)
    assert(Set(1L, 2L, 3L).map(l) == Set(l(1L)), "first clique is one community")
    assert(Set(10L, 11L, 12L).map(l) == Set(l(10L)), "second clique is one community")
    assert(l(1L) != l(10L), "cliques stay separate communities")
  }

  test("labelPropagation: two cliques with one bridge keep distinct communities") {
    val bridged = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L))
    val l = lpa(bridged, 4)
    assert(l(1L) == l(2L) && l(2L) == l(3L))
    assert(l(10L) == l(11L) && l(11L) == l(12L))
    assert(l(1L) != l(10L),
      "a single bridge must not merge two dense communities (unlike CC)")
  }

  test("labelPropagation: extra rounds after convergence are no-ops") {
    val twoK3 = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L))
    assert(lpa(twoK3, 4) == lpa(twoK3, 8))
  }

  test("localClustering: K4 nodes are fully clustered; a pendant halves its anchor; deg-1 excluded") {
    import spark.implicits._
    // K4 on {1,2,3,4} + pendant edge (4,5): lcc(1..3)=1 (3 triangles,
    // deg 3); lcc(4) = 2·3/(4·3) = 0.5; node 5 (deg 1) must not appear
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    val m = Graph.localClustering(edges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(m.keySet == Set(1L, 2L, 3L, 4L), s"got ${m.keySet}")
    Seq(1L, 2L, 3L).foreach { i =>
      assert(m(i) == ((3L, 3L, 1.0)), s"node $i: ${m(i)}")
    }
    assert(m(4L) == ((4L, 3L, 0.5)), s"node 4: ${m(4L)}")
  }

  test("adamicAdar: square's diagonals score 2/ln 2; adjacent pairs excluded") {
    import spark.implicits._
    // C4 cycle 1-2-3-4-1: non-adjacent (1,3) and (2,4) each share two
    // degree-2 neighbors → score 2/ln 2; every adjacent pair is excluded
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("id_a", "id_b")
    val rows = Graph.adamicAdar(edges, k = 10).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getLong(3))))
    assert(rows.map(_._1).toSet == Set((1L, 3L), (2L, 4L)), s"got ${rows.toSeq}")
    rows.foreach { case (p, (s, n)) =>
      assert(n == 2L && math.abs(s - 2.0 / math.log(2.0)) < 1e-12,
        s"pair $p: ($s, $n)")
    }
  }
}
