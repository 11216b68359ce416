package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Catalog-level assertions over real testdata (sf0.001): the approx-distinct
  * accuracy bound the q26 comment promises, and structural invariants of the
  * query catalog itself.
  */
class CatalogSpec extends AnyFunSuite with SparkSpec {

  test("q26: approx_count_distinct(rsd=0.01) within 5*rsd of q25's exact counts") {
    val sf = TestSpark.sf0001
    val exact = SparkEntry.queries("q25_count_distinct")(spark, sf)
      .select("event_type", "n_users").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("q26_approx_count_distinct")(spark, sf)
      .select("event_type", "approx_users").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k).toDouble
      assert(math.abs(ap - ex) <= math.max(1.0, 0.05 * ex),
        s"$k: approx $ap vs exact $ex outside 5*rsd bound")
    }
  }

  test("every catalog query has a unique name; oracle coverage is near-total") {
    val names = SparkEntry.catalog.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    val noOracle = SparkEntry.catalog.filter(_.oracle.isEmpty).map(_.name)
    assert(noOracle.size <= 2, s"unexpected oracle-less queries: $noOracle")
  }

  test("flagship entry() runs end-to-end on generated articles (smoke)") {
    val df = SparkEntry.entry(spark)
    val n = df.count()
    assert(n > 0, "flagship pipeline must emit finalized windows")
    assert(df.columns.toSeq == Seq("start", "end", "author", "average_word_count"))
  }
}
