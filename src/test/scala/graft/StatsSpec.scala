package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Sampling, Stats}

/** Closed-form fixtures for the statistics operators added in round 9:
  * Kaplan–Meier, Kolmogorov–Smirnov, Mann–Kendall, CUPED, Markov chains,
  * Benford and the Poisson bootstrap. Each test pins the operator to a
  * hand-computed expected value, independent of the DuckDB oracle.
  */
class StatsSpec extends AnyFunSuite with SparkSpec {

  private val eps = 1e-9

  test("kaplanMeier: textbook product-limit table, censoring and the S=0 endpoint") {
    import spark.implicits._
    // (duration, event): 1 death@1, death+censor@2, death@3, censor@4, death@5
    val subj = Seq((1L, 1L), (2L, 1L), (2L, 0L), (3L, 1L), (4L, 0L), (5L, 1L))
      .toDF("t", "ev")
    val km = Stats.kaplanMeier(subj)
      .select(col("t").as[Long], col("n_risk").as[Long], col("d").as[Long],
        col("c").as[Long], col("surv").as[Double])
      .collect().sortBy(_._1)
    assert(km.map(r => (r._1, r._2, r._3, r._4)).toSeq ==
      Seq((1L, 6L, 1L, 0L), (2L, 5L, 1L, 1L), (3L, 3L, 1L, 0L),
        (4L, 2L, 0L, 1L), (5L, 1L, 1L, 0L)))
    val surv = km.map(_._5)
    assert(math.abs(surv(0) - 5.0 / 6) < eps)
    assert(math.abs(surv(1) - 2.0 / 3) < eps)
    assert(math.abs(surv(2) - 4.0 / 9) < eps)
    assert(math.abs(surv(3) - 4.0 / 9) < eps, "censor-only step leaves S unchanged")
    assert(surv(4) == 0.0, "d = n_risk pins survival to exactly 0")
  }

  test("ksTest: identical samples D=0; disjoint D=1; half-overlap D=0.5") {
    import spark.implicits._
    def ks(a: Seq[Double], b: Seq[Double]): (Double, Long, Long) = {
      val df = (a.map((_, true)) ++ b.map((_, false))).toDF("v", "isa")
      val r = Stats.ksTest(df, col("v"), col("isa"))
        .select(col("d_stat").as[Double], col("n1").as[Long], col("n2").as[Long])
        .head()
      r
    }
    assert(ks(Seq(1, 2, 3, 4), Seq(1, 2, 3, 4))._1 == 0.0)
    val (d1, n1, n2) = ks(Seq(1, 2), Seq(3, 4))
    assert(d1 == 1.0 && n1 == 2 && n2 == 2)
    assert(math.abs(ks(Seq(1, 3), Seq(2, 3))._1 - 0.5) < eps)
  }

  test("mannKendall: monotone series gives maximal S; constant series gives var 0 and null z") {
    import spark.implicits._
    val cells = ((1 to 5).map(d => ("up", d.toLong, d.toLong)) ++
      (1 to 5).map(d => ("flat", d.toLong, 7L))).toDF("key", "day", "n")
    val r = Stats.mannKendall(cells).collect()
      .map(x => x.getString(0) -> x).toMap
    val up = r("up")
    assert(up.getLong(2) == 10L, "S = n(n-1)/2 for a strictly increasing series")
    val varS = 5.0 * 4 * 15 / 18
    assert(math.abs(up.getDouble(3) - varS) < eps)
    assert(math.abs(up.getDouble(4) - 9.0 / math.sqrt(varS)) < eps)
    val flat = r("flat")
    assert(flat.getLong(2) == 0L && flat.getDouble(3) == 0.0 && flat.isNullAt(4),
      "all-tied series: S=0, tie-corrected variance 0, z undefined (null)")
  }

  test("cupedAdjust: theta matches the pooled closed form; adjustment recenters on the covariate") {
    import spark.implicits._
    val per = Seq((0L, 1.0, 3.0), (0L, 2.0, 5.0), (1L, 3.0, 8.0), (1L, 4.0, 9.0))
      .toDF("arm", "x", "y")
    val xs = Seq(1.0, 2.0, 3.0, 4.0); val ys = Seq(3.0, 5.0, 8.0, 9.0)
    val n = 4.0
    val theta = (n * xs.zip(ys).map { case (a, b) => a * b }.sum - xs.sum * ys.sum) /
      (n * xs.map(a => a * a).sum - xs.sum * xs.sum)
    val mxAll = xs.sum / n
    val out = Stats.cupedAdjust(per).collect().map(r => r.getLong(0) -> r).toMap
    assert(math.abs(out(0L).getDouble(4) - theta) < eps)
    assert(math.abs(out(0L).getDouble(3) - (4.0 - theta * (1.5 - mxAll))) < eps)
    assert(math.abs(out(1L).getDouble(3) - (8.5 - theta * (3.5 - mxAll))) < eps)
  }

  test("markov: transition counts are exact and the stationary fixpoint matches hand iteration") {
    import spark.implicits._
    // user 1: A B A B A  — A→B ×2, B→A ×2; user 2: A A B — A→A, A→B
    val steps = Seq(
      (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"), (1L, 4L, "B"), (1L, 5L, "A"),
      (2L, 1L, "A"), (2L, 2L, "A"), (2L, 3L, "B"))
      .toDF("u", "o1", "cur").withColumn("o2", col("o1"))
    val trans = Stats.markovTransitions(steps)
    val tm = trans.select(col("cur").as[String], col("nxt").as[String],
      col("n").as[Long], col("p").as[Double]).collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(tm(("A", "B"))._1 == 3L && tm(("A", "A"))._1 == 1L && tm(("B", "A"))._1 == 2L)
    assert(math.abs(tm(("A", "B"))._2 - 0.75) < eps)
    assert(math.abs(tm(("B", "A"))._2 - 1.0) < eps)
    // hand power iteration of P = [[.25,.75],[1,0]] from (.5,.5), 8 rounds
    var pa = 0.5; var pb = 0.5
    for (_ <- 1 to 8) { val na = pa * 0.25 + pb * 1.0; val nb = pa * 0.75; pa = na; pb = nb }
    val st = Stats.markovStationary(trans, 8).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(st("A") - pa) < 1e-12 && math.abs(st("B") - pb) < 1e-12)
  }

  test("logRankTest: identical cohorts give z=0; fully separated cohorts give the hand-computed z") {
    import spark.implicits._
    val same = Seq((1L, 1L, 1L), (2L, 0L, 1L), (1L, 1L, 0L), (2L, 0L, 0L))
      .toDF("t", "ev", "g")
    val r0 = Stats.logRankTest(same).head()
    assert(r0.getLong(0) == 1L && math.abs(r0.getDouble(1) - 1.0) < eps)
    assert(math.abs(r0.getDouble(3)) < eps, "identical cohorts: z = 0")
    // g1 dies at t=1 (×2); g0 dies/censors at t=5: O1=2, E1=1, V=1/3
    val sep = Seq((1L, 1L, 1L), (1L, 1L, 1L), (5L, 1L, 0L), (5L, 0L, 0L))
      .toDF("t", "ev", "g")
    val r1 = Stats.logRankTest(sep).head()
    assert(r1.getLong(0) == 2L && math.abs(r1.getDouble(1) - 1.0) < eps)
    assert(math.abs(r1.getDouble(2) - 1.0 / 3) < eps)
    assert(math.abs(r1.getDouble(3) - math.sqrt(3.0)) < eps)
    assert(math.abs(r1.getDouble(4) - 3.0) < eps)
  }

  test("markovCountTable: entity-disjoint shards merge to exactly the one-shot counts") {
    import spark.implicits._
    val steps = (1L to 40L).flatMap { u =>
      (1L to 5L).map(i => (u, i, if ((u + i) % 3 == 0) "A" else if (i % 2 == 0) "B" else "C"))
    }.toDF("u", "o1", "cur").withColumn("o2", col("o1"))
    val oneShot = Stats.markovCountTable(steps)
      .as[(String, String, Long)].collect().toSet
    val shards = (0 to 3).map(i => Stats.markovCountTable(steps.where(pmod(col("u"), lit(4)) === i)))
    val merged = Stats.markovMergeCounts(shards)
      .select(col("cur"), col("nxt"), col("n").cast("long"))
      .as[(String, String, Long)].collect().toSet
    assert(merged == oneShot, "merge == rebuild count-for-count")
  }

  test("benfordAudit: digit counts exact, expectations follow log10(1+1/d), chi2 is their fold") {
    import spark.implicits._
    // 4 amounts starting with 1, 2 with 2, 1 with 9
    val df = Seq(10L, 150L, 1999L, 12L, 25L, 2L, 900L).toDF("a")
    val out = Stats.benfordAudit(df, col("a")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("1").getLong(1) == 4L && out("2").getLong(1) == 2L &&
      out("9").getLong(1) == 1L && out.size == 3)
    val exp1 = math.log10(2.0) * 7
    assert(math.abs(out("1").getDouble(2) - exp1) < eps)
    val chi2 = out.values.map { r =>
      math.pow(r.getLong(1) - r.getDouble(2), 2) / r.getDouble(2)
    }.sum
    assert(math.abs(out("1").getDouble(4) - chi2) < 1e-6)
  }

  test("poissonWeight: deterministic, Poisson(1)-shaped over 10k ids, replicates decorrelated") {
    import spark.implicits._
    val ids = (0L until 10000L).toDF("id")
    def counts(b: Int): Map[Long, Long] = ids
      .select(Sampling.poissonWeight(col("id"), lit(b)).as("w"))
      .groupBy("w").count()
      .select(col("w").as[Long], col("count").as[Long]).collect().toMap
    val c0 = counts(0)
    // CDF thresholds at 1e-4 resolution: expected shares 36.79/36.79/18.39/6.13%
    assert(math.abs(c0(0L) - 3679) < 200 && math.abs(c0(1L) - 3679) < 200)
    assert(math.abs(c0(2L) - 1839) < 150 && math.abs(c0.getOrElse(3L, 0L) - 613) < 100)
    val mean0 = c0.map { case (w, n) => w * n }.sum.toDouble / 10000
    assert(math.abs(mean0 - 1.0) < 0.05, s"mean weight ~1 (got $mean0)")
    assert(counts(0) == counts(0), "pure function of (id, b)")
    val c1 = counts(1)
    assert(c1 != c0, "different replicates draw different weights")
  }

  test("rank2Solve: exactly rank-2 ratings are recovered to ~zero residual") {
    import spark.implicits._
    // true user factors; item factors = the q324 hash-init formula
    val userTrue = Map(1L -> (2.0, 1.0), 2L -> (0.5, -1.5), 3L -> (3.0, 0.25))
    val items = (100L to 120L).map { i =>
      val g2 = (graft.ops.Hashing.hash60JVM(s"als-$i") % 1000).toDouble / 1000.0 - 0.5
      (i, 1.0, g2)
    }
    val ratings = for {
      (u, (u1, u2)) <- userTrue.toSeq
      (i, g1, g2) <- items
    } yield (u, i, u1 * g1 + u2 * g2)
    val df = ratings.toDF("u", "i", "r")
    val g0 = items.toDF("i", "g1", "g2")
    val users = graft.ops.Select.rank2Solve(df.join(g0, "i"),
      col("u"), col("g1"), col("g2"), col("r"), lambda = 1e-9)
    val got = users.collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    userTrue.foreach { case (u, (t1, t2)) =>
      assert(math.abs(got(u)._1 - t1) < 1e-6 && math.abs(got(u)._2 - t2) < 1e-6,
        s"user $u factors ${got(u)} != ($t1, $t2)")
    }
  }

  test("poissonBootstrapMean: interval brackets the point estimate and is deterministic") {
    import spark.implicits._
    val df = (1L to 2000L).map(i => (i, 100L + (i % 7) * 10)).toDF("id", "x")
    val r = Sampling.poissonBootstrapMean(df, col("id"), col("x"), 32)
      .select(col("n").as[Long], col("mean_x").as[Double],
        col("boot_lo").as[Double], col("boot_hi").as[Double]).head()
    assert(r._1 == 2000L)
    assert(r._3 < r._2 && r._2 < r._4, s"CI brackets the mean: $r")
    assert(r._4 - r._3 < 5.0, "interval width is sane for n=2000")
    val r2 = Sampling.poissonBootstrapMean(df, col("id"), col("x"), 32)
      .select(col("boot_lo").as[Double], col("boot_hi").as[Double]).head()
    assert(r2 == ((r._3, r._4)), "bootstrap is fully deterministic")
  }

  test("isotonicBins: minimax fit equals the hand-computed PAV pools and is nondecreasing") {
    import spark.implicits._
    // 5 bins (bins=5, scores at bin centers), 10 rows each with positive
    // counts (1, 3, 2, 6, 5) -> raw rates (.1, .3, .2, .6, .5). PAV pools
    // the two violating adjacent pairs: (.3,.2) -> .25 and (.6,.5) -> .55.
    val rows = for {
      (bin, pos) <- Seq(0 -> 1, 1 -> 3, 2 -> 2, 3 -> 6, 4 -> 5)
      i <- 0 until 10
    } yield ((bin + 0.5) / 5.0, i < pos)
    val df = rows.toDF("s", "p")
    val fit = Stats.isotonicBins(df, col("s"), col("p"), bins = 5)
      .select(col("bin").as[Int], col("pos_rate").as[Double],
        col("iso_rate").as[Double])
      .collect().sortBy(_._1)
    assert(fit.map(_._1).toSeq == Seq(0, 1, 2, 3, 4))
    val expected = Seq(0.1, 0.25, 0.25, 0.55, 0.55)
    fit.zip(expected).foreach { case ((b, _, iso), e) =>
      assert(math.abs(iso - e) < eps, s"bin $b: iso=$iso expected=$e")
    }
    assert(fit.sliding(2).forall(w => w(0)._3 <= w(1)._3 + eps),
      "isotonic fit must be nondecreasing")
    // Weighted mean is preserved (PAV is a projection): sum n*iso == sum n*y.
    val lhs = fit.map(_._3 * 10).sum
    val rhs = fit.map(_._2 * 10).sum
    assert(math.abs(lhs - rhs) < 1e-6, "PAV preserves the weighted total")
  }

  test("isotonicBins: already-monotone rates are returned unchanged") {
    import spark.implicits._
    val rows = for {
      (bin, pos) <- Seq(0 -> 2, 1 -> 4, 2 -> 7)
      i <- 0 until 10
    } yield ((bin + 0.5) / 3.0, i < pos)
    val fit = Stats.isotonicBins(rows.toDF("s", "p"), col("s"), col("p"), bins = 3)
      .select(col("bin").as[Int], col("pos_rate").as[Double],
        col("iso_rate").as[Double])
      .collect().sortBy(_._1)
    fit.foreach { case (b, raw, iso) =>
      assert(math.abs(raw - iso) < eps, s"bin $b: monotone input must be a fixed point")
    }
  }

  test("calinskiHarabasz: hand-computed two-cluster closed form") {
    import spark.implicits._
    // A: (0,0),(2,0); B: (10,0),(12,0) → centroids (1,0),(11,0), g=(6,0),
    // W = 4, B = 2·25 + 2·25 = 100, CH = (100/1)/(4/2) = 50
    val df = Seq(
      (Array(0f, 0f), 0), (Array(2f, 0f), 0),
      (Array(10f, 0f), 1), (Array(12f, 0f), 1)).toDF("embedding", "label")
    val rows = graft.ops.Similarity
      .calinskiHarabasz(df, col("embedding"), col("label"))
      .collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("ch_index") - 50.0) < eps)
      assert(math.abs(r.getAs[Double]("w_k") - 2.0) < eps)
      assert(math.abs(r.getAs[Double]("b_k") - 50.0) < eps)
    }
  }

  test("optimalLengthBuckets: exact DP beats the greedy split and zeroes out separable histograms") {
    import spark.implicits._
    // lengths {1,2,10}, k=2: {1,2}+{10} pads 1; {1}+{2,10} pads 8 — the DP
    // must pick boundaries (2, 10) with total padding 1
    val df = Seq(1L, 2L, 10L).toDF("len")
    val rows = graft.ops.Select
      .optimalLengthBuckets(df, col("len"), k = 2, cap = 128)
      .collect().map(r => (r.getAs[Int]("bucket"), r.getAs[Long]("end_len"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("total_padding")))
      .sortBy(_._1)
    assert(rows.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq((1, 2L, 2L), (2, 10L, 1L)), s"got ${rows.toSeq}")
    assert(rows.forall(_._4 == 1L), s"total padding must be 1: ${rows.toSeq}")
    // two point masses, two buckets → zero padding
    val df2 = Seq(3L, 3L, 7L, 7L, 7L).toDF("len")
    val r2 = graft.ops.Select
      .optimalLengthBuckets(df2, col("len"), k = 2, cap = 128)
      .collect().map(r => r.getAs[Long]("total_padding"))
    assert(r2.forall(_ == 0L), s"separable histogram must pad 0: ${r2.toSeq}")
  }

  test("mannWhitney: separated groups hit effect {0,1}; all-tied variance is NULL z") {
    import spark.implicits._
    def run(rows: Seq[(Long, Long)]) = graft.ops.Stats
      .mannWhitney(rows.toDF("s", "a"), col("s"), col("a"))
      .collect().head
    // A={1,2} entirely below B={3,4}: U_a = 0, effect 0
    val lo = run(Seq((1L, 1L), (2L, 1L), (3L, 0L), (4L, 0L)))
    assert(lo.getAs[Double]("u_a") == 0.0 && lo.getAs[Double]("auc_effect") == 0.0)
    // A above B: U_a = n_a·n_b = 4, effect 1
    val hi = run(Seq((3L, 1L), (4L, 1L), (1L, 0L), (2L, 0L)))
    assert(hi.getAs[Double]("u_a") == 4.0 && hi.getAs[Double]("auc_effect") == 1.0)
    // everything tied: variance 0 → z must be NULL, never NaN
    val tied = run(Seq((5L, 1L), (5L, 0L)))
    assert(tied.isNullAt(tied.fieldIndex("z")), s"tied z must be NULL: $tied")
    assert(tied.getAs[Double]("auc_effect") == 0.5, "ties give half credit")
  }

  test("kruskalWallis: textbook separated H = 2.4; identical groups → H = 0") {
    import spark.implicits._
    def run(rows: Seq[(Long, String)]) = graft.ops.Stats
      .kruskalWallis(rows.toDF("s", "g"), col("s"), col("g"))
      .collect()
    // groups {1,2} vs {3,4}: R = 3, 7 → H = 0.6·(4.5+24.5) − 15 = 2.4
    val sep = run(Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b")))
    assert(math.abs(sep.head.getAs[Double]("h") - 2.4) < eps, s"got ${sep.head}")
    assert(math.abs(sep.head.getAs[Double]("h_corrected") - 2.4) < eps,
      "no ties → correction is identity")
    // identical distributions: midranks coincide → H = 0 exactly
    val same = run(Seq((1L, "a"), (2L, "a"), (1L, "b"), (2L, "b")))
    assert(math.abs(same.head.getAs[Double]("h")) < eps, s"got ${same.head}")
  }

  test("participationRatio: rank-1 cloud → PR 1; isotropic 2-D cloud → PR 2") {
    import spark.implicits._
    val rank1 = Seq((1L, Array(0f, 0f)), (2L, Array(2f, 0f)))
      .toDF("vec_id", "embedding")
    val r1 = graft.ops.Similarity
      .participationRatio(rank1, col("vec_id"), col("embedding"), 2)
      .collect().head
    assert(math.abs(r1.getAs[Double]("participation_ratio") - 1.0) < eps)
    assert(math.abs(r1.getAs[Double]("trace") - 1.0) < eps)
    val iso = Seq((1L, Array(0f, 0f)), (2L, Array(2f, 0f)),
      (3L, Array(0f, 2f)), (4L, Array(2f, 2f))).toDF("vec_id", "embedding")
    val r2 = graft.ops.Similarity
      .participationRatio(iso, col("vec_id"), col("embedding"), 2)
      .collect().head
    assert(math.abs(r2.getAs[Double]("participation_ratio") - 2.0) < eps)
    assert(math.abs(r2.getAs[Double]("dim_fraction") - 1.0) < eps)
  }

  test("mutualInformation: y=x gives MI=H(X) and NMI=1; independent grid gives MI=0; degenerate marginal gives NMI=0") {
    import spark.implicits._
    def run(rows: Seq[(String, String)]) = Stats
      .mutualInformation(rows.toDF("a", "b"), col("a"), col("b"))
      .collect().head
    // perfect dependence: joint is diagonal, MI = H(X) = H(Y), NMI = 1.
    // counts 10/20/30 → H = −Σ p·ln p with p = 1/6, 1/3, 1/2
    val dep = run(Seq.fill(10)(("a", "a")) ++ Seq.fill(20)(("b", "b")) ++
      Seq.fill(30)(("c", "c")))
    val hExp = -(1.0 / 6 * math.log(1.0 / 6) + 1.0 / 3 * math.log(1.0 / 3) +
      0.5 * math.log(0.5))
    assert(dep.getAs[Long]("n") == 60L && dep.getAs[Long]("cells") == 3L)
    assert(math.abs(dep.getAs[Double]("mi") - hExp) < eps, s"got $dep")
    assert(math.abs(dep.getAs[Double]("h_x") - hExp) < eps)
    assert(math.abs(dep.getAs[Double]("nmi") - 1.0) < eps)
    // exact independence: every joint cell has c·n = cx·cy → each ln term
    // is ln(1) = 0 EXACTLY (no float residue to tolerate)
    val ind = run(for { x <- Seq("a", "b"); y <- Seq("c", "d");
      _ <- 0 until 25 } yield (x, y))
    assert(ind.getAs[Double]("mi") == 0.0 && ind.getAs[Double]("nmi") == 0.0,
      s"independent grid must give exact zero: $ind")
    assert(math.abs(ind.getAs[Double]("h_x") - math.log(2)) < eps)
    // degenerate marginal: H(X) = 0 → NMI pinned to 0, never NaN
    val deg = run(Seq(("only", "p"), ("only", "q")))
    assert(deg.getAs[Double]("h_x") == 0.0 && deg.getAs[Double]("nmi") == 0.0)
  }

  test("cochranArmitage: textbook perfect trend z = 6/sqrt(5); flat rates give T = 0") {
    import spark.implicits._
    def run(rows: Seq[(Long, Long, Long)]) = Stats
      .cochranArmitage(rows.toDF("s", "n", "k")).collect().head
    // k = 2, 5, 8 of n = 10 at scores 0, 1, 2: p̄ = 0.5,
    // T = 21 − 0.5·30 = 6, Var = 0.25·(50 − 900/30) = 5
    val tr = run(Seq((0L, 10L, 2L), (1L, 10L, 5L), (2L, 10L, 8L)))
    assert(math.abs(tr.getAs[Double]("t_stat") - 6.0) < eps)
    assert(math.abs(tr.getAs[Double]("var_t") - 5.0) < eps)
    assert(math.abs(tr.getAs[Double]("z") - 6.0 / math.sqrt(5.0)) < eps)
    // identical rates at every score: zero trend exactly
    val flat = run(Seq((0L, 10L, 3L), (1L, 10L, 3L), (2L, 10L, 3L)))
    assert(flat.getAs[Double]("t_stat") == 0.0, s"got $flat")
  }

  test("cramersV: perfect 2x2 association gives V = 1 (corrected too); exact independence gives 0") {
    import spark.implicits._
    def run(rows: Seq[(String, String)]) = Stats
      .cramersV(rows.toDF("a", "b"), col("a"), col("b")).collect().head
    val perfect = run(Seq.fill(10)(("a", "a")) ++ Seq.fill(10)(("b", "b")))
    assert(perfect.getAs[Long]("n") == 20L && perfect.getAs[Long]("r") == 2L)
    assert(math.abs(perfect.getAs[Double]("chi2") - 20.0) < eps)
    assert(math.abs(perfect.getAs[Double]("v") - 1.0) < eps)
    // Bergsma correction is exact-1 here: φ̃² and (k̃−1) shrink identically
    assert(math.abs(perfect.getAs[Double]("v_corrected") - 1.0) < eps)
    val ind = run(for { x <- Seq("a", "b"); y <- Seq("c", "d");
      _ <- 0 until 5 } yield (x, y))
    assert(ind.getAs[Double]("chi2") == 0.0 && ind.getAs[Double]("v") == 0.0)
    assert(ind.getAs[Double]("v_corrected") == 0.0,
      "max(0, ·) must clamp the negative bias-corrected φ²")
  }

  test("cohensKappa: identity = 1; independence-shaped square = 0; constant labelings give NULL") {
    import spark.implicits._
    def run(rows: Seq[(String, String)]) = Stats
      .cohensKappa(rows.toDF("a", "b"), col("a"), col("b")).collect().head
    val same = run(Seq(("x", "x"), ("y", "y"), ("x", "x"), ("z", "z")))
    assert(math.abs(same.getAs[Double]("kappa") - 1.0) < eps)
    val sq = run(Seq(("x", "x"), ("x", "y"), ("y", "x"), ("y", "y")))
    assert(sq.getAs[Double]("p_o") == 0.5 && sq.getAs[Double]("p_e") == 0.5)
    assert(math.abs(sq.getAs[Double]("kappa")) < eps)
    val const = run(Seq(("x", "x"), ("x", "x")))
    assert(const.isNullAt(const.fieldIndex("kappa")),
      s"p_e = 1 must give NULL, never NaN: $const")
  }

  test("mcnemarTest: b=6,c=2 gives chi2_cc = 9/8; no disagreement gives NULL") {
    import spark.implicits._
    def run(rows: Seq[(Boolean, Boolean)]) = Stats
      .mcnemarTest(rows.toDF("a", "b"), col("a"), col("b")).collect().head
    val r = run(Seq.fill(6)((true, false)) ++ Seq.fill(2)((false, true)) ++
      Seq.fill(3)((true, true)) ++ Seq.fill(1)((false, false)))
    assert(r.getAs[Long]("n_a_only") == 6L && r.getAs[Long]("n_b_only") == 2L)
    assert(r.getAs[Long]("n_both") == 3L && r.getAs[Long]("n_neither") == 1L)
    assert(math.abs(r.getAs[Double]("chi2_cc") - 9.0 / 8.0) < eps)
    val agree = run(Seq((true, true), (false, false)))
    assert(agree.isNullAt(agree.fieldIndex("chi2_cc")),
      "b + c = 0 must give NULL, never NaN")
  }

  test("mcnemarTest: NULL gate values land in n_null, and the cells still account for n") {
    import spark.implicits._
    val r = Stats.mcnemarTest(
      Seq[(java.lang.Boolean, java.lang.Boolean)](
        (true, false), (null, true), (false, null), (true, true))
        .toDF("a", "b"), col("a"), col("b")).collect().head
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("n_null") == 2L)
    assert(r.getAs[Long]("n_a_only") == 1L && r.getAs[Long]("n_both") == 1L)
    assert(r.getAs[Long]("n_b_only") == 0L && r.getAs[Long]("n_neither") == 0L)
    assert(r.getAs[Long]("n_null") + r.getAs[Long]("n_both") +
      r.getAs[Long]("n_a_only") + r.getAs[Long]("n_b_only") +
      r.getAs[Long]("n_neither") == r.getAs[Long]("n"),
      s"cell decomposition must account for every row: $r")
  }

  test("brownForsythe: hand-computed two-group F = 648/202; equal spreads give tiny F") {
    import spark.implicits._
    // g1 = {1,2,3} (med 2 → z = 1,0,1), g2 = {10,20,30} (med 20 → z = 10,0,10)
    // between = 54, within = 202/3, F = 4 · 54/(202/3) = 648/202
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 10.0), ("b", 20.0), ("b", 30.0)).toDF("g", "y")
    val r = Stats.brownForsythe(df, col("g"), col("y")).collect().head
    assert(r.getAs[Long]("n_groups") == 2L && r.getAs[Long]("n_total") == 6L)
    assert(r.getAs[Long]("df1") == 1L && r.getAs[Long]("df2") == 4L)
    assert(math.abs(r.getAs[Double]("f_stat") - 648.0 / 202.0) < eps,
      s"got $r")
    // NULL y rows are dropped BEFORE the median window (Spark would rank
    // them first, DuckDB last, and nj would count them while the sums
    // ignore them) — the statistic must not move
    val withNulls = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", None), ("b", Some(10.0)), ("b", Some(20.0)), ("b", Some(30.0)),
      ("b", None)).toDF("g", "y")
    val rn = Stats.brownForsythe(withNulls, col("g"), col("y")).collect().head
    assert(rn.getAs[Long]("n_total") == 6L,
      s"NULL y must not count toward nj: $rn")
    assert(math.abs(rn.getAs[Double]("f_stat") - 648.0 / 202.0) < eps,
      s"NULL y must not move the statistic: $rn")
  }

  test("sliceDriftScores: hand-computed per-slice z and the gate's global drift_z; unknown slices tallied") {
    import spark.implicits._
    val ref = Seq(("a", 100L, 25L), ("b", 100L, 75L)).toDF("key", "n", "k")
    val live = Seq(("a", 4L, 1L), ("b", 4L, 4L), ("c", 2L, 2L))
      .toDF("key", "n", "k")
    val rows = Stats.sliceDriftScores(ref, live).collect()
      .map(r => r.getAs[String]("key") -> r).toMap
    assert(rows("a").getAs[Double]("z") == 0.0, "a sits exactly on its rate")
    assert(math.abs(rows("b").getAs[Double]("z") - 1.0 / math.sqrt(0.75)) < eps)
    assert(rows("c").isNullAt(rows("c").fieldIndex("z")),
      "no reference → NULL z")
    val g = rows("a") // global columns repeat on every row
    assert(g.getAs[Long]("n_unknown") == 1L)
    assert(g.getAs[Double]("expected_total") == 4.0)
    assert(g.getAs[Double]("variance_total") == 1.5)
    assert(g.getAs[Double]("actual_total") == 5.0)
    assert(math.abs(g.getAs[Double]("drift_z") - 1.0 / math.sqrt(1.5)) < eps,
      "the gate's observe() formula, bit for bit")
  }
}
