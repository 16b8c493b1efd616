package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{EventOps, Profiling, Stats}

/** Closed-form statistics family pinned on hand-computed fixtures: the
  * A/B 2×2 arithmetic (including the degenerate NULL guard), the
  * Kaplan–Meier product limit against a by-hand survival table, Gini on
  * known distributions, the EWMA dyadic closed form against a direct
  * recursive fold, OLS/Pearson on a planted exact line, Benford mass
  * totals, the DQ suite with planted violations, and gaps-islands with
  * planted streaks. */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  private def ev(rows: (Int, String, Int)*) =
    rows.map { case (u, t, d) => (u.toLong, t, ts(d)) }
      .toDF("user_id", "event_type", "ts")

  test("abTest: hand-computed 2×2 z and chi-square") {
    // arm0 (even ids): users 2,4 → 1 converts; arm1 (odd): 1,3,5 → 3 convert
    val df = ev((2, "purchase", 1), (4, "view", 1), (1, "purchase", 1),
      (3, "purchase", 2), (5, "purchase", 3), (2, "view", 4))
    val r = Stats.abTest(df, "user_id", "event_type", "purchase").head()
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("conv_a") == 1)
    assert(r.getAs[Long]("n_b") == 3 && r.getAs[Long]("conv_b") == 3)
    assert(r.getAs[Double]("rate_a") == 0.5 && r.getAs[Double]("rate_b") == 1.0)
    assert(r.getAs[Double]("lift") == 0.5)
    // pool = 4/5 → se = sqrt(.8*.2*(1/2+1/3)); z = .5/se
    val se = math.sqrt(0.8 * 0.2 * (1.0 / 2 + 1.0 / 3))
    assert(r.getAs[Double]("z_stat") ==
      math.floor(0.5 / se * 1e6 + 0.5) / 1e6)
    // chi2 = 5*(1*0 - 1*3)^2 / (2*3*4*1) = 45/24
    assert(r.getAs[Double]("chi2") == 1.875)
  }

  test("abTest: degenerate table (all convert) emits NULL z/chi2, not a throw") {
    val df = ev((1, "purchase", 1), (2, "purchase", 1))
    val r = Stats.abTest(df, "user_id", "event_type", "purchase").head()
    assert(r.isNullAt(r.fieldIndex("z_stat")))
    assert(r.isNullAt(r.fieldIndex("chi2")))
    assert(r.getAs[Double]("rate_a") == 1.0 && r.getAs[Double]("rate_b") == 1.0)
  }

  test("kaplanMeier: product limit matches the by-hand survival table") {
    // u1: first day1, purchase day2 → t=1 observed
    // u2: first day1, purchase day3 → t=2 observed
    // u3: first day1, last day3, no purchase → t=2 censored
    // u4: first day1, purchase day1 → t=0 observed
    val df = ev((1, "view", 1), (1, "purchase", 2),
      (2, "view", 1), (2, "purchase", 3),
      (3, "view", 1), (3, "click", 3),
      (4, "purchase", 1))
    val rows = Stats.kaplanMeier(df, "user_id", "event_type", "ts", "purchase")
      .orderBy("t_days").collect()
    // t=0: n=4, d=1 → S=3/4; t=1: n=3, d=1 → S=3/4*2/3=1/2;
    // t=2: n=2, d=1, c=1 → S=1/2*1/2=1/4
    assert(rows.map(_.getAs[Int]("t_days")).toSeq == Seq(0, 1, 2))
    assert(rows.map(_.getAs[Long]("n_risk")).toSeq == Seq(4L, 3L, 2L))
    assert(rows.map(_.getAs[Long]("d_conv")).toSeq == Seq(1L, 1L, 1L))
    assert(rows.map(_.getAs[Long]("c_censored")).toSeq == Seq(0L, 0L, 1L))
    val surv = rows.map(_.getAs[Double]("survival")).toSeq
    assert(math.abs(surv(0) - 0.75) < 2e-4)
    assert(math.abs(surv(1) - 0.5) < 2e-4)
    assert(math.abs(surv(2) - 0.25) < 2e-4)
  }

  test("kaplanMeier: total conversion at the last time hits the ln floor → S=0") {
    val df = ev((1, "purchase", 1), (2, "view", 1), (2, "purchase", 2))
    val rows = Stats.kaplanMeier(df, "user_id", "event_type", "ts", "purchase")
      .orderBy("t_days").collect()
    assert(rows.last.getAs[Double]("survival") == 0.0)
  }

  test("giniByGroup: equal values → 0; planted skew matches hand formula") {
    val members = Seq(("g", 1L, 10.0), ("g", 2L, 10.0), ("g", 3L, 10.0),
      ("h", 1L, 0.0), ("h", 2L, 0.0), ("h", 3L, 30.0))
      .toDF("seg", "id", "v")
    val r = Stats.giniByGroup(members, "seg", "id", "v")
      .orderBy("seg").collect()
    // equal: 2*(1+2+3)*10/(3*30) - 4/3 = 4/3 - 4/3 = 0
    assert(r(0).getAs[Double]("gini") == 0.0)
    // h: ranks on (0,0,30) → srx = 0*1+0*2+30*3=90; 2*90/(3*30)-4/3 = 2/3
    assert(r(1).getAs[Double]("gini") == 0.666667)
  }

  test("ewmaDaily: closed form equals the recursive definition exactly") {
    val counts = Seq(3, 7, 1, 5, 2, 8, 4) // one event per (day, i) count
    val df = counts.zipWithIndex.flatMap { case (n, i) =>
      (0 until n).map(j => (1L, "e", ts(i + 1, j % 24)))
    }.toDF("user_id", "event_type", "ts")
    val got = Stats.ewmaDaily(df, "event_type", "ts")
      .orderBy("day").select("ewma").as[Double].collect()
    val want = counts.tail.scanLeft(counts.head.toDouble)(
      (s, x) => 0.5 * x + 0.5 * s)
    // α = 1/2 keeps every term a dyadic rational → EXACT equality
    assert(got.toSeq == want.toSeq)
  }

  test("ewmaDaily: trailing-window restart keeps decimal headroom bounded") {
    intercept[IllegalArgumentException] {
      Stats.ewmaDaily(ev((1, "e", 1)), "event_type", "ts",
        maxHistoryDays = 101)
    }
    // restart: only the trailing 2 days survive → ewma restarts at day 6
    val df = ev((1, "e", 1), (1, "e", 6), (1, "e", 7), (1, "e", 7))
    val got = Stats.ewmaDaily(df, "event_type", "ts", maxHistoryDays = 2)
      .orderBy("day").select("ewma").as[Double].collect()
    assert(got.toSeq == Seq(1.0, 1.5)) // day1 dropped; s=[1, .5*2+.5*1]
  }

  test("olsByGroup: planted exact line y = 2x + 1 → slope/intercept/r² exact") {
    val df = Seq(("g", 1.0, 3.0), ("g", 2.0, 5.0), ("g", 3.0, 7.0),
      ("g", 4.0, 9.0)).toDF("g", "x", "y")
    val r = Stats.olsByGroup(df, "g", "x", "y").head()
    assert(r.getAs[Double]("slope") == 2.0)
    assert(r.getAs[Double]("intercept") == 1.0)
    assert(r.getAs[Double]("r2") == 1.0)
  }

  test("pearsonPairs: one pass over all pairs; planted ±1 correlations") {
    val df = Seq((1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0))
      .toDF("a", "b", "c")
    val rows = Stats.pearsonPairs(df, Seq("a", "b", "c"))
      .orderBy("x_col", "y_col").collect()
    val byPair = rows.map(r => (r.getString(0), r.getString(1)) ->
      r.getAs[Double]("corr")).toMap
    assert(byPair(("a", "b")) == 1.0)
    assert(byPair(("a", "c")) == -1.0)
    assert(byPair(("b", "c")) == -1.0)
    assert(rows.forall(_.getAs[Long]("n") == 3L))
  }

  test("benford: digit masses and frequencies account for every row") {
    val df = Tables.load(spark, sf, "orders")
    val rows = Stats.benford(df, "o_totalprice").collect()
    assert(rows.map(_.getAs[Long]("n")).sum == df.count())
    val expectedMass = rows.map(_.getAs[Double]("expected")).sum
    assert(rows.length <= 9 && rows.forall(r =>
      (1 to 9).map(_.toString).contains(r.getAs[String]("digit"))))
    assert(expectedMass <= 1.0 + 1e-9)
  }

  test("dqSuite: planted violations flip exactly the right constraints") {
    val fact = Seq(
      (1L, Option(10L), 5.0, "F"),
      (2L, Option(10L), -1.0, "X"), // bound + domain violations
      (2L, Option.empty[Long], 3.0, "P") // dup key + null fk
    ).toDF("k", "fk", "v", "st")
    val dim = Seq(10L).toDF("dk")
    val r = Profiling.dqSuite(fact, dim, "k", "fk", "v", 0.0, "st",
        Seq("F", "P", "O"), "fk", "dk")
      .collect().map(x => x.getString(0) -> (x.getDouble(1), x.getBoolean(2)))
      .toMap
    assert(r("row_count_nonempty") == ((3.0, true)))
    assert(r("completeness_fk") == ((0.666667, false)))
    assert(r("uniqueness_k") == ((0.666667, false)))
    assert(r("min_bound_v") == ((-1.0, false)))
    assert(r("domain_st") == ((0.666667, false)))
    assert(r("ri_fk_dk") == ((0.666667, false)))
  }

  test("chi2Independence: 2×2 equals abTest's chi-square; dof correct") {
    // same 2×2 as the abTest fixture: arm (parity) × converted
    val df = Seq(("a0", "y"), ("a0", "n"), ("a1", "y"), ("a1", "y"),
      ("a1", "y")).toDF("arm", "conv")
    val r = Stats.chi2Independence(df, "arm", "conv").head()
    assert(r.getAs[Long]("n") == 5 && r.getAs[Long]("dof") == 1)
    assert(r.getAs[Double]("chi2") == 1.875) // = abTest fixture's chi2
  }

  test("chi2Independence: empty cells contribute their expectation") {
    // 2×2 with a structural zero: (x,q) never observed
    // o: (x,p)=2, (y,p)=1, (y,q)=1; e(x,q)=2*1/4=0.5 must still count
    val df = Seq(("x", "p"), ("x", "p"), ("y", "p"), ("y", "q"))
      .toDF("a", "b")
    val r = Stats.chi2Independence(df, "a", "b").head()
    // full-grid chi2: e = {x,p:1.5, x,q:.5, y,p:1.5, y,q:.5}
    // Σ(o−e)²/e = .25/1.5 + .5 + .25/1.5 + .5 = 4/3; the two −4/3-ish
    // observed terms each round at 6 dp to −1.333333, so the decimal
    // sum lands at 1.333334 (the documented ±1e-6-per-term contract)
    assert(r.getAs[Double]("chi2") == 1.333334)
  }

  test("psi: identical samples → 0; planted shift crosses the 0.25 gate") {
    val ref = (1 to 100).map(i => i.toDouble).toDF("v")
    val same = Stats.psi(ref, ref, "v")
    assert(same.head().getAs[Double]("psi_total") == 0.0)
    val shifted = (1 to 100).map(i => i.toDouble + 80).toDF("v")
    val drift = Stats.psi(ref, shifted, "v").head().getAs[Double]("psi_total")
    assert(drift > 0.25, s"planted shift should trip the PSI gate, got $drift")
  }

  test("sequenceTripleSupport: ordering is enforced, not just presence") {
    // u1 has a<b<c (supports a→b→c); u2 has c<b<a only (must NOT)
    val df = ev((1, "a", 1), (1, "b", 2), (1, "c", 3),
      (2, "c", 1), (2, "b", 2), (2, "a", 3))
    val sup = EventOps.sequenceTripleSupport(df, "user_id", "event_type", "ts")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getAs[Long]("support")).toMap
    assert(sup(("a", "b", "c")) == 1L) // u1 only
    assert(sup(("c", "b", "a")) == 1L) // u2 only
    assert(!sup.contains(("b", "a", "c")))
  }

  test("calibration: per-bin reliability and ECE on a planted mix") {
    val df = Seq((0.25, false), (0.25, true), (0.25, false), (0.25, false),
      (0.75, true), (0.75, true)).toDF("score", "label")
    val rows = Stats.calibration(df, "score", "label").orderBy("bin").collect()
    assert(rows.map(_.getAs[Int]("bin")).toSeq == Seq(2, 7))
    assert(rows(0).getAs[Double]("conf") == 0.25 &&
      rows(0).getAs[Double]("acc") == 0.25 &&
      rows(0).getAs[Double]("gap") == 0.0)
    assert(rows(1).getAs[Double]("conf") == 0.75 &&
      rows(1).getAs[Double]("acc") == 1.0 &&
      rows(1).getAs[Double]("gap") == 0.25)
    // ece = 4/6·0 + 2/6·0.25 = 0.083333 (rounded term)
    assert(rows(0).getAs[Double]("ece_total") == 0.083333)
  }

  test("multiTouchAttribution: per-conversion splits and credit conservation") {
    val df = Seq((1, "view", 1), (1, "click", 2), (1, "purchase", 3),
      (2, "view", 1), (2, "purchase", 10), // view outside the 3-day window
      (2, "error", 9))
      .zipWithIndex.map { case ((u, t, d), i) => (i.toLong, u.toLong, t, ts(d)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = EventOps.multiTouchAttribution(df, "user_id", "event_type",
        "ts", "event_id", "purchase", 3)
      .collect().map(x => x.getString(0) ->
        (x.getAs[Long]("n_touches"), x.getAs[Double]("total_credit"))).toMap
    assert(r("view") == ((1L, 0.5)))   // u1's view; u2's is out of window
    assert(r("click") == ((1L, 0.5)))
    assert(r("error") == ((1L, 1.0)))  // u2's only in-window touch
    // conservation: 2 conversions with ≥1 touch → 2 units of credit
    assert(r.values.map(_._2).sum == 2.0)
  }

  test("deseasonalizedZScore: weekly dip stops tripping; plain z-score would") {
    // Jan 2024 starts on a Monday: 3 weeks, Sundays at 2 events, else 10
    val rows = (1 to 21).flatMap { d =>
      val n = if (d % 7 == 0) 2 else 10 // days 7,14,21 are Sundays
      (0 until n).map(j => (1L, "e", ts(d, j % 24)))
    }.toDF("user_id", "event_type", "ts")
    val plain = EventOps.rollingZScore(rows, "event_type", "ts")
      .filter(col("is_anomaly") === true).count()
    assert(plain >= 1, "the raw detector should flag the Sunday dips")
    val ds = EventOps.deseasonalizedZScore(rows, "event_type", "ts")
      .collect()
    assert(ds.forall(r => !r.getAs[Boolean]("is_anomaly")),
      "deseasonalized series must be flat — no anomalies")
    // flat at 4 dp: every day deseasonalizes to the same value
    assert(ds.map(_.getAs[Double]("deseasonalized")).distinct.length == 1)
  }

  test("rocAuc: perfect separation → 1, constant scorer → exactly 0.5, reversal → 0") {
    val perfect = Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false))
      .toDF("s", "l")
    assert(Stats.rocAuc(perfect, "s", "l").head().getAs[Double]("auc") == 1.0)
    val constant = Seq((0.5, true), (0.5, false), (0.5, true), (0.5, false))
      .toDF("s", "l")
    val c = Stats.rocAuc(constant, "s", "l").head()
    assert(c.getAs[Double]("auc") == 0.5) // all ties → exact half credit
    assert(c.getAs[Long]("n_pos") == 2 && c.getAs[Long]("n_neg") == 2)
    val reversed = Seq((0.1, true), (0.9, false)).toDF("s", "l")
    assert(Stats.rocAuc(reversed, "s", "l").head().getAs[Double]("auc") == 0.0)
    // hand case with one tie: pos at .8,.5; neg at .5,.2 — pair credit
    // (.8>.5)+(.8>.2)+(.5=.5)/2+(.5>.2) = 3.5 of 4 pairs
    val mixed = Seq((0.8, true), (0.5, true), (0.5, false), (0.2, false))
      .toDF("s", "l")
    assert(Stats.rocAuc(mixed, "s", "l").head().getAs[Double]("auc") == 0.875)
  }

  test("binaryChangepoint: a planted level shift is located exactly") {
    // 10 days at 2 events, then 10 days at 8 — the optimal binary
    // split is after day 10 (split_day = day 10), dropping SSE to 0
    val df = (1 to 20).flatMap { d =>
      (1 to (if (d <= 10) 2 else 8)).map(h => (1, "e", (d, h % 24)))
    }.map { case (u, t, (d, h)) => (u.toLong, t, ts(d, h)) }
      .toDF("user_id", "event_type", "ts")
    val r = EventOps.binaryChangepoint(df, "event_type", "ts").head()
    assert(r.getAs[java.sql.Date]("split_day").toString == "2024-01-10")
    assert(r.getAs[Double]("sse_split") == 0.0)
    // effect size: two flat segments → 100% of the variance explained
    assert(r.getAs[Double]("sse_drop_pct") == 100.0)
    // a FLAT series must report zero possible reduction, not crash
    val flat = (1 to 10).flatMap(d => Seq((1L, "e", ts(d))))
      .toDF("user_id", "event_type", "ts")
    val fr = EventOps.binaryChangepoint(flat, "event_type", "ts").head()
    assert(fr.getAs[Double]("sse_split") == 0.0 &&
      fr.getAs[Double]("sse_nosplit") == 0.0)
    assert(fr.isNullAt(fr.fieldIndex("sse_drop_pct")),
      "a flat series has no variance to explain — NULL, not 0/0")
  }

  test("gapsIslands: planted streaks split and tie-break correctly") {
    // u1: days 1,2,3 then 5,6 → streaks {3,2}; u2: 1 and 3 and 5 → {1,1,1}
    val df = ev((1, "e", 1), (1, "e", 2), (1, "e", 3), (1, "e", 5),
      (1, "e", 6), (2, "e", 1), (2, "e", 3), (2, "e", 5), (1, "e", 2))
    val r = EventOps.gapsIslands(df, "user_id", "ts")
      .orderBy("user_id").collect()
    assert(r(0).getAs[Long]("n_active_days") == 5)
    assert(r(0).getAs[Long]("n_streaks") == 2)
    assert(r(0).getAs[Long]("longest_streak") == 3)
    assert(r(0).getAs[java.sql.Date]("longest_start").toString == "2024-01-01")
    assert(r(1).getAs[Long]("n_streaks") == 3)
    assert(r(1).getAs[Long]("longest_streak") == 1)
    // ties → earliest island start
    assert(r(1).getAs[java.sql.Date]("longest_start").toString == "2024-01-01")
  }

  test("holtLinearDaily: constant series forecasts the constant; replay matches fold") {
    // constant series: level locks to the constant, trend stays 0
    val const = (1 to 3).flatMap(d => Seq.fill(5)((1, "e", d)))
    val rc = Stats.holtLinearDaily(ev(const: _*), "event_type", "ts", horizon = 3)
      .orderBy("h").collect()
    assert(rc.map(_.getAs[Double]("forecast")).toSeq == Seq(5.0, 5.0, 5.0))
    assert(rc.head.getAs[java.sql.Date]("last_day").toString == "2024-01-03")
    // ramp series 2,4,6,8: replay the α=β=½ recursion in plain Scala
    val ramp = (1 to 4).flatMap(d => Seq.fill(2 * d)((1, "r", d)))
    val got = Stats.holtLinearDaily(ev(ramp: _*), "event_type", "ts", horizon = 2)
      .orderBy("h").collect()
    var l = 2.0; var b = 0.0
    for (y <- Seq(4.0, 6.0, 8.0)) {
      val l2 = 0.5 * y + 0.5 * (l + b)
      b = 0.5 * (l2 - l) + 0.5 * b
      l = l2
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.map(_.getAs[Double]("forecast")).toSeq ==
      Seq(r6(l + 1 * b), r6(l + 2 * b)))
  }

  test("acfDaily: alternating series has acf(1) = -1, acf(2) = +1") {
    // counts 10,20,10,20,... over 10 days
    val rows = (1 to 10).flatMap(d =>
      Seq.fill(if (d % 2 == 0) 20 else 10)((1, "e", d)))
    val r = Stats.acfDaily(ev(rows: _*), "ts", maxLag = 3)
      .orderBy("lag").collect()
    assert(r(0).getAs[Long]("n_pairs") == 9 && r(0).getAs[Double]("acf") == -1.0)
    assert(r(1).getAs[Long]("n_pairs") == 8 && r(1).getAs[Double]("acf") == 1.0)
    assert(r(2).getAs[Long]("n_pairs") == 7 && r(2).getAs[Double]("acf") == -1.0)
    // constant series → zero variance → NULL, not a divide-by-zero
    val flat = (1 to 5).flatMap(d => Seq.fill(3)((1, "e", d)))
    val fr = Stats.acfDaily(ev(flat: _*), "ts", maxLag = 1).head()
    assert(fr.isNullAt(fr.fieldIndex("acf")))
  }

  test("spearmanDaily: planted monotone series hit ±1; ties use average ranks") {
    // day d: 10d events total, users 1..(7-d) each once and the rest
    // from user 1 → volume strictly up, breadth strictly down
    val rows = (1 to 6).flatMap { d =>
      (1 to (7 - d)).map((_, "e", d)) ++
        Seq.fill(10 * d - (7 - d))((1, "e", d))
    }
    val r = Stats.spearmanDaily(ev(rows: _*), "ts", "user_id").head()
    assert(r.getAs[Long]("n_days") == 6L)
    assert(r.getAs[Double]("spearman") == -1.0)
    // perfectly aligned series → +1
    val up = for { d <- 1 to 5; i <- 1 to 3 * d } yield (i, "e", d)
    assert(Stats.spearmanDaily(ev(up: _*), "ts", "user_id").head()
      .getAs[Double]("spearman") == 1.0)
    // tie path: day1 x=1 y=1; day2 x=1 y=1; day3 x=2 y=2 → both rank
    // vectors (1.5, 1.5, 3) → rho exactly 1 through the average-rank
    // arithmetic (min-rank would still give 1 here, but a wrong ties
    // count breaks the exactness vs the all-distinct ramp above)
    val tied = Seq((1, "e", 1), (1, "e", 2), (1, "e", 3), (2, "e", 3))
    assert(Stats.spearmanDaily(ev(tied: _*), "ts", "user_id").head()
      .getAs[Double]("spearman") == 1.0)
  }

  test("nnMatchATT: hand-computed matches, distance-tie toward lower " +
      "covariate, unmatched stratum counted but excluded") {
    val df = Seq(
      // stratum s: treated 1 (cov 10) → prev ctrl 2 (d=2) beats next 3
      // (d=3) → diff 100-50; treated 4 (cov 12.5) → next ctrl 3 (d=0.5)
      // → diff 80-70
      ("s", 1L, 10.0, 100.0, true), ("s", 2L, 8.0, 50.0, false),
      ("s", 3L, 13.0, 70.0, false), ("s", 4L, 12.5, 80.0, true),
      // stratum t: exact distance tie (9 vs 11) → LOWER covariate wins
      ("t", 5L, 10.0, 9.0, true), ("t", 6L, 9.0, 4.0, false),
      ("t", 7L, 11.0, 8.0, false),
      // stratum u: no controls → counted, excluded from ATT
      ("u", 8L, 1.0, 1.0, true)
    ).toDF("st", "id", "cov", "y", "tr")
    val r = Stats.nnMatchATT(df, "id", Seq("st"), "cov", "y", col("tr"))
      .select("st", "n_treated", "n_matched", "att")
      .as[(String, Long, Long, Option[Double])].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r("s") == (2L, 2L, Some(30.0)))   // (50 + 10) / 2
    assert(r("t") == (1L, 1L, Some(5.0)))    // 9 - 4 (lower-cov control)
    assert(r("u") == (1L, 0L, None))
  }

  test("nnMatchATT: equal-covariate control is a distance-0 match; " +
      "equal-covariate control ties pick the minimum id") {
    val df = Seq(
      ("s", 1L, 10.0, 100.0, true),
      ("s", 2L, 10.0, 60.0, false),  // same covariate as the treated row
      ("s", 9L, 12.0, 1.0, false),
      // two controls at the same covariate: min id (3) must win
      ("t", 5L, 7.0, 50.0, true),
      ("t", 3L, 6.0, 20.0, false), ("t", 4L, 6.0, 30.0, false)
    ).toDF("st", "id", "cov", "y", "tr")
    val r = Stats.nnMatchATT(df, "id", Seq("st"), "cov", "y", col("tr"))
      .select("st", "att").as[(String, Double)].collect().toMap
    assert(r("s") == 40.0) // 100 - 60, the distance-0 control
    assert(r("t") == 30.0) // 50 - 20: control id 3, not id 4
  }

  test("kendallTauDaily: perfect concordance/discordance and a hand-" +
      "computed tie case") {
    def tau(rows: (String, Long, Long)*): (Long, Long, Double) = {
      // one event per (day, user) pair count: synthesize events so the
      // daily frame has x = rows per day, y = distinct users per day
      val ev = rows.toSeq.flatMap { case (d, x, y) =>
        (1L to x).map(i => (d, if (i <= y) i else 1L))
      }.toDF("ts", "user_id").withColumn("ts", to_timestamp(col("ts")))
      val r = Stats.kendallTauDaily(ev, "ts", "user_id")
        .select("n_days", "s", "tau_b").head()
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    }
    // x strictly up, y strictly up → every pair concordant, tau = 1
    assert(tau(("2024-01-01", 1L, 1L), ("2024-01-02", 2L, 2L),
      ("2024-01-03", 3L, 3L), ("2024-01-04", 4L, 4L)) == (4L, 6L, 1.0))
    // x up, y strictly down → tau = -1
    assert(tau(("2024-01-01", 4L, 4L), ("2024-01-02", 5L, 3L),
      ("2024-01-03", 6L, 2L), ("2024-01-04", 7L, 1L)) == (4L, -6L, -1.0))
    // ties on both sides: x = [2,2,3], y = [1,2,2] → C−D = 1,
    // tie-corrected denominators 4 and 4 → tau = 2/sqrt(16) = 0.5
    val t = tau(("2024-01-01", 2L, 1L), ("2024-01-02", 2L, 2L),
      ("2024-01-03", 3L, 2L))
    assert(t._1 == 3L && t._2 == 1L && t._3 == 0.5)
  }

  test("cmhTest: hand-computed two-stratum design (null + strong strata)") {
    // stratum 0 (users 1..4): treated a=1 b=1, control c=1 d=1 → no
    // effect; stratum 1 (users 5..8): treated both convert, control
    // none → E_k = 1, V_k = 1/3 each; sum_a=3, E=2, chi2 = 1/(2/3) =
    // 1.5, OR_MH = (0.25+1)/(0.25+0) = 5
    val ev = Seq(
      (1L, "purchase"), (3L, "view"), (2L, "purchase"), (4L, "view"),
      (5L, "purchase"), (7L, "purchase"), (6L, "view"), (8L, "view")
    ).toDF("user_id", "event_type")
    val r = Stats.cmhTest(ev, "user_id", "event_type", "purchase",
        strata = when(col("user_id") <= 4, 0L).otherwise(1L))
      .select("n_strata", "sum_a", "expected_a", "chi2_cmh", "or_mh").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 2.0)
    assert(math.abs(r.getDouble(3) - 1.5) < 1e-6)
    assert(math.abs(r.getDouble(4) - 5.0) < 1e-6)
  }

  test("robustMeans: planted outlier is trimmed out and winsorized in") {
    // values 1..9 + 1000: p10 = 1.9, p90 = 108.1 (interpolated);
    // trimmed keeps 2..9 (mean 5.5); winsorized clamps 1→1.9 and
    // 1000→108.1 (mean 15.4)
    val df = ((1 to 9).map(_.toDouble) :+ 1000.0).map(("g", _))
      .toDF("grp", "v")
    val r = Stats.robustMeans(df, "grp", "v")
      .select("n", "n_kept", "trimmed_mean", "winsorized_mean").head()
    assert(r.getLong(0) == 10L && r.getLong(1) == 8L)
    assert(r.getDouble(2) == 5.5)
    assert(r.getDouble(3) == 15.4)
  }

  test("mannKendallDaily: planted monotone trend; all-tied series → NULL z") {
    def mk(rows: (String, Double)*) =
      Stats.mannKendallDaily(
        rows.toSeq.toDF("ts", "value")
          .withColumn("ts", to_timestamp(col("ts"))), "ts", "value")
        .select("n_days", "s", "z", "sen_slope").head()
    // strictly increasing daily means 1..5 → S = C(5,2) = 10, tie3 = 0,
    // Var(S) = 5·4·15/18, z = (10−1)/√VarS, Sen's slope = 1.0 exactly
    val up = mk(("2024-01-01", 1.0), ("2024-01-02", 2.0), ("2024-01-03", 3.0),
      ("2024-01-04", 4.0), ("2024-01-05", 5.0))
    assert(up.getLong(0) == 5L && up.getLong(1) == 10L)
    assert(math.abs(up.getDouble(2) - 9.0 / math.sqrt(5.0 * 4 * 15 / 18)) < 1e-6)
    assert(up.getDouble(3) == 1.0)
    // all-tied means: S = 0 and the tie term cancels Var(S) entirely →
    // z must be NULL (not 0/0), Sen's slope 0
    val flat = mk(("2024-01-01", 2.0), ("2024-01-02", 2.0),
      ("2024-01-03", 2.0), ("2024-01-04", 2.0))
    assert(flat.getLong(1) == 0L && flat.isNullAt(2) && flat.getDouble(3) == 0.0)
    // decreasing → negative S, continuity correction flips to +1
    val down = mk(("2024-01-01", 3.0), ("2024-01-02", 2.0), ("2024-01-03", 1.0))
    assert(down.getLong(1) == -3L)
    assert(math.abs(down.getDouble(2) - (-2.0 / math.sqrt(3.0 * 2 * 11 / 18))) < 1e-6)
    assert(down.getDouble(3) == -1.0)
  }

  test("mannWhitneyDaily: hand-computed U and z; degenerate ties → NULL z") {
    // one row per (day, group): group A (even users) daily means 1,2;
    // group B (odd) daily means 3,4. Pooled ranks 1..4, R_A = 3,
    // U_A = 3 − 2·3/2 = 0, z = (0 − 2)/√(2·2·5/12) = −1.549193
    def mw(rows: (Int, Int, Double)*) =
      Stats.mannWhitneyDaily(
        rows.map { case (u, d, v) => (u.toLong, ts(d), v) }
          .toDF("user_id", "ts", "value"),
        "ts", "value", treated = col("user_id") % 2 === 0)
    val r = mw((2, 1, 1.0), (2, 2, 2.0), (1, 1, 3.0), (1, 2, 4.0)).head()
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("u_a") == 0.0)
    assert(math.abs(r.getAs[Double]("z") - (-1.549193)) < 1e-6, r)
    // all four day-means identical: every rank is the average 2.5
    // (doubled 5), U_A = n1·n2/2 = 2, tie-corrected variance is
    // exactly zero → z must be NULL, not ±Inf/NaN
    val t = mw((2, 1, 5.0), (2, 2, 5.0), (1, 1, 5.0), (1, 2, 5.0)).head()
    assert(t.getAs[Double]("u_a") == 2.0)
    assert(t.isNullAt(t.fieldIndex("z")))
    // a clean shift is detected with the right sign: A ≫ B → positive z
    val s = mw((2, 1, 10.0), (2, 2, 11.0), (2, 3, 12.0),
      (1, 1, 1.0), (1, 2, 2.0), (1, 3, 3.0)).head()
    assert(s.getAs[Double]("u_a") == 9.0) // A wins all 9 comparisons
    assert(s.getAs[Double]("z") > 1.9, s) // (9−4.5)/√(9·7/12) ≈ 1.964
  }

  test("ccfDaily: planted 2-day lead shows a perfect peak at lag +2") {
    // a spikes day 3, b spikes day 5 → corr(a_t, b_{t+2}) = 1 over the
    // 4 overlapping days
    val rows =
      (1 to 6).flatMap(d => Seq.fill(if (d == 3) 5 else 1)((1, "a", d))) ++
        (1 to 6).flatMap(d => Seq.fill(if (d == 5) 5 else 1)((1, "b", d)))
    val r = Stats.ccfDaily(ev(rows: _*), "event_type", "ts", "a", "b",
        maxLag = 3)
      .collect().map(x => x.getAs[Long]("lag") ->
        (x.getAs[Long]("n_pairs"), x.getAs[Double]("ccf"))).toMap
    assert(r(2L) == ((4L, 1.0)))
    assert(r(0L)._1 == 6L && r(0L)._2 < 1.0)
    assert(r.contains(-2L), "negative lags must be present")
  }

  test("logRank: hand-computed O/E/V on a four-user fixture") {
    // A (even ids): u2 converts t=0, u4 at t=1; B (odd): u1,u3 censored
    // at t=2. Risk table: t=0 n=4 na=2 d=1 da=1 → e=.5, v=.25;
    // t=1 n=3 na=1 d=1 da=1 → e=1/3, v=4/18; t=2 d=0 dropped.
    val df = ev((2, "view", 1), (2, "purchase", 1),
      (4, "view", 1), (4, "purchase", 2),
      (1, "view", 1), (1, "click", 3),
      (3, "view", 1), (3, "click", 3))
    val r = Stats.logRank(df, "user_id", "event_type", "ts", "purchase",
      treated = col("user_id") % 2 === 0).head()
    assert(r.getAs[Long]("n_users") == 4L && r.getAs[Long]("n_users_a") == 2L)
    assert(r.getAs[Long]("oa") == 2L)
    def r10(x: Double): Double =
      BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ea = BigDecimal(r10(0.5)) + BigDecimal(r10(1.0 * 1 / 3))
    val v = BigDecimal(r10(0.25)) + BigDecimal(r10(1.0 * 2 * 1 * 2 / (9.0 * 2)))
    assert(r.getAs[Double]("ea") == r6(ea.toDouble))
    assert(r.getAs[Double]("v") == r6(v.toDouble))
    val z = (2.0 - ea.toDouble) / math.sqrt(v.toDouble)
    assert(r.getAs[Double]("z") == r6(z))
    assert(r.getAs[Double]("chi2") == r6(z * z))
  }

  test("gainsTable: even 100-point score grid gives exact decile capture and lift") {
    // scores 0.01..1.00, converters = top 20 scores → bands 1-2 capture
    // everything at lift 5, bands 3-10 at 0
    val df = (1 to 100).map(i => (i / 100.0, i >= 81)).toDF("score", "label")
    val r = Stats.gainsTable(df, "score", "label", buckets = 10)
      .orderBy("band").collect()
    assert(r.length == 10)
    assert(r.forall(_.getAs[Long]("n") == 10L), "even grid → 10 per band")
    assert(r.map(_.getAs[Long]("conv")).toSeq ==
      Seq(10L, 10L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
    assert(r(0).getAs[Double]("conv_rate") == 1.0 &&
      r(0).getAs[Double]("lift") == 5.0)
    assert(r(0).getAs[Double]("cum_capture") == 0.5)
    assert(r(1).getAs[Double]("cum_capture") == 1.0)
    assert(r.last.getAs[Double]("cum_capture") == 1.0)
    assert(r.last.getAs[Double]("lift") == 0.0)
  }

  test("gainsTable: past the cardinality bound the approx-threshold path holds the contract") {
    val df = (1 to 100).map(i => (i / 100.0, i >= 81)).toDF("score", "label")
    val r = Stats.gainsTable(df, "score", "label", buckets = 10,
      exactThresholdsUpTo = 10L) // force approx_percentile
      .orderBy("band").collect()
    // boundaries are now statistics, but the table contract holds:
    // every row banded, capture monotone to 1, top band still lift > 1
    assert(r.map(_.getAs[Long]("n")).sum == 100L)
    val caps = r.map(_.getAs[Double]("cum_capture"))
    assert(caps.zip(caps.tail).forall { case (a, b) => a <= b } &&
      caps.last == 1.0)
    assert(r.head.getAs[Double]("lift") > 1.0)
  }

  test("poissonBootstrap: exact replay of weights, replicate means, and endpoints") {
    val B = 8
    val rows = (1L to 200L).map(id => (id, (id % 7).toDouble))
    val df = rows.toDF("id", "v")
    val got = Stats.poissonBootstrap(df, Seq.empty, "id", "v",
      replicates = B, lo = 0.125, hi = 0.875).head()
    // independent replay: BigInt knuth hash → thresholds → weighted means
    def weight(id: Long, rep: Int): Int = {
      val u = (BigInt(id * B + rep).mod(BigInt(2).pow(32)) *
        BigInt(2654435761L)).mod(BigInt(2).pow(32)).toLong
      val k = Stats.poissonCdfThresholds.indexWhere(u < _)
      if (k < 0) Stats.poissonCdfThresholds.size else k
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val repMeans = (0 until B).flatMap { rep =>
      val ws = rows.map { case (id, v) => (weight(id, rep), v) }
      val sw = ws.map(_._1).sum
      if (sw == 0) None
      else Some(r6(ws.map { case (w, v) => w * v }.sum / sw))
    }.sorted
    val loIdx = math.max(1, (0.125 * B).toInt)           // 1
    val hiIdx = math.min(B, math.ceil(0.875 * B).toInt)  // 7
    assert(got.getAs[Long]("n") == 200L)
    assert(got.getAs[Double]("observed_mean") ==
      r6(rows.map(_._2).sum / 200.0))
    assert(got.getAs[Double]("boot_lo") == repMeans(loIdx - 1))
    assert(got.getAs[Double]("boot_hi") == repMeans(hiIdx - 1))
    // Poisson(1) weights average ~1: each replicate's total weight is
    // within 3σ (σ = √n) of n, so resamples genuinely resample
    val totals = (0 until B).map(rep => rows.map(r => weight(r._1, rep)).sum)
    totals.foreach(t => assert(math.abs(t - 200) <= 3 * math.sqrt(200.0),
      s"replicate total weight $t implausible for n=200"))
  }

  test("skyline2d equals the naive dominance filter") {
    val rnd = new scala.util.Random(42)
    val pts = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(20), rnd.nextInt(100)))
    val df = pts.toDF("id", "x", "y")
    val got = Stats.skyline2d(df, "x", "y")
      .select("id").as[Long].collect().toSet
    val naive = pts.filter { case (_, bx, by) =>
      !pts.exists { case (_, ax, ay) =>
        ax <= bx && ay <= by && (ax < bx || ay < by) }
    }.map(_._1).toSet
    assert(got == naive && got.nonEmpty)
  }

  test("skyline2d keeps mutually-equal duplicate points") {
    val df = Seq((1L, 5, 5), (2L, 5, 5), (3L, 6, 6)).toDF("id", "x", "y")
    val got = Stats.skyline2d(df, "x", "y").select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L), "duplicates don't dominate each other; (6,6) is dominated")
  }

  test("neymanAllocation: zero-variance stratum gets nothing, allocations ∝ N·σ") {
    val df = (Seq.fill(4)(("b", 4.0)) ++ Seq(("a", 0.0), ("a", 10.0)))
      .toDF("stratum", "v")
    val r = Stats.neymanAllocation(df, "stratum", "v", totalN = 1000)
      .orderBy("stratum").collect()
    assert(r(0).getAs[Double]("sd") == 5.0 && r(0).getAs[Long]("n_alloc") == 1000L)
    assert(r(1).getAs[Double]("sd") == 0.0 && r(1).getAs[Long]("n_alloc") == 0L)
    assert(r(0).getAs[Long]("n_pop") == 2L && r(1).getAs[Long]("n_pop") == 4L)
  }

  test("diffInDiff recovers a planted treatment effect") {
    // treated (even ids) gain +4 post-cutover; control flat at 10.
    // span days 1..4 → integer midpoint falls mid-range; plant pre on
    // days 1-2, post on days 3-4 (both strictly inside their half)
    val rows = for {
      u <- 1L to 20L; d <- Seq(1, 2, 3, 4)
    } yield {
      val post = d >= 3
      val v = if (u % 2 == 0 && post) 14.0 else 10.0
      (u, ts(d), v)
    }
    val df = rows.toDF("user_id", "ts", "value")
    val r = Stats.diffInDiff(df, "ts", "value",
      treated = col("user_id") % 2 === 0).head()
    assert(r.getAs[Double]("mean_c_pre") == 10.0)
    assert(r.getAs[Double]("mean_c_post") == 10.0)
    assert(r.getAs[Double]("mean_t_pre") == 10.0)
    assert(r.getAs[Double]("mean_t_post") == 14.0)
    assert(r.getAs[Double]("did") == 4.0)
    // explicit cutover pins the same cells
    val cutUs = ts(3).getTime * 1000L
    val r2 = Stats.diffInDiff(df, "ts", "value",
      treated = col("user_id") % 2 === 0, cutoverUs = cutUs).head()
    assert(r2.getAs[Double]("did") == 4.0)
  }
}
