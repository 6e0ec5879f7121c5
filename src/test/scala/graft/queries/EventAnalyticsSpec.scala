package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the event-analytics operators added in round 5
  * (q112 cohort retention, q113 funnel, q114 attribution, q115 anomaly,
  * q116 k-means): the DuckDB oracle proves Spark and DuckDB agree; these
  * prove the shared answer means what it claims, via independent
  * recomputation in plain Scala over the collected events.
  */
class EventAnalyticsSpec extends SparkTestBase {

  private lazy val events = graft.Tables.events(spark, sfDir)
    .select("event_id", "user_id", "event_type", "ts", "value")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
               r.getTimestamp(3).getTime, r.getDouble(4)))

  test("q112: offset-0 cell covers every user exactly once per cohort") {
    val out = graft.SparkEntry.queries("q112_cohort_retention")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val zero = out.filter(_.getAs[Long]("week_offset") == 0L)
    // every user is active in their own cohort week by construction
    val nUsers = events.map(_._2).distinct.length
    assert(zero.map(_.getAs[Long]("n_active")).sum === nUsers,
      "offset-0 cells must partition the user population")
    // retention can never exceed the cohort's own size
    val cohortSize = zero.map(r =>
      r.getAs[String]("cohort_week") -> r.getAs[Long]("n_active")).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("n_active") <= cohortSize(r.getAs[String]("cohort_week")),
        "an offset cell exceeded its cohort size")
    }
  }

  test("q113: funnel stages are monotone and match a per-user replay") {
    val out = graft.SparkEntry.queries("q113_funnel_stages")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet === Set("1_signup", "2_view", "3_purchase"))
    assert(out("1_signup") >= out("2_view") && out("2_view") >= out("3_purchase"),
      s"funnel must be monotone: $out")
    // independent per-user replay of the min-timestamp chaining
    val byUser = events.groupBy(_._2)
    def chain(evs: Array[(Long, Long, String, Long, Double)]): (Boolean, Boolean, Boolean) = {
      val t1 = evs.filter(_._3 == "signup").map(_._4).minOption
      val t2 = t1.flatMap(t => evs.filter(e => e._3 == "view" && e._4 > t).map(_._4).minOption)
      val t3 = t2.flatMap(t => evs.filter(e => e._3 == "purchase" && e._4 > t).map(_._4).minOption)
      (t1.isDefined, t2.isDefined, t3.isDefined)
    }
    val replay = byUser.values.map(chain)
    assert(out("1_signup") === replay.count(_._1))
    assert(out("2_view") === replay.count(_._2))
    assert(out("3_purchase") === replay.count(_._3))
  }

  test("q114: attribution partitions all purchases; credit matches a replay") {
    val out = graft.SparkEntry.queries("q114_last_touch")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nPurchases = events.count(_._3 == "purchase")
    assert(out.values.sum === nPurchases,
      "every purchase must be attributed to exactly one touch (or 'none')")
    assert(!out.keySet.contains("purchase"),
      "a purchase can never be its own attributed touch")
    // replay: most recent preceding non-purchase event per purchase
    val replay = events.groupBy(_._2).values.flatMap { evs =>
      val ordered = evs.sortBy(e => (e._4, e._1))
      ordered.zipWithIndex.collect { case (e, i) if e._3 == "purchase" =>
        ordered.take(i).filter(_._3 != "purchase").lastOption.map(_._3).getOrElse("none")
      }
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(out === replay)
  }

  test("q115: flagged set equals a plain-Scala 3-sigma recomputation") {
    val out = graft.SparkEntry.queries("q115_anomaly_zscore")(spark, sfDir).collect()
    assert(out.nonEmpty, "synthetic values are skewed enough to have 3-sigma outliers")
    val stats = events.groupBy(_._3).map { case (t, evs) =>
      // mirror the decimal discipline: 2-dec values sum exactly in BigDecimal
      val n = evs.length.toDouble
      val sm = evs.map(e => BigDecimal(e._5).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      val sq = evs.map { e =>
        val d = BigDecimal(e._5).setScale(2, BigDecimal.RoundingMode.HALF_UP); d * d
      }.sum.toDouble
      val mean = sm / n
      t -> (mean, math.sqrt(sq / n - mean * mean))
    }
    val expected = events.filter { e =>
      val (mean, sd) = stats(e._3)
      math.abs(BigDecimal((e._5 - mean) / sd)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) > 3.0
    }.map(_._1).toSet
    assert(out.map(_.getAs[Long]("event_id")).toSet === expected)
  }

  test("q125: SCD-2 periods partition each user's signups; purchases land in covering periods") {
    val out = graft.SparkEntry.queries("q125_scd2_interval_join")(spark, sfDir).collect()
    assert(out.nonEmpty)
    // one period per signup event, per user
    val nSignups = events.count(_._3 == "signup")
    assert(out.length === nSignups, "every signup must open exactly one period")
    // attributed purchases = purchases at/after their user's first signup
    val firstSignup = events.filter(_._3 == "signup").groupBy(_._2)
      .map { case (u, evs) => u -> evs.map(_._4).min }
    val expected = events.count(e => e._3 == "purchase" &&
      firstSignup.get(e._2).exists(_ < e._4))
    assert(out.map(_.getAs[Long]("n_purchases")).sum === expected,
      "interval join must place each post-signup purchase in exactly one period")
  }

  test("q130: decayed score equals a serial exact-cents replay") {
    val out = graft.SparkEntry.queries("q130_decayed_score")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("decayed_score")).toMap
    val dayMs = 86400000L
    val refDay = events.map(_._4 / dayMs).max
    val replay = events.groupBy(_._2).map { case (u, evs) =>
      val cents = evs.map { e =>
        val age = (refDay - e._4 / dayMs).toInt
        var w = 1.0; (1 to age).foreach(_ => w *= 0.95)
        val w6 = math.floor(w * 1e6).toLong
        BigDecimal(e._5).setScale(2, BigDecimal.RoundingMode.HALF_UP) * BigDecimal(w6)
      }.sum
      u -> (cents.toDouble / 1e6)
    }
    assert(out.keySet === replay.keySet)
    out.foreach { case (u, s) =>
      assert(math.abs(s - replay(u)) < 1e-9, s"user $u: $s vs ${replay(u)}")
    }
  }

  test("q132: conversion latency stats are ordered and match the replayed extremes") {
    val r = graft.SparkEntry.queries("q132_conversion_latency")(spark, sfDir).head()
    val (n, mn, med, p90, mx) = (r.getAs[Long]("n_converted"), r.getAs[Long]("min_s"),
      r.getAs[Double]("med_s"), r.getAs[Double]("p90_s"), r.getAs[Long]("max_s"))
    assert(mn <= med && med <= p90 && p90 <= mx)
    // serial replay of the extremes
    val lats = events.groupBy(_._2).values.flatMap { evs =>
      val t1 = evs.filter(_._3 == "signup").map(_._4).minOption
      val tp = t1.flatMap(t => evs.filter(e => e._3 == "purchase" && e._4 > t).map(_._4).minOption)
      for (a <- t1; b <- tp) yield b / 1000 - a / 1000
    }.toSeq
    assert(n === lats.size && mn === lats.min && mx === lats.max)
  }

  test("q116: clusters partition the corpus; Lloyd update never increases inertia") {
    val out = graft.SparkEntry.queries("q116_kmeans")(spark, sfDir).collect()
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) as v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    assert(out.map(_.getAs[Long]("n_members")).sum === vecs.length,
      "cluster sizes must sum to the corpus size")
    assert(out.forall(_.getAs[Double]("inertia") >= 0.0))

    // plain-Scala replay of the 2-iteration Lloyd loop
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    def assignTo(cents: Map[Long, Array[Double]]) =
      vecs.map { case (id, v) => (id, v, cents.minBy { case (c, cv) => (d2(v, cv), c) }._1) }
    def mean(members: Array[Array[Double]]): Array[Double] = {
      val m = new Array[Double](members.head.length)
      members.foreach(v => for (i <- m.indices) m(i) += v(i))
      m.map(_ / members.length)
    }
    val c0 = vecs.filter(_._1 < 4).map { case (id, v) => id -> v }.toMap
    val a1 = assignTo(c0)
    val c1 = a1.groupBy(_._3).map { case (c, g) => c -> mean(g.map(_._2)) }
    val a2 = assignTo(c1)
    val sizes = a2.groupBy(_._3).map { case (c, g) => c -> g.length.toLong }
    val got = out.map(r => r.getAs[Long]("cid") -> r.getAs[Long]("n_members")).toMap
    assert(got === sizes, "cluster membership must match the serial Lloyd replay")
    // the defining Lloyd property: each update weakly decreases total inertia
    val inertia1 = a1.map { case (_, v, c) => d2(v, c0(c)) }.sum
    val inertia2 = a2.map { case (_, v, c) => d2(v, c1(c)) }.sum
    assert(inertia2 <= inertia1 + 1e-9, s"inertia went up: $inertia1 -> $inertia2")
    val reported = out.map(_.getAs[Double]("inertia")).sum
    assert(math.abs(reported - inertia2) < 1e-3,
      s"reported inertia $reported must match the replay $inertia2")
  }
}
