package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics for batch gap sessionization (q100) and the wildcard-blocked
  * fuzzy key join (q103) — the oracles pin engine parity; these pin
  * boundary behavior and blocking exactness on constructed inputs.
  */
class SessionEntitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def events(rows: (Long, Long, Long, Double)*) = {
    // (user_id, ts_ns, event_id, value) → the column shape gapSessions reads
    val s = spark
    import s.implicits._
    rows.toDF("user_id", "ts_ns", "event_id", "value")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }

  test("gapSessions: boundary gap stays, gap+1ns splits, count conserved") {
    val ns = 1000000000L // 1 s
    val df = events(
      (1L, 0L, 1L, 1.0),
      (1L, 10L * ns, 2L, 1.0),      // exactly the 10 s gap → SAME session
      (1L, 20L * ns + 1, 3L, 1.0),  // 1 ns over → new session
      (1L, 25L * ns, 4L, 1.0),
      (2L, 0L, 5L, 1.0))            // second user independent
    val out = graft.operators.TimeJoins.gapSessions(df, gapSeconds = 10L)
      .select("user_id", "session_no", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    spark.catalog.clearCache()
    assert(out == Set((1L, 1L, 2L), (1L, 2L, 2L), (2L, 1L, 1L)), s"got $out")
  }

  test("gapSessions: session bounds nest and sum_value is exact") {
    val ns = 1000000000L
    val df = events(
      (7L, 1L * ns, 1L, 1.25),
      (7L, 2L * ns, 2L, 2.50),
      (7L, 100L * ns, 3L, 4.00))
    val rows = graft.operators.TimeJoins.gapSessions(df, gapSeconds = 30L)
      .orderBy("session_no").collect()
    spark.catalog.clearCache()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("n_events") == 2L)
    assert(rows(0).getAs[Double]("sum_value") == 3.75)
    assert(rows(1).getAs[Double]("sum_value") == 4.0)
    assert(!rows(0).getAs[java.sql.Timestamp]("session_end")
      .after(rows(1).getAs[java.sql.Timestamp]("session_start")))
  }

  test("property: gapSessions equals a sequential fold over random streams") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(94)
    (0 until 3).foreach { trial =>
      val gap = 5L + rnd.nextInt(20) // seconds
      val rows = (0 until 300).map { i =>
        val u = rnd.nextInt(8).toLong
        (u, math.abs(rnd.nextLong() % (600L * 1000000000L)), i.toLong, 1.0)
      }
      val df = rows.toDF("user_id", "ts_ns", "event_id", "value")
        .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      val got = graft.operators.TimeJoins.gapSessions(df, gap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)) // n_events
        .toMap
      spark.catalog.clearCache()
      // sequential reference: per user, sort by (ts_ns, event_id), fold
      val expect = rows.groupBy(_._1).flatMap { case (u, es) =>
        val sorted = es.sortBy(e => (e._2, e._3))
        var sess = 0L; var prev = Long.MinValue
        val counts = scala.collection.mutable.Map.empty[Long, Long]
        sorted.foreach { e =>
          if (prev == Long.MinValue || e._2 - prev > gap * 1000000000L) sess += 1
          counts(sess) = counts.getOrElse(sess, 0L) + 1
          prev = e._2
        }
        counts.map { case (sn, n) => (u, sn) -> n }
      }.toMap
      assert(got == expect, s"trial $trial gap=$gap")
    }
  }

  test("property: trailingWindow equals the naive quadratic reference") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(95)
    val rows = (0 until 200).map { i =>
      (rnd.nextInt(5).toLong, math.abs(rnd.nextLong() % (100L * 1000000000L)),
        i.toLong, (rnd.nextInt(1000) / 100.0))
    }
    val winSec = 17L
    val df = rows.toDF("user_id", "ts_ns", "event_id", "value")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
    val got = graft.operators.TimeJoins.trailingWindow(df, winSec)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_trail")).toMap
    spark.catalog.clearCache()
    val expect = rows.map { e =>
      e._3 -> rows.count(o => o._1 == e._1 &&
        o._2 <= e._2 && o._2 >= e._2 - winSec * 1000000000L).toLong
    }.toMap
    assert(got == expect,
      s"diff=${got.collect { case (k, v) if expect(k) != v => (k, v, expect(k)) }.take(5)}")
  }

  test("fuzzyKeyPairs: finds Hamming-1 pairs, not distance-2, no cross join") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "alpha"), (2L, "alpha"),            // identical → distance 0 (≤1)
      (3L, "alphb"),                           // 1 sub from alpha
      (4L, "alpXY"),                           // 2 subs from alpha
      (5L, "beta7")).toDF("k", "name")
    val got = graft.operators.Entity.fuzzyKeyPairs(df, "k", "name")
      .select("key_a", "key_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    // identical names share len variants → still ONE row per pair after
    // the (pos, variant) join would duplicate — guard below catches that
    assert(got.contains((1L, 3L)) && got.contains((2L, 3L)))
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("property: fuzzyKeyPairs equals the naive levenshtein cross join") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(91)
    val alphabet = "abc" // small alphabet → many near-collisions
    val rows = (0 until 60).map { i =>
      (i.toLong, (0 until 6).map(_ => alphabet(rnd.nextInt(3))).mkString)
    }
    val df = rows.toDF("k", "name")
    val got = graft.operators.Entity.fuzzyKeyPairs(df, "k", "name")
      .select("key_a", "key_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    val expect = (for {
      (ka, na) <- rows; (kb, nb) <- rows if ka < kb
      if na.zip(nb).count { case (x, y) => x != y } <= 1
    } yield (ka, kb)).toSet
    assert(got == expect,
      s"missing=${(expect -- got).take(5)} extra=${(got -- expect).take(5)}")
  }

  test("property: fuzzyKeyPairsVarLen equals the naive lev<=1 join incl. insert/delete") {
    val s = spark
    import s.implicits._
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rnd = new scala.util.Random(93)
    val alphabet = "ab"
    // variable lengths 3..6 over a tiny alphabet → many 1-edit pairs of
    // DIFFERENT lengths (the case the fixed-width blocking misses)
    val rows = (0 until 50).map { i =>
      (i.toLong, (0 until 3 + rnd.nextInt(4)).map(_ => alphabet(rnd.nextInt(2))).mkString)
    }
    val got = graft.operators.Entity.fuzzyKeyPairsVarLen(rows.toDF("k", "name"), "k", "name")
      .select("key_a", "key_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    val expect = (for {
      (ka, na) <- rows; (kb, nb) <- rows if ka < kb
      if lev(na, nb) <= 1
    } yield (ka, kb)).toSet
    assert(got == expect,
      s"missing=${(expect -- got).take(5)} extra=${(got -- expect).take(5)}")
    assert(expect.exists { case (x, y) =>
      rows(x.toInt)._2.length != rows(y.toInt)._2.length },
      "fixture must contain cross-length pairs or the test proves nothing")
  }

  test("fuzzyKeyPairs: identical names yield exactly one pair row") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "same"), (2L, "same")).toDF("k", "name")
    val n = graft.operators.Entity.fuzzyKeyPairs(df, "k", "name").count()
    spark.catalog.clearCache()
    assert(n == 1L, s"identical names must dedupe to one pair row, got $n")
  }
}
