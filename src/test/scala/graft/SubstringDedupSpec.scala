package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-corpus semantics for the substring-dedup pair (q82 detection,
  * q83 removal) — the oracle pins engine parity; these pin that the
  * operators mean what they claim.
  */
class SubstringDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  // 16 tokens of boilerplate — exactly one q83 block, and 9 complete
  // k=8 spans inside any doc that starts with it
  private val header = (1 to 16).map(i => s"h$i").mkString(" ")

  test("dupSpanStats: identical docs are fully covered, unique docs report zero") {
    val uniq1 = (1 to 24).map(i => s"a$i").mkString(" ")
    val uniq2 = (1 to 24).map(i => s"b$i").mkString(" ")
    val res = graft.operators.Dedup
      .dupSpanStats(docs(1L -> uniq1, 2L -> uniq1, 3L -> uniq2), k = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    spark.catalog.clearCache()
    assert(res(1L)._1 == 17 && res(1L)._2 == 17, s"doc1 fully duplicated: ${res(1L)}")
    assert(res(2L)._2 == 17, "the copy is flagged symmetrically")
    assert(res(3L)._2 == 0, "unique doc has no cross-doc spans")
  }

  test("blockDedup strips a shared leading block from the later doc only") {
    val tailA = (1 to 16).map(i => s"a$i").mkString(" ")
    val tailB = (1 to 16).map(i => s"b$i").mkString(" ")
    val res = graft.operators.Dedup
      .blockDedup(docs(1L -> s"$header $tailA", 2L -> s"$header $tailB"))
      .collect().map(r => r.getLong(0) -> r).toMap
    spark.catalog.clearCache()
    assert(res(1L).getAs[String]("text_dedup") == s"$header $tailA",
      "first occurrence keeps everything")
    assert(res(2L).getAs[String]("text_dedup") == tailB,
      "later doc loses exactly the shared block")
    assert(res(2L).getLong(1) == 2 && res(2L).getLong(2) == 1,
      "2 blocks, 1 kept")
  }

  test("blockDedup on an all-duplicate doc reassembles to the empty string") {
    val res = graft.operators.Dedup
      .blockDedup(docs(1L -> header, 2L -> header))
      .filter(col("doc_id") === 2L).collect().head
    spark.catalog.clearCache()
    assert(res.getAs[String]("text_dedup") == "", "no surviving blocks")
    assert(res.getLong(2) == 0)
  }

  test("property: blockDedup equals a sequential reference over random corpora") {
    val rnd = new scala.util.Random(53)
    val blockPool = (0 until 6).map(i => (0 until 4).map(j => s"p${i}_$j").mkString(" "))
    (0 until 5).foreach { trial =>
      val corpus: Seq[(Long, String)] = (0 until (5 + rnd.nextInt(15))).map { i =>
        // mix pooled (collision-prone) and unique blocks; occasional
        // ragged tail so short final blocks are exercised
        val nBlocks = 1 + rnd.nextInt(5)
        val blocks = (0 until nBlocks).map { b =>
          if (rnd.nextBoolean()) blockPool(rnd.nextInt(blockPool.size))
          else (0 until 4).map(j => s"u${trial}_${i}_${b}_$j").mkString(" ")
        }
        val tail = if (rnd.nextBoolean()) "" else s" t${trial}_$i"
        (i.toLong, blocks.mkString(" ") + tail)
      }
      // sequential reference: first occurrence (doc order, block order) wins
      val seen = scala.collection.mutable.Set[String]()
      val expect = corpus.map { case (id, text) =>
        val toks = text.split(" ")
        val blocks = toks.grouped(4).map(_.mkString(" ")).toSeq
        val kept = blocks.filter(b => seen.add(b))
        id -> ((blocks.size.toLong, kept.size.toLong, kept.mkString(" ")))
      }.toMap
      val got = graft.operators.Dedup.blockDedup(docs(corpus: _*), blockTokens = 4)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      spark.catalog.clearCache()
      assert(got == expect, s"trial $trial")
    }
  }

  test("ngramNovelty: originals score 1.0, verbatim copies 0.0") {
    val a = (1 to 20).map(i => s"a$i").mkString(" ")
    val b = (1 to 20).map(i => s"b$i").mkString(" ")
    val res = graft.operators.Dedup
      .ngramNovelty(docs(1L -> a, 2L -> a, 3L -> b))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    spark.catalog.clearCache()
    assert(res(1L) == 1.0 && res(3L) == 1.0, s"first occurrences are novel: $res")
    assert(res(2L) == 0.0, s"verbatim copy has zero novelty: $res")
  }

  test("blockDedup preserves token order across surviving blocks") {
    // doc 2: [header][u1..u16][header] — both header copies drop (the
    // doc-1 copy is first), and the middle block must survive intact
    val mid = (1 to 16).map(i => s"u$i").mkString(" ")
    val res = graft.operators.Dedup
      .blockDedup(docs(1L -> header, 2L -> s"$header $mid $header"))
      .filter(col("doc_id") === 2L).collect().head
    spark.catalog.clearCache()
    assert(res.getAs[String]("text_dedup") == mid, s"got: ${res.getAs[String]("text_dedup")}")
  }
}
