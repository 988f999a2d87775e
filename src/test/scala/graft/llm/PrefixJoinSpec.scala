package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrefixJoinSpec extends SparkSpec {

  /** Brute-force word-set Jaccard ≥ tNum/tDen, computed driver-side. */
  private def bruteForce(docs: Seq[(Long, String)], tNum: Int, tDen: Int)
      : Set[(Long, Long)] = {
    val sets = docs.map { case (id, text) =>
      id -> text.trim.split("\\s+").filter(_.nonEmpty).toSet
    }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      i = (sa & sb).size
      if i.toLong * tDen >= (sa.size + sb.size - i).toLong * tNum
    } yield (ia, ib)).toSet
  }

  private def run(docs: Seq[(Long, String)], tNum: Int, tDen: Int): Set[(Long, Long)] = {
    import spark.implicits._
    Dedup.prefixFilterPairs(docs.toDF("doc_id", "text"), "doc_id", "text", tNum, tDen)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
  }

  test("prefixFilterPairs matches brute-force exactly, boundary included") {
    val docs = Seq[(Long, String)](
      (1L, "a b c"),        // J(1,2) = 2/4 = 0.5 — exactly at threshold
      (2L, "a b x"),
      (3L, "a b c d e f"),  // J(1,3) = 3/6 = 0.5 — boundary via containment
      (4L, "p q r s t"),
      (5L, "p q r s t u"),  // J(4,5) = 5/6 > 0.5
      (6L, "zz yy"),        // J(6,*) = 0
      (7L, "a x y z w v"))  // shares common tokens but below threshold
    val expected = bruteForce(docs, 1, 2)
    assert(expected.contains((1L, 2L)) && expected.contains((1L, 3L)) &&
      expected.contains((4L, 5L))) // the fixture really has boundary pairs
    assert(run(docs, 1, 2) == expected)
  }

  test("prefixFilterPairs: hyper-frequent shared token alone creates no pair") {
    // every doc shares 'the', but no pair reaches J >= 0.8 — candidates may
    // exist, the verified result must be empty
    val docs = (0L until 12L).map(i => i -> s"the u$i v$i w$i x$i y$i")
    assert(run(docs, 4, 5) == Set.empty)
    assert(bruteForce(docs, 4, 5) == Set.empty)
  }

  test("prefixFilterPairs randomized recall against brute force") {
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 40).map(i => s"t$i")
    val base = (0L until 30L).map { i =>
      i -> rnd.shuffle(vocab).take(6 + rnd.nextInt(8)).mkString(" ")
    }
    // plant near-dups: one-token-appended copies of the first 8 docs
    val docs = base ++ (0L until 8L).map(i => (100L + i) -> (base(i.toInt)._2 + " extra"))
    assert(run(docs, 7, 10) == bruteForce(docs, 7, 10))
  }

  test("prefixFilterPairs at shingle granularity matches shingle brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 25).map(i => s"t$i")
    val base = (0L until 20L).map { i =>
      i -> Seq.fill(10 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val docs = base ++ (0L until 6L).map(i => (100L + i) -> (base(i.toInt)._2 + " extra"))
    def shingleSet(text: String): Set[String] = {
      val w = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      if (w.length < 3) Set(w.mkString(" ")) else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val expected = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      (sa, sb) = (shingleSet(ta), shingleSet(tb))
      i = (sa & sb).size
      if i.toLong * 2 >= (sa.size + sb.size - i).toLong * 1
    } yield (ia, ib)).toSet
    assert(expected.nonEmpty)
    val got = Dedup.prefixFilterPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", 1, 2, shingleN = 3)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("containmentPairs: excerpt contained in host, not vice versa") {
    import spark.implicits._
    val host = (1 to 30).map(i => s"w$i").mkString(" ")
    val excerpt = (8 to 19).map(i => s"w$i").mkString(" ") // 12 consecutive tokens
    val other = (100 to 130).map(i => s"x$i").mkString(" ")
    val docs = Seq((1L, host), (2L, excerpt), (3L, other)).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text",
        shingleN = 3, cNum = 9, cDen = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // excerpt: 10 3-gram shingles, all present in host → containment 1e6;
    // host: 28 shingles, only 10 shared → 0.357, below 0.9
    assert(got == Set((2L, 1L, 1000000L)))
  }

  test("containmentPairs randomized against brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val vocab = (0 until 30).map(i => s"v$i")
    val base = (0L until 18L).map { i =>
      i -> Seq.fill(8 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    // plant excerpts: middle slices of the first 5 docs
    val docs = base ++ (0L until 5L).map { i =>
      val toks = base(i.toInt)._2.split(" ")
      (200L + i) -> toks.slice(2, 2 + math.max(4, toks.length - 4)).mkString(" ")
    }
    def shingles(text: String): Set[String] = {
      val w = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      if (w.length < 3) Set(w.mkString(" ")) else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val expected = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia != ib
      (sa, sb) = (shingles(ta), shingles(tb))
      i = (sa & sb).size
      if i.toLong * 10 >= sa.size.toLong * 9
    } yield (ia, ib)).toSet
    assert(expected.nonEmpty)
    val got = Dedup.containmentPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", shingleN = 3, cNum = 9, cDen = 10)
      .select($"contained", $"container").as[(Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("containmentPairs df-cap: a boilerplate-flooded corpus yields no quadratic candidates") {
    import spark.implicits._
    // 400 docs all opening with the same 8-token boilerplate run (shingle
    // df = 400) followed by per-doc unique tokens. Uncapped, the shingle
    // self-join would build 400² ≈ 160k candidate rows from the boilerplate
    // alone; with dfCap = 50 those shingles never enter the join. One
    // genuine excerpt pair rides on LOW-df shingles and must still come
    // back with its exact cont_micro.
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    val flood = (0L until 400L).map { i =>
      i -> s"$boiler u${i}a u${i}b u${i}c u${i}d u${i}e"
    }
    val host = (100 to 140).map(i => s"h$i").mkString(" ")
    val excerpt = (110 to 125).map(i => s"h$i").mkString(" ") // 16 tokens, 14 3-shingles
    val docs = (flood ++ Seq(1000L -> host, 1001L -> excerpt)).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text",
        shingleN = 3, cNum = 9, cDen = 10, cache = false, dfCap = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // flood pairs share ONLY df>cap shingles → correctly absent under the
    // documented recall bound; the excerpt pair is exact: 14/14 shingles
    assert(got == Set((1001L, 1000L, 1000000L)))
  }

  test("incrementalNear: cross-shard near-dups (not verbatim) die against the store") {
    import spark.implicits._
    def doc(prefix: String, n: Int) = (1 to n).map(i => s"$prefix$i").mkString(" ")
    val shard1 = Seq(1L -> doc("a", 30), 2L -> doc("b", 30)).toDF("doc_id", "text")
    val store = Dedup.signatureStore(shard1, "doc_id", "text",
      shingleN = 3, bands = 16, rowsPerBand = 4)
    val shard2 = Seq(
      10L -> doc("a", 30).split(" ").drop(1).mkString(" "), // near-dup of 1 (J=27/28)
      11L -> doc("c", 30),                                  // fresh — survives
      12L -> doc("c", 30).split(" ").drop(1).mkString(" ")  // near-dup of 11 within shard
    ).toDF("doc_id", "text")
    val (survivors, nextStore) = Dedup.incrementalNear(shard2, "doc_id", "text",
      store, shingleN = 3, bands = 16, rowsPerBand = 4, threshold = 0.8)
    assert(survivors.select($"doc_id").as[Long].collect().toSet == Set(11L))
    // the store grows by exactly the survivors' signature rows
    assert(nextStore.select($"id").as[Long].collect().toSet == Set(1L, 2L, 11L))
  }

  test("mergeCandidates counts adjacent pairs; single-char words excluded") {
    import spark.implicits._
    val out = Tokenizer.mergeCandidates(
        Seq("abab z ab", "bab").toDF("text"), "text", 10)
      .as[(String, String, Long)].collect().toSeq
    // pairs: abab -> ab, ba, ab; ab -> ab; bab -> ba, ab; z excluded
    assert(out == Seq(("a", "b", 4L), ("b", "a", 2L)))
  }
}
