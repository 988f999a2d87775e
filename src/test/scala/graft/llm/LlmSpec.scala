package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit checks for the LLM-pipeline operators (the oracle-checked queries in
  * TextPack/VectorPack are the integration gate; these pin the semantics). */
class LlmSpec extends SparkSpec {

  import SparkSpec._

  private lazy val docs = {
    import session.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog and runs away"),
      (1L, "the quick brown fox jumps over the lazy dog and runs home"),
      (2L, "completely different content with no overlap whatsoever here now"),
      (3L, "the quick brown fox jumps over the lazy dog and runs away"), // exact dup of 0
      (4L, "der hund ist nicht ein fuchs und das ist gut"),
      (5L, "le chat est un animal et la vie est belle")
    ).toDF("doc_id", "text")
  }

  test("tokenCount / distinctTokenCount / markerCount") {
    val r = docs.filter(col("doc_id") === 0)
      .select(TextFunctions.tokenCount(col("text")),
        TextFunctions.distinctTokenCount(col("text")),
        TextFunctions.markerCount(col("text"), Seq("the", "and")))
      .collect()(0)
    assert(r.getLong(0) == 12)
    assert(r.getLong(1) == 11) // 'the' twice
    assert(r.getLong(2) == 3)  // the, the, and
  }

  test("langId picks the dominant marker language on real sentences") {
    val guesses = docs.select(col("doc_id"), TextFunctions.langId(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(guesses(0) == "en")
    assert(guesses(4) == "de")
    assert(guesses(5) == "fr")
  }

  test("wordShingles: n-grams, and short docs collapse to one shingle") {
    import session.implicits._
    val one = Seq((0L, "a b c d")).toDF("doc_id", "text")
      .select(TextFunctions.wordShingles(col("text"), 3)).collect()(0).getSeq[String](0)
    assert(one == Seq("a b c", "b c d"))
    val short = Seq((0L, "a b")).toDF("doc_id", "text")
      .select(TextFunctions.wordShingles(col("text"), 3)).collect()(0).getSeq[String](0)
    assert(short == Seq("a b"))
  }

  test("exactGroups: dup docs collapse to the min id with copy count") {
    val groups = Dedup.exactGroups(docs, "doc_id", "text")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(groups(0L) == 2) // docs 0 and 3
    assert(groups(1L) == 1)
  }

  test("nearDuplicates finds the near pair and not the unrelated ones") {
    val pairs = Dedup.nearDuplicates(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 1L))) // one word differs
    assert(keys.contains((0L, 3L)) && pairs.find(p => p._1 == 0 && p._2 == 3).get._3 == 1000000L)
    assert(!keys.exists { case (a, b) => a == 2L || b == 2L })
  }

  test("simhash: identical docs share the hash; near docs are close; far docs far") {
    val sh = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(3L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(0L), sh(1L)) < ham(sh(0L), sh(2L)))
  }

  test("simhashPairs honors the pigeonhole recall guarantee") {
    import session.implicits._
    // craft signatures: b differs from a in 3 bits, c differs in 30
    val a = 0x0123456789abcdL
    val b = a ^ ((1L << 2) | (1L << 20) | (1L << 40))
    val c = a ^ ((1L << 60) - 1L >> 15 << 15) // many differing bits
    val sigs = Seq((0L, a), (1L, b), (2L, c)).toDF("id", "simhash")
    val pairs = Dedup.simhashPairs(sigs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((0L, 1L, 3L)))
  }

  test("band-bucket skew guard: mass-duplicate corpus yields O(k) star pairs, full recall") {
    import session.implicits._
    // adversarial corpus: 1000 identical docs (every band bucket degenerate)
    // plus one unrelated doc
    val corpus = ((0L until 1000L).map(i =>
      (i, "the same boilerplate text repeated everywhere in this corpus")) :+
      (5000L, "completely different content about unrelated matters entirely"))
      .toDF("doc_id", "text")
    val pairs = Dedup.nearDuplicates(corpus, "doc_id", "text",
      threshold = 0.9, cache = false, maxBucket = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // star shape: k-1 pairs (rep=0 vs each member), NOT k*(k-1)/2 ≈ 500k
    assert(pairs.length == 999, s"expected 999 star pairs, got ${pairs.length}")
    assert(pairs.forall(p => p._1 == 0L && p._3 == 1000000L))
    // full dedup recall: every duplicate doc is in at least one pair
    assert(pairs.map(_._2).toSet == (1L until 1000L).toSet)
    assert(!pairs.exists(p => p._1 == 5000L || p._2 == 5000L))

    // same guard on the simhash path: identical signatures, capped buckets
    val sigs = ((0L until 500L).map(i => (i, 0x0123456789abcdL)) :+
      (9000L, 0x7edcba9876543210L)).toDF("id", "simhash")
    val sp = Dedup.simhashPairs(sigs, maxHamming = 3, cache = false, maxBucket = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sp.length == 499, s"expected 499 star pairs, got ${sp.length}")
    assert(sp.forall(p => p._1 == 0L && p._3 == 0L))
    assert(sp.map(_._2).toSet == (1L until 500L).toSet)
  }

  test("writeShuffled: per-shard order is the seeded permutation, identical across exports") {
    import session.implicits._
    val corpus = (0 until 400).map(i => (i.toLong, s"doc $i")).toDF("id", "text")
    def export(): Map[Long, Seq[Long]] = {
      val root = java.nio.file.Files.createTempDirectory("graft-shuffle-out")
      val dir = s"$root/out" // the writer refuses a pre-existing path
      Sampling.writeShuffled(corpus, "id", shards = 4, dir)
      // parquet preserves within-file row order; single file per shard here
      val out = (0L until 4L).map { sh =>
        sh -> session.read.parquet(s"$dir/shard=$sh")
          .select($"id").collect().map(_.getLong(0)).toSeq
      }.toMap
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p): Unit)
      out
    }
    val run1 = export(); val run2 = export()
    assert(run1 == run2, "two exports must be bit-identical per shard")
    assert(run1.values.map(_.size).sum == 400 &&
      run1.values.flatten.toSet == (0L until 400L).toSet)
    // the within-shard sequence IS the seeded hash order, not id order
    val expected = Sampling.shuffleShards(corpus, "id", 4)
      .orderBy($"shard", $"shuffle_key")
      .select($"shard", $"id").collect()
      .groupBy(_.getLong(0)).map { case (s, rs) => s -> rs.map(_.getLong(1)).toSeq }
    assert(run1 == expected)
    assert(run1.values.exists(seq => seq != seq.sorted), "order must be shuffled")
  }

  test("deterministic sampling: repeatable, nested fractions, exact stratified rates") {
    import session.implicits._
    val rows = (0L until 2000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "stratum")
    val s20 = Sampling.deterministicSample(rows, "doc_id", 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s20again = Sampling.deterministicSample(rows, "doc_id", 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s50 = Sampling.deterministicSample(rows, "doc_id", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s20 == s20again, "sampling must be repeatable")
    assert(s20.subsetOf(s50), "a smaller fraction must be nested in a larger one")
    assert(s20.size > 200 && s20.size < 600, s"~20% expected, got ${s20.size}")

    val strat = Sampling.stratifiedSample(rows, "stratum",
      Map("a" -> 1.0, "b" -> 0.0), keyCol = "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(strat.forall(_._2 == "a") && strat.length == 1000,
      "rate 1.0 keeps everything, rate 0.0 keeps nothing")
    // unlisted strata take the default fraction
    val dflt = Sampling.stratifiedSample(rows, "stratum",
      Map("a" -> 0.0), keyCol = "doc_id", defaultFraction = 1.0)
      .collect().map(_.getString(1))
    assert(dflt.forall(_ == "b") && dflt.length == 1000)
  }

  test("splitAssign: total partition, repeatable, stable under corpus growth") {
    import session.implicits._
    val rows = (0L until 3000L).toDF("doc_id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.splitAssign(rows, "doc_id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 3000, "every row gets exactly one split")
    val byName = out.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byName("train") > 2200 && byName("train") < 2600, s"~80%: $byName")
    assert(byName("val") > 180 && byName("val") < 420, s"~10%: $byName")
    // growth stability: the same ids keep their split in a larger corpus
    val grown = Sampling.splitAssign((0L until 6000L).toDF("doc_id"), "doc_id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.forall { case (id, s) => grown(id) == s },
      "membership must not migrate when the corpus grows")
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(rows, "doc_id", Seq("a" -> 0.5, "b" -> 0.2))
    }
  }

  test("weightedSample: heavier rows win more often, zero weights excluded, repeatable") {
    import session.implicits._
    // 500 light rows (w=1) vs 500 heavy rows (w=50): the heavy half should
    // dominate a 100-row sample overwhelmingly (E[heavy] ≈ 98)
    val rows = ((0L until 500L).map(i => (i, 1L)) ++
      (1000L until 1500L).map(i => (i, 50L)) :+ (9999L, 0L)).toDF("doc_id", "w")
    val picked = Sampling.weightedSample(rows, "doc_id", "w", k = 100)
      .collect().map(_.getLong(0))
    assert(picked.length == 100)
    assert(!picked.contains(9999L), "zero-weight rows must be excluded")
    val heavy = picked.count(_ >= 1000L)
    assert(heavy > 80, s"heavy rows should dominate: $heavy/100")
    val again = Sampling.weightedSample(rows, "doc_id", "w", k = 100)
      .collect().map(_.getLong(0))
    assert(picked.toSeq == again.toSeq, "selection must be deterministic")
  }

  test("quotaSample: caps every group, deterministic choice, small groups whole") {
    import session.implicits._
    val rows = ((0L until 500L).map(i => (i, "big")) ++
      (1000L until 1005L).map(i => (i, "small"))).toDF("doc_id", "grp")
    val kept = Sampling.quotaSample(rows, "grp", "doc_id", quota = 50)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val byGrp = kept.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byGrp("big").size == 50)
    assert(byGrp("small") == (1000L until 1005L).toSet, "under-quota groups kept whole")
    val again = Sampling.quotaSample(rows, "grp", "doc_id", quota = 50)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(again == kept.toSet, "quota choice must be deterministic")
    // hash-ordered, not id-ordered: the kept 50 should not be a prefix
    assert(byGrp("big") != (0L until 50L).toSet, "subset must be hash-chosen")
  }

  test("decontaminate: planted benchmark copy flagged, disjoint doc clean") {
    import session.implicits._
    val benchmark = Seq(
      (0L, "the quick brown fox jumps over the lazy dog every single day")).toDF("doc_id", "text")
    val corpus = Seq(
      // verbatim copy → shares many 8-grams
      (10L, "the quick brown fox jumps over the lazy dog every single day"),
      // shares exactly one 8-gram window
      (11L, "watch the quick brown fox jumps over the lazy cat instead"),
      // disjoint
      (12L, "completely unrelated words that never appear anywhere in benchmarks")
    ).toDF("doc_id", "text")
    val out = Pipelines.decontaminate(corpus, benchmark, shingleN = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(10L)._2 && out(10L)._1 >= 4, s"copy must be flagged: ${out(10L)}")
    assert(out(11L) == ((1L, true)), s"one shared 8-gram: ${out(11L)}")
    assert(out(12L) == ((0L, false)), s"clean doc: ${out(12L)}")
  }

  test("dupShingleRatio: degenerate repetition near-max, unique text zero, short doc zero") {
    import session.implicits._
    val rows = Seq(
      (1L, Seq.fill(30)("spam phrase here").mkString(" ")), // degenerate
      (2L, "every word in this sentence appears exactly once today"),
      (3L, "hi")).toDF("doc_id", "text")
    val out = rows.select(col("doc_id"),
      TextFunctions.dupShingleRatioMicro(col("text"), 2).as("r"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) > 900000L, s"degenerate doc must be near 1.0: ${out(1L)}")
    assert(out(2L) == 0L && out(3L) == 0L)
  }

  test("redactPii: every category replaced, clean text untouched, counts exact") {
    import session.implicits._
    val rows = Seq(
      (1L, "mail a.b+c@test-site.org or call +1 555-123-4567 from 192.168.0.1 now"),
      (2L, "no pii here, just words and numbers like 42 and 3.14")).toDF("doc_id", "text")
    val out = rows.select(
      Seq(col("doc_id"), TextFunctions.redactPii(col("text")).as("red")) ++
        TextFunctions.piiCounts(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    val red1 = out(1L).getString(1)
    assert(red1.contains("<EMAIL>") && red1.contains("<PHONE>") && red1.contains("<IP>"), red1)
    assert(!red1.contains("@") && !red1.contains("192.168"), red1)
    assert(out(1L).getInt(2) == 1 && out(1L).getInt(3) == 1 && out(1L).getInt(4) == 1)
    assert(out(2L).getString(1) == "no pii here, just words and numbers like 42 and 3.14")
    assert(out(2L).getInt(2) == 0 && out(2L).getInt(3) == 0 && out(2L).getInt(4) == 0)
  }

  test("packBins: per-shard greedy bins respect the token budget boundaries") {
    import session.implicits._
    // shard 0: token counts 1000, 1500, 600, 2048 → starts 0,1000,2500,3100
    // → bins 0,0,1,1 ; shard 1: 3000, 10 → bins 0,1
    val rows = Seq(
      (0L, 0, 1000L), (1L, 0, 1500L), (2L, 0, 600L), (3L, 0, 2048L),
      (10L, 1, 3000L), (11L, 1, 10L)).toDF("doc_id", "shard", "tokens")
    val out = Packing.packBins(rows, "shard", "doc_id", col("tokens"), 2048L)
      .select("doc_id", "start_offset", "bin")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(0L) == ((0L, 0L)) && out(1L) == ((1000L, 0L)))
    assert(out(2L) == ((2500L, 1L)) && out(3L) == ((3100L, 1L)))
    assert(out(10L) == ((0L, 0L)) && out(11L) == ((3000L, 1L)))
  }

  test("cosine: identity is 1.0, orthogonal is 0.0") {
    import session.implicits._
    val v = Seq((0L, Seq(1.0f, 0.0f, 0.0f)), (1L, Seq(0.0f, 1.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f, 0.0f))).toDF("id", "vec")
    val top = Similarity.bruteForceTopK(
      v.filter(col("id") === 0), v.filter(col("id") > 0), k = 2)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toList
    assert(top == List((2L, 1000000L), (1L, 0L)))
  }

  test("ivfTopK returns each query's neighbors from probed cells only") {
    import session.implicits._
    // two tight clusters around e1 and e2
    val vecs = Seq(
      (0L, Seq(1.0f, 0.01f)), (1L, Seq(1.0f, 0.02f)), (2L, Seq(1.0f, 0.03f)),
      (10L, Seq(0.01f, 1.0f)), (11L, Seq(0.02f, 1.0f))).toDF("id", "vec")
    val res = Similarity.ivfTopK(
      queries = vecs.filter(col("id") === 0),
      candidates = vecs.filter(col("id") > 0),
      centroids = vecs.filter(col("id") === 1 || col("id") === 10),
      k = 3, nprobe = 1)
      .collect().map(_.getLong(2)).toList
    // probe=1 → only the e1 cell is scanned: ids 1,2 (not 10,11)
    assert(res == List(1L, 2L))
  }

  test("graft_dot: codegen expression, SQL registration, fold parity") {
    import session.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    // direct column path
    val direct = df.select(Similarity.dot(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(direct == 32.0)
    // SQL path via the extensions-registered function
    df.createOrReplaceTempView("vecs")
    val viaSql = session.sql("SELECT graft_dot(a, b) FROM vecs").collect()(0).getDouble(0)
    assert(viaSql == 32.0)
    // identical to the interpreted fold, bit for bit
    val fold = df.select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), _ + _)).collect()(0).getDouble(0)
    assert(direct == fold)
    // null element → null result
    val withNull = Seq((Seq(Some(1.0), None), Seq(Some(1.0), Some(2.0))))
      .toDF("a", "b")
      .select(Similarity.dot(col("a"), col("b"))).collect()(0)
    assert(withNull.isNullAt(0))
    // length mismatch → null (zip_with parity), and the expression must
    // declare itself nullable even over non-nullable array literals
    val mismatch = session.range(1)
      .select(Similarity.dot(array(lit(1.0), lit(2.0)), array(lit(3.0))).as("d"))
    assert(mismatch.schema("d").nullable)
    assert(mismatch.collect()(0).isNullAt(0))
    val nonNullable = session.range(1)
      .select(Similarity.dot(array(lit(1.0), lit(2.0)), array(lit(3.0), lit(4.0))).as("d"))
      .collect()(0).getDouble(0)
    assert(nonNullable == 11.0)
  }

  test("qualityFlag: length/diversity/stopword gates behave as documented") {
    import session.implicits._
    val docs2 = Seq(
      (0L, "the quick brown fox jumps over the lazy dog and then it runs far away home"),
      (1L, "a b"), // too short
      (2L, "spam spam spam spam spam spam spam spam spam spam spam spam"), // zero stopwords, low TTR
      (3L, "pneumonoultramicroscopicsilicovolcanoconiosis " * 12) // mean token length too high
    ).toDF("doc_id", "text")
    val flags = docs2.select($"doc_id", TextFunctions.qualityFlag($"text"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags(0L))
    assert(!flags(1L) && !flags(2L) && !flags(3L))
  }

  test("cellBlockedNearDuplicates: within-cell pairs above threshold only") {
    import session.implicits._
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.99f, 0.05f)), (2L, Seq(0.7f, 0.7f)),
      (10L, Seq(0.0f, 1.0f)), (11L, Seq(0.05f, 0.99f))).toDF("id", "vec")
    val centroids = vecs.filter(col("id").isin(0L, 10L))
    val pairs = Similarity.cellBlockedNearDuplicates(vecs, centroids, 900000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (0,1) and (10,11) are same-cell near-dups; 2 is same cell as 0/1 but
    // below 0.9; cross-cell pairs are never considered
    assert(pairs == Set((0L, 1L), (10L, 11L)))
  }

  test("cleanCorpus: quality gate, exact dedup, and near-dup removal compose") {
    import session.implicits._
    val base = "the quick brown fox jumps over the lazy dog and then it runs far away home"
    val corpus = Seq(
      (0L, base),                                // survives
      (1L, base),                                // exact dup of 0 → dropped
      (2L, base.replace("home", "tonight")),     // near dup of 0 → dropped
      (3L, "a b"),                               // fails quality gate
      (4L, "it is a completely different story full of the other words and nothing shared here at all")
    ).toDF("doc_id", "text")
    val survivors = Pipelines.cleanCorpus(corpus, nearDupThreshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(survivors == Seq(0L, 4L))
  }

  test("multimodal decode: batch plumbing with stubbed decoder for opaque types") {
    import session.implicits._
    val media = Seq(
      MediaRecord(1L, "application/octet-stream", Array[Byte](64, 32, 1, 2, 3)),
      MediaRecord(2L, "application/octet-stream", Array.empty[Byte])).toDS()
    val meta = Multimodal.decode(media).collect().map(m => m.doc_id -> m).toMap
    assert(meta(1L).width == 64 && meta(1L).height == 32 && meta(1L).n_bytes == 5)
    assert(meta(2L).width == 0 && meta(2L).height == 0 && meta(2L).n_bytes == 0)
    assert(meta(1L).fingerprint.length == 32)
  }

  test("multimodal decode: real imageio header decode for image/* payloads") {
    import session.implicits._
    def imageBytes(format: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)))
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, format, out))
      out.toByteArray
    }
    val media = Seq(
      MediaRecord(1L, "image/png", imageBytes("png", 7, 5)),
      MediaRecord(2L, "image/jpeg", imageBytes("jpg", 12, 3)),
      // opaque type alongside: stub path still taken in the same batch
      MediaRecord(3L, "audio/wav", Array[Byte](9, 4, 1))).toDS()
    val meta = Multimodal.decode(media).collect().map(m => m.doc_id -> m).toMap
    assert(meta(1L).width == 7 && meta(1L).height == 5)
    assert(meta(2L).width == 12 && meta(2L).height == 3)
    assert(meta(3L).width == 9 && meta(3L).height == 4)
    // a declared image that no reader can parse fails loudly, not fake dims
    val bad = Seq(MediaRecord(4L, "image/png", Array[Byte](1, 2, 3))).toDS()
    intercept[org.apache.spark.SparkException] {
      Multimodal.decode(bad).collect()
    }
  }

  test("aHash: near-identical images collide, dissimilar ones diverge; feeds simhashPairs") {
    import session.implicits._
    def png(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 64).foreach(x => (0 until 64).foreach(y => img.setRGB(x, y, f(x, y))))
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", out))
      out.toByteArray
    }
    def gray(v: Int) = (v << 16) | (v << 8) | v
    val gradient = png((x, _) => gray(x * 4))              // left-dark → right-bright
    val perturbed = png((x, y) =>                          // same + faint noise
      gray(math.min(255, x * 4 + ((x * y) % 3))))
    val inverted = png((x, _) => gray(255 - x * 4))        // opposite structure
    val media = Seq(
      MediaRecord(1L, "image/png", gradient),
      MediaRecord(2L, "image/png", perturbed),
      MediaRecord(3L, "image/png", inverted)).toDS()
    val hashes = Multimodal.perceptualHashes(media)
    val byId = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(byId(1L), byId(2L)) <= 3)   // perceptually same
    assert(hamming(byId(1L), byId(3L)) > 10)   // structurally opposite
    // composes with the text-simhash pairing machinery unchanged
    val pairs = Dedup.simhashPairs(hashes, maxHamming = 3, cache = false)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("multimodal resize: output is exactly w*h bytes, schema-preserving") {
    import session.implicits._
    val media = Seq(
      MediaRecord(1L, "image/fake", Array[Byte](10, 20, 30)),
      MediaRecord(2L, "image/fake", Array.empty[Byte])).toDS()
    val resized = Multimodal.resize(media, 4, 2).collect().map(r => r.doc_id -> r).toMap
    assert(resized(1L).payload.toSeq == Seq[Byte](10, 20, 30, 10, 20, 30, 10, 20))
    assert(resized(2L).payload.length == 8 && resized(2L).payload.forall(_ == 0))
    assert(resized(1L).media_type == "image/fake")
  }

  test("multimodal sampleFrames: every-Nth framing; everyNth=1 reassembles") {
    import session.implicits._
    val payload = Array.tabulate(37)(_.toByte) // 10 frames of 4 (last short)
    val media = Seq(MediaRecord(7L, "video/fake", payload)).toDS()
    val sampled = Multimodal.sampleFrames(media, frameBytes = 4, everyNth = 3)
      .collect().sortBy(_.frame_index)
    assert(sampled.map(_.frame_index).toSeq == Seq(0L, 3L, 6L, 9L))
    assert(sampled.head.frame.toSeq == Seq[Byte](0, 1, 2, 3))
    assert(sampled.last.frame.toSeq == Seq[Byte](36)) // short tail frame
    val all = Multimodal.sampleFrames(media, frameBytes = 4, everyNth = 1)
      .collect().sortBy(_.frame_index).flatMap(_.frame)
    assert(all.toSeq == payload.toSeq) // lossless framing
  }

  test("multimodal extractFeatures: deterministic dim-d vectors feed Similarity ops") {
    import session.implicits._
    val media = Seq(
      MediaRecord(1L, "image/fake", Array[Byte](-1, -1, 0, 0)), // 255s fold to f(0),f(1)
      MediaRecord(2L, "image/fake", Array[Byte](-1, -1, 0, 0)),
      MediaRecord(3L, "image/fake", Array[Byte](0, 0, -1, -1))).toDS()
    val feats = Multimodal.extractFeatures(media, dim = 2)
      .collect().map(f => f.doc_id -> f.features.toSeq).toMap
    assert(feats(1L) == Seq(1.0f, 1.0f))
    assert(feats(1L) == feats(2L)) // deterministic
    assert(feats(3L) == Seq(1.0f, 1.0f)) // wraps mod dim
    assert(feats(1L).size == 2)
  }

  test("rollingFingerprint matches a JVM fold model on random ASCII docs") {
    import session.implicits._
    val rnd = new scala.util.Random(42)
    val docs3 = (0 until 200).map { i =>
      val len = 1 + rnd.nextInt(300)
      (i.toLong, (0 until len).map(_ => (32 + rnd.nextInt(95)).toChar).mkString)
    }
    def model(s: String): Long =
      s.trim.foldLeft(0L)((h, c) => math.floorMod(h * 257L + c.toLong, 2147483647L))
    val got = docs3.toDF("id", "text")
      .select($"id", TextFunctions.rollingFingerprint($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs3.foreach { case (id, text) =>
      assert(got(id) == model(text), s"doc $id: ${text.take(40)}")
    }
  }

  test("bpeTokenCount matches a JVM regex model on random ASCII docs") {
    import session.implicits._
    val rnd = new scala.util.Random(7)
    val docs3 = (0 until 200).map { i =>
      val len = 1 + rnd.nextInt(200)
      (i.toLong, (0 until len).map(_ => (32 + rnd.nextInt(95)).toChar).mkString)
    }
    val re = TextFunctions.BpeTokenPattern.r
    val got = docs3.toDF("id", "text")
      .select($"id", TextFunctions.bpeTokenCount($"text").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs3.foreach { case (id, text) =>
      assert(got(id) == re.findAllIn(text.trim).length.toLong, s"doc $id")
    }
  }

  test("splitAssignClustered keeps every duplicate cluster in one split") {
    import session.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = (0 until 100).map(i => (i.toLong, s"document body number $i"))
    val corpus = (docs ++ docs.take(20).map { case (id, t) => (id + 1000L, t) })
      .toDF("doc_id", "text")
    val clusters = corpus.select($"doc_id".as("node"),
      min($"doc_id").over(Window.partitionBy(md5($"text"))).as("cluster"))
    val split = Sampling.splitAssignClustered(corpus, "doc_id", clusters,
        Seq("train" -> 0.5, "test" -> 0.5))
      .select($"doc_id", $"split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    (0 until 20).foreach { i =>
      assert(split(i.toLong) == split(i + 1000L), s"cluster of doc $i straddles")
    }
    // non-vacuous: the per-id split WOULD have separated at least one pair
    val plain = Sampling.splitAssign(corpus, "doc_id",
        Seq("train" -> 0.5, "test" -> 0.5))
      .select($"doc_id", $"split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((0 until 20).exists(i => plain(i.toLong) != plain(i + 1000L)))
    // singletons (absent from any cluster pair) still split by their own key
    assert((20 until 100).forall(i => split(i.toLong) == plain(i.toLong)))
  }

  test("SRP-LSH surfaces scaled near-duplicates and emits each pair exactly once") {
    import session.implicits._
    val rnd = new scala.util.Random(5)
    val base = (0 until 40).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
    // 0.25-scaled copies: cosine exactly 1.0, signatures near-identical
    val corpus = base ++ base.take(3).map { case (id, v) =>
      (id + 1000L, v.map(_ * 0.25f)) }
    val pairs = SrpLsh.srpPairs(corpus.toDF("id", "vec"),
      nbits = 16, bands = 4, thresholdMicro = 990000L).collect()
    val found = pairs.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    (0 until 3).foreach { i =>
      assert(found.exists(p => p._1 == i && p._2 == i + 1000L && p._3 == 1000000L),
        s"planted pair $i missing: ${found.toSeq}")
    }
    // the first-shared-band filter must emit each candidate pair ONCE even
    // when signatures share several bands (planted copies share all four)
    assert(found.map(p => (p._1, p._2)).distinct.length == found.length,
      s"duplicate pair rows: ${found.toSeq}")
    // signatures are deterministic: a second run returns the identical set
    val again = SrpLsh.srpPairs(corpus.toDF("id", "vec"),
      nbits = 16, bands = 4, thresholdMicro = 990000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSet == found.toSet)
  }

  test("native SRP band values equal the HOF reference formulation exactly") {
    import session.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(17)
    val vecs = (0 until 60).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1))).toDF("id", "vec")
    val q = vecs.withColumn("qvec", SrpLsh.quantize(col("vec")))
    for ((nbits, bands) <- Seq((16, 4), (64, 8), (24, 3))) {
      val both = q.select(col("id"),
          SrpLsh.bandValues(col("qvec"), nbits, bands).as("native"),
          SrpLsh.bandValuesHof(col("qvec"), nbits, bands, 16).as("hof"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"native/HOF divergence at id=${r.getLong(0)} nbits=$nbits bands=$bands")
      }
    }
  }

  test("srpPairs candidate dedup aggregates id pairs only — no vector columns") {
    import session.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.types.ArrayType
    val corpus = (0 until 30).map(i =>
      (i.toLong, Array.fill(8)(0.1f * (i % 7)))).toDF("id", "vec")
    val df = SrpLsh.srpPairs(corpus, nbits = 16, bands = 4, cache = false)
    val aggs = df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }
    assert(aggs.nonEmpty, "expected the distinct + bucket-stats aggregates")
    // the dedup/stats shuffles must carry ids, never the 64-float vectors —
    // at production dims a vector-carrying distinct moves ~30× the bytes
    aggs.foreach { a =>
      assert(!a.output.exists(_.dataType.isInstanceOf[ArrayType]),
        s"aggregate carries an array column: ${a.output.map(o => s"${o.name}:${o.dataType.simpleString}")}")
    }
  }

  test("SRP-LSH oversized buckets degrade to star candidates (O(k), not O(k²))") {
    import session.implicits._
    // 200 identical vectors: every band bucket holds all 200 — an unguarded
    // self-join would emit C(200,2)=19900 pairs; the star guard caps the
    // candidate set at k-1 pairs (everyone vs the min-id representative),
    // and every non-representative member still reaches exact verification
    val v = Array.fill(8)(0.5f)
    val corpus = (0 until 200).map(i => (i.toLong, v)).toDF("id", "vec")
    val pairs = SrpLsh.srpPairs(corpus, nbits = 16, bands = 4,
      thresholdMicro = 990000L, maxBucket = 16).collect()
    assert(pairs.length == 199, s"expected 199 star pairs, got ${pairs.length}")
    assert(pairs.forall(_.getLong(0) == 0L), "representative must be the min id")
    assert(pairs.map(_.getLong(1)).toSet == (1L until 200L).toSet)
  }

  test("Classifier score matches a JVM hash/mix/sum model on random word docs") {
    import session.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(13)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x1", "Y2", "zz",
      "the", "of", "and", "qqq", "lorem", "ipsum")
    val docs3 = (0 until 200).map { i =>
      val n = 1 + rnd.nextInt(60)
      (i.toLong, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def model(text: String): Long =
      text.trim.split("\\s+").foldLeft(0L) { (acc, t) =>
        val b = java.lang.Long.parseLong(md5hex(t).take(4), 16)
        acc + (math.floorMod(b * 2654435761L + 104729L, 64L) - 32L)
      }
    val got = docs3.toDF("id", "text")
      .select($"id", Classifier.score(TextFunctions.tokens(col("text"))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs3.foreach { case (id, text) =>
      assert(got(id) == model(text), s"doc $id: ${text.take(40)}")
    }
    // verdict is a pure threshold on the score
    val kept = docs3.toDF("id", "text")
      .select($"id", Classifier.keep(
        Classifier.score(TextFunctions.tokens(col("text")))).as("k"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    docs3.foreach { case (id, text) => assert(kept(id) == (model(text) >= 0L)) }
    // both verdicts occur — the operating point is not vacuous
    assert(kept.values.exists(identity) && kept.values.exists(!_))
  }

  test("bpe tokens and rolling fingerprint") {
    import session.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq("hello, world42 ok", "abc").toDF("text")
      .select(TextFunctions.bpeTokenCount(col("text")).as("n"),
        TextFunctions.rollingFingerprint(col("text")).as("fp"))
      .collect()
    // " ?letters | ?digits | ?punct-runs": hello / , / world / 42 / ok
    assert(df(0).getLong(0) == 5L)
    // 97*257^2 + 98*257 + 99 (cross-checked against the DuckDB fold)
    assert(df(1).getLong(1) == 6432038L)
  }

  test("persisted IVF index: cell-partitioned layout, identical results, pruned scan") {
    import session.implicits._
    val rnd = new scala.util.Random(3)
    def vec() = Array.fill(8)(rnd.nextFloat())
    val corpus = (10L until 90L).map(i => (i, vec())).toDF("id", "vec")
    val queries = (0L until 3L).map(i => (i, vec())).toDF("id", "vec")
    val centroids = (0L until 4L).map(i => (i, vec())).toDF("id", "vec")
    val idx = java.nio.file.Files.createTempDirectory("ivf-idx-spec").toString
    Similarity.saveIndex(corpus, centroids, idx)
    // the layout IS the index: one directory per cell (under the live
    // version's base shard)
    val root = Similarity.currentRoot(session, idx)
    val cellDirs = new java.io.File(s"$root/cells/shard=base").listFiles()
      .filter(_.getName.startsWith("cell=")).map(_.getName).toSet
    assert(cellDirs.nonEmpty)
    val direct = Similarity.ivfTopK(queries, corpus, centroids, k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val viaIndex = Similarity.ivfTopKIndexed(spark, idx, queries, k = 3, nprobe = 2)
    // guaranteed directory-level pruning: the cells-side scan opens ONLY
    // probed cell directories (explicit paths, not a post-hoc filter)
    val probedCells = Similarity.nearestCells(queries, centroids, 2)
      .select("cell").distinct().collect().map(_.getLong(0)).toSet
    val cellFiles = viaIndex.inputFiles.filter(_.contains("/cells/"))
    assert(cellFiles.nonEmpty)
    assert(cellFiles.forall(f => probedCells.exists(c => f.contains(s"/cell=$c/"))),
      cellFiles.mkString(","))
    val got = viaIndex.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == direct)
  }

  test("temperatureSample: sqrt-weighted targets, caps, and determinism") {
    import session.implicits._
    // sizes 100/25/4 → sqrt weights 10/5/2 (×1e6), W=17e6
    val corpus = ((0 until 100).map(i => ("big", s"b$i")) ++
      (0 until 25).map(i => ("mid", s"m$i")) ++
      (0 until 4).map(i => ("tiny", s"t$i"))).toDF("src", "k")
    def kept(budget: Long) =
      Sampling.temperatureSample(corpus, "src", "k", budget)
        .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // budget 17: exact integer targets 10/5/2 — tiny keeps 50%, big only 10%
    assert(kept(17) == Map("big" -> 10L, "mid" -> 5L, "tiny" -> 2L))
    // budget 100: mid (target 29) and tiny (target 11) cap at their sizes
    assert(kept(100) == Map("big" -> 58L, "mid" -> 25L, "tiny" -> 4L))
    // repeatable: identical membership across runs
    val twice = (1 to 2).map { _ =>
      Sampling.temperatureSample(corpus, "src", "k", 17)
        .select($"k").as[String].collect().toSet
    }
    assert(twice(0) == twice(1))
  }

  test("normalize: lowercase, drop non-alnum, collapse whitespace, trim") {
    import session.implicits._
    val out = Seq("  Hello,\tWORLD!!  42 ", "Çafé ñ", "", "...")
      .toDF("text").select(TextFunctions.normalize(col("text"))).as[String].collect()
    assert(out.toSeq == Seq("hello world 42", "af", "", ""))
  }

  test("duplicatedPassages counts cross-document shingle positions only") {
    import session.implicits._
    import org.apache.spark.sql.functions.col
    // docs 0 and 3 are identical; doc 1 differs in the last token;
    // doc 6 is pure within-doc repetition (unique corpus-wide)
    val corpus = docs.unionByName(
      Seq((6L, "rep rep rep rep rep rep rep")).toDF("doc_id", "text"))
    val byId = Dedup.duplicatedPassages(corpus, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc0/doc3: 12 tokens → 8 positions, all duplicated (identical docs)
    assert(byId(0L) === ((8L, 8L)))
    assert(byId(3L) === ((8L, 8L)))
    // doc1 shares every 5-gram except the one covering the final token
    assert(byId(1L) === ((8L, 7L)))
    // unrelated content: nothing duplicated
    assert(byId(2L)._2 === 0L)
    // within-doc repetition does NOT count as duplication
    assert(byId(6L)._2 === 0L)
  }

  test("signatureStore plans one aggregation — no self-join of lambda branches") {
    import session.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val docs = Seq((1L, "a b c d e"), (2L, "c d e f g")).toDF("doc_id", "text")
    val plan = Dedup.signatureStore(docs, "doc_id", "text").queryExecution.optimizedPlan
    // the signature and the collected shingle set must come from ONE
    // aggregate over the exploded rows; a join here re-runs the interpreted
    // shingle lambda once per branch (measured 2-3x the signature cost)
    assert(plan.collect { case j: Join => j }.isEmpty, plan)
  }

  test("nearestCells n=1 plans the packed-argmin aggregate: broadcast centroids, no window") {
    import session.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Window => LWindow}
    import graft.llm.Similarity
    val vecs = (0L until 50L).map(i => i -> Seq(i.toFloat, 1f)).toDF("id", "vec")
    val ctrs = Seq((0L, Seq(0f, 1f)), (1L, Seq(40f, 1f))).toDF("id", "vec")
    val qe = Similarity.nearestCells(vecs, ctrs, n = 1).queryExecution
    // corpus-side assignment must collapse via the min aggregate BEFORE any
    // exchange — a ranking window here would shuffle corpus×centroids rows
    assert(qe.optimizedPlan.collect { case w: LWindow => w }.isEmpty, qe.optimizedPlan)
    val joins = qe.optimizedPlan.collect { case j: Join => j }
    assert(joins.nonEmpty &&
      qe.sparkPlan.toString.contains("BroadcastNestedLoopJoin"),
      s"centroids must broadcast:\n${qe.sparkPlan}")
  }

  test("trimDuplicatedSpans randomized against brute force") {
    import session.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(23)
    val vocab = (0 until 12).map(i => s"v$i")
    val n = 4
    val base = (0L until 12L).map { i =>
      i -> Seq.fill(3 + rnd.nextInt(14))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    // half the corpus embeds an excerpt of an earlier doc at a random spot —
    // guaranteed cross-doc spans, with edges/clamping exercised by the
    // random placement and the random base lengths (incl. len < n docs)
    val docs = base ++ (0L until 12L).map { i =>
      val host = base(i.toInt)._2.split(" ")
      val take = math.max(1, rnd.nextInt(host.length))
      val exc = host.slice(rnd.nextInt(host.length - take + 1), Int.MaxValue).take(take)
      val own = Seq.fill(rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
      val at = rnd.nextInt(own.length + 1)
      (100L + i) -> (own.take(at) ++ exc ++ own.drop(at)).mkString(" ")
    }
    def toks(t: String) = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
    def shingles(t: String): Seq[(Int, String)] = {
      val w = toks(t)
      if (w.length < n) Seq(0 -> w.mkString(" "))
      else w.sliding(n).zipWithIndex.map { case (s, i) => i -> s.mkString(" ") }.toSeq
    }
    val docShingleSets = docs.map { case (id, t) => id -> shingles(t).map(_._2).toSet }.toMap
    val expected = docs.map { case (id, t) =>
      val w = toks(t)
      val dup = shingles(t).filter { case (_, s) =>
        docs.exists { case (oid, _) => oid != id && docShingleSets(oid).contains(s) }
      }
      val covered = dup.flatMap { case (p, _) => p to math.min(p + n - 1, w.length - 1) }.toSet
      val kept = w.zipWithIndex.collect { case (tok, p) if !covered(p) => tok }
      id -> ((w.length.toLong, covered.size.toLong, kept.mkString(" ")))
    }.toMap
    assert(expected.values.exists(_._2 > 0L)) // the fixture must exercise removal
    val got = Dedup.trimDuplicatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", n)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got == expected)
  }

  test("incrementalEmbedDedup: scaled copies die against the store, fresh vectors survive") {
    import session.implicits._
    import org.apache.spark.sql.functions.col
    import graft.llm.Similarity
    val e1 = Seq(1f, 0f, 0f, 0f); val e2 = Seq(0f, 1f, 0f, 0f)
    val centroids = Seq((0L, e1), (1L, e2)).toDF("id", "vec")
    val store = Similarity.nearestCells(
      Seq((10L, Seq(0.9f, 0.1f, 0f, 0f)), (11L, Seq(0.1f, 0.9f, 0f, 0f)))
        .toDF("id", "vec"), centroids, n = 1)
    val shard = Seq(
      (20L, Seq(0.45f, 0.05f, 0f, 0f)),  // 10 scaled by 0.5 → cos 1.0 → drops
      (21L, Seq(0f, 0f, 1f, 0f)),        // orthogonal to everything → survives
      (22L, Seq(0f, 0f, 0.5f, 0f))       // 21 scaled → drops within-shard
    ).toDF("id", "vec")
    val (survivors, nextStore) =
      Similarity.incrementalEmbedDedup(shard, store, centroids, 900000L)
    assert(survivors.select($"id").as[Long].collect().toSet == Set(21L))
    assert(nextStore.select($"id").as[Long].collect().toSet == Set(10L, 11L, 21L))
  }

  test("trimDuplicatedSpans removes the shared span, keeps framing, ignores within-doc repeats") {
    import session.implicits._
    import org.apache.spark.sql.functions.col
    val span = (1 to 10).map(i => s"s$i").mkString(" ")
    val corpus = Seq(
      (0L, s"a1 a2 a3 $span a4 a5"),     // host
      (1L, s"b1 $span b2 b3 b4"),        // copy with different framing
      (2L, "c1 c2 c3 c4 c5 c6 c7 c8"),   // untouched
      (3L, "rep rep rep rep rep rep rep rep rep") // within-doc repeat only
    ).toDF("doc_id", "text")
    val out = Dedup.trimDuplicatedSpans(corpus, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // the 10 shared tokens go from both docs; framing tokens survive in order
    assert(out(0L) === ((15L, 10L, "a1 a2 a3 a4 a5")))
    assert(out(1L) === ((14L, 10L, "b1 b2 b3 b4")))
    assert(out(2L) === ((8L, 0L, "c1 c2 c3 c4 c5 c6 c7 c8")))
    // within-doc repetition is corpus-unique → untouched
    assert(out(3L)._2 === 0L)
  }

  private def randVecs(seed: Int, n: Int, offset: Long = 0L) = {
    import session.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong + offset, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "vec")
  }

  test("appendToIndex is exactly-once per shard id; uncommitted debris is invisible") {
    val idx = java.nio.file.Files.createTempDirectory("llm-ivf-eo").toString
    val base = randVecs(7, 40)
    val shard = randVecs(8, 20, offset = 1000L)
    val centroids = randVecs(9, 4, offset = 9000L)
    Similarity.saveIndex(base, centroids, idx)
    assert(Similarity.appendToIndex(session, idx, shard, shardId = "day1"))
    def cellsSnapshot() = Similarity.readIndexCells(session, idx)
      .select("id", "cell").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(identity).toSeq
    val after = cellsSnapshot()
    assert(after.map(_._1).toSet == (0L until 40L).toSet ++ (1000L until 1020L))
    // replay of a committed shard: no-op, relation byte-identical
    assert(!Similarity.appendToIndex(session, idx, shard, shardId = "day1"))
    assert(cellsSnapshot() == after)
    // crash simulation: a shard directory WITHOUT its marker (write died
    // before the commit point) must be invisible to readers...
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"${Similarity.currentRoot(session, idx)}/_committed/day1"), false)
    assert(Similarity.readIndexCells(session, idx).select("id").collect()
      .map(_.getLong(0)).toSet == (0L until 40L).toSet)
    // ...and the retry replaces it wholesale: exactly one copy of every id
    assert(Similarity.appendToIndex(session, idx, shard, shardId = "day1"))
    assert(cellsSnapshot() == after)
  }

  test("rebalanceIndex rebuilds on occupancy skew, no-ops when balanced, preserves corpus") {
    import session.implicits._
    val idx = java.nio.file.Files.createTempDirectory("llm-ivf-rebal").toString
    val corpus = randVecs(11, 60)
    // a 1-centroid quantizer: one cell holds 100% of the corpus
    val degenerate = randVecs(12, 1, offset = 9000L)
    val balanced = randVecs(13, 6, offset = 9100L)
    Similarity.saveIndex(corpus, degenerate, idx)
    assert(Similarity.indexStats(session, idx).collect().map(_.getLong(1)).max == 60L)
    assert(Similarity.rebalanceIndex(session, idx, balanced, maxCellShareMicro = 500000L))
    // corpus preserved exactly; assignments equal a direct build's
    val direct = Similarity.nearestCells(corpus, balanced, 1)
      .select("id", "cell").collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
    val stored = Similarity.readIndexCells(session, idx)
      .select("id", "cell").collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
    assert(stored == direct)
    // skew gone → the same policy call is now a no-op (random 8-dim vectors
    // spread far under a 50% share bound over 6 cells)
    assert(!Similarity.rebalanceIndex(session, idx, balanced, maxCellShareMicro = 500000L))
    // post-rebalance queries go through the new quantizer end-to-end
    val qs = randVecs(14, 3, offset = 5000L)
    val viaIndex = Similarity.ivfTopKIndexed(session, idx, qs, k = 2, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(identity).toSeq
    val directTopK = Similarity.ivfTopK(qs, corpus, balanced, k = 2, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(identity).toSeq
    assert(viaIndex == directTopK)
  }

  test("native graft_minhash equals the explode + min(xxhash64) reference exactly") {
    import session.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(23)
    val words = Vector("alpha", "beta", "gamma", "delta", "x", "", "τσε", "a b")
    // lengths 0..24 cover: empty, shorter-than-n (single whole-doc shingle),
    // exact n, long docs with repeated shingles (multiset-vs-set min)
    val docs = (0 until 120).map { i =>
      (i.toLong, Vector.fill(rnd.nextInt(25))(words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("id", "text")
    for ((n, k) <- Seq((3, 8), (1, 4), (5, 64))) {
      val w = TextFunctions.tokens(col("text"))
      val native = docs.select(col("id"),
          graft.functions.MinhashFromTokens(w, n, k).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
      val sh = docs.select(col("id"),
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.array_distinct(
            TextFunctions.shinglesFromTokens(w, n))).as("s"))
      val ref = Dedup.minhashSignatures(sh, k)
        .collect().map(r => r.getLong(0) ->
          (1 to k).map(j => r.getLong(j)).toVector).toMap
      assert(native.keySet == ref.keySet)
      native.foreach { case (id, sig) =>
        assert(sig == ref(id), s"divergence at id=$id n=$n k=$k")
      }
      // the native distinct-shingle set matches the HOF formulation exactly
      // (content AND first-occurrence order)
      val nativeSh = docs.select(col("id"),
          graft.functions.DistinctShinglesFromTokens(w, n).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
      val refSh = docs.select(col("id"),
          org.apache.spark.sql.functions.array_distinct(
            TextFunctions.shinglesFromTokens(w, n)).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
      assert(nativeSh == refSh, s"shingle divergence at n=$n")
    }
  }

  test("native charShingles is bit-equal to the HOF reference formulation") {
    import session.implicits._
    import org.apache.spark.sql.functions._
    // covers: empty, whitespace-only, shorter-than-n, exactly-n, long,
    // multi-byte unicode, leading/trailing spaces, embedded runs of spaces
    val texts = Seq("", "   ", "ab", "abcd", "  abcd  ", "hello world, this is a doc",
      "ττσσεεδδ unicode ω mix", "a" * 300, ("ab " * 100).trim, null)
    val rnd = new scala.util.Random(31)
    val fuzz = (0 until 60).map(_ => (0 until rnd.nextInt(40))
      .map(_ => "aβc d".charAt(rnd.nextInt(5))).mkString)
    val df = (texts ++ fuzz).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (n <- Seq(1, 2, 4, 7)) {
      val t = trim(col("text"))
      val hof = when(length(t) <= n, array(t))
        .otherwise(transform(sequence(lit(1), length(t) - (n - 1)), i =>
          t.substr(i, lit(n))))
      val rows = df.select(col("id"),
          TextFunctions.charShingles(col("text"), n).as("nat"), hof.as("ref"))
        .collect()
      rows.foreach { r =>
        assert(r.isNullAt(1) == r.isNullAt(2), s"null divergence id=${r.getLong(0)} n=$n")
        if (!r.isNullAt(1))
          assert(r.getSeq[String](1) == r.getSeq[String](2),
            s"charShingles divergence id=${r.getLong(0)} n=$n")
      }
    }
  }

  test("maintainIndex re-clusters with deterministic k-means only when skewed") {
    val idx = java.nio.file.Files.createTempDirectory("llm-ivf-maint").toString
    val corpus = randVecs(21, 60)
    Similarity.saveIndex(corpus, randVecs(22, 1, offset = 9000L), idx) // 1 cell: 100%
    assert(Similarity.maintainIndex(session, idx, k = 6, iters = 2,
      maxCellShareMicro = 500000L))
    // corpus preserved; assignments equal a direct k-means-built index's
    val kc = Clustering.lloydCentroids(corpus, k = 6, iters = 2)
      .select(org.apache.spark.sql.functions.col("cid").as("id"),
        org.apache.spark.sql.functions.col("cvec").as("vec"))
    val direct = Similarity.nearestCells(corpus, kc, 1)
      .select("id", "cell").collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
    val stored = Similarity.readIndexCells(session, idx)
      .select("id", "cell").collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
    assert(stored == direct)
    // skew gone under k-means centroids → second maintenance call no-ops
    assert(!Similarity.maintainIndex(session, idx, k = 6, iters = 2,
      maxCellShareMicro = 500000L))
  }

  test("index installs are atomic: concurrent readers never see an empty index") {
    val idx = java.nio.file.Files.createTempDirectory("llm-ivf-atomic").toString
    Similarity.saveIndex(randVecs(31, 40), randVecs(32, 4, offset = 9000L), idx)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val counts = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]
    @volatile var stop = false
    // NO external retry wrapper: readIndexCells retries the pointer-flip
    // resolution internally, and the superseded version's marked grace
    // window keeps a resolved plan's files intact through the folds
    val reader = new Thread(() => while (!stop) {
      try counts.add(Similarity.readIndexCells(session, idx).count())
      catch { case t: Throwable => errors.add(t): Unit }
    })
    reader.start()
    try (0 until 4).foreach(_ => Similarity.foldShards(session, idx))
    finally { stop = true; reader.join(30000) }
    assert(errors.isEmpty, s"reader errored during installs: ${errors.peek()}")
    assert(!counts.isEmpty)
    // old-or-new only: every observed count is the full corpus
    counts.forEach(n => assert(n == 40L, s"reader saw a partial index: $n"))
  }

  test("crashed or half-installed versions never corrupt the live index") {
    val idx = java.nio.file.Files.createTempDirectory("llm-ivf-crash").toString
    Similarity.saveIndex(randVecs(41, 30), randVecs(42, 3, offset = 9000L), idx)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def ids() = Similarity.readIndexCells(session, idx)
      .select("id").collect().map(_.getLong(0)).toSet
    val live = ids()
    assert(live == (0L until 30L).toSet)
    // crash mid-stage: a version dir with cells but no markers, pointer
    // untouched -> reads serve the live version; next maintenance sweeps it
    val stage = new org.apache.hadoop.fs.Path(s"$idx/v-99/cells/shard=base/cell=0")
    fs.mkdirs(stage)
    assert(ids() == live)
    Similarity.foldShards(session, idx)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idx/v-99")))
    assert(ids() == live)
    // a resolvable version whose markers are GONE is a loud error, never an
    // empty candidate set
    fs.delete(new org.apache.hadoop.fs.Path(
      s"${Similarity.currentRoot(session, idx)}/_committed"), true)
    intercept[IllegalStateException](Similarity.readIndexCells(session, idx).count())
  }

  test("maintainIndex folds shards past the bound; appends survive the fold") {
    val idx = java.nio.file.Files.createTempDirectory("llm-ivf-fold").toString
    Similarity.saveIndex(randVecs(51, 30), randVecs(52, 4, offset = 9000L), idx)
    (0 until 6).foreach(i => assert(Similarity.appendToIndex(session, idx,
      randVecs(60 + i, 10, offset = 1000L + i * 100), s"s$i")))
    assert(Similarity.committedShards(session, idx).size == 7)
    def ids() = Similarity.readIndexCells(session, idx)
      .select("id").collect().map(_.getLong(0)).toSet
    val before = ids()
    // share bound 100% -> never "skewed"; shard bound 4 -> fold triggers
    assert(Similarity.maintainIndex(session, idx, k = 4,
      maxCellShareMicro = 1000000L, maxShards = 4))
    assert(Similarity.committedShards(session, idx) == Seq("base"))
    assert(ids() == before) // pure relayout: corpus identical
    // second pass: both bounds hold -> no-op
    assert(!Similarity.maintainIndex(session, idx, k = 4,
      maxCellShareMicro = 1000000L, maxShards = 4))
    // appends keep working against the folded index
    assert(Similarity.appendToIndex(session, idx,
      randVecs(70, 5, offset = 5000L), "s9"))
    assert(ids() == before ++ (5000L until 5005L))
  }

  test("perceptual image dedup survives a flood of identical images (star guard)") {
    import session.implicits._
    // 300 byte-identical PNGs + 2 distinct ones: every band bucket holds the
    // whole flood, so an unguarded band join would emit ~45k pairs; the
    // star guard caps candidates at O(flood) vs the bucket representative
    // while still pairing EVERY member (hamming 0 to the representative).
    val grays = Multimodal.docGrays("flood seed")
    val other = Multimodal.docGrays("another image entirely")
    val recs = ((0L until 300L).map(id =>
        MediaRecord(id, "image/png", Multimodal.pngGray8x8(grays))) ++
      Seq(MediaRecord(300L, "image/png", Multimodal.pngGray8x8(other))))
      .toDS()
    val hashes = Multimodal.perceptualHashes(recs)
    val pairs = Dedup.simhashPairs(hashes, maxHamming = 3, maxBucket = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // star shape: every flood member pairs with the representative (id 0)
    assert((1L until 300L).forall(j => pairs.contains((0L, j, 0L))),
      s"missing star pairs; got ${pairs.length}")
    // bounded: nothing quadratic leaked through the guard
    assert(pairs.length < 1200, s"quadratic pair blow-up: ${pairs.length}")
  }

  test("audioHash: envelope bits survive the real WAV codec round-trip") {
    val smp = Multimodal.docSamples("audio seed")
    assert(smp.length == 256)
    // fingerprint computed from the raw samples, no codec involved
    val total = smp.map(_.toLong).sum
    val expected = (0 until 63).foldLeft(0L) { (acc, j) =>
      val fs = (0 until 4).map(k => smp(4 * j + k).toLong).sum
      if (fs * 64 > total) acc | (1L << j) else acc
    }
    // encode via javax.sound, decode via javax.sound — must be bit-exact
    val rec = MediaRecord(7L, "audio/wav", Multimodal.wavPcm8(smp, 8000))
    assert(Multimodal.audioHash(rec) == expected)
    // frame-0/1 swap preserves the total sum → only bits 0/1 can differ
    val sw = smp.clone()
    (0 until 4).foreach { k => val t = sw(k); sw(k) = sw(4 + k); sw(4 + k) = t }
    val swapped = Multimodal.audioHash(MediaRecord(8L, "audio/wav", Multimodal.wavPcm8(sw, 8000)))
    assert(java.lang.Long.bitCount(swapped ^ expected) <= 2)
    // 16-bit signed mono decodes through the magnitude branch
    Multimodal.audioHash(MediaRecord(9L, "audio/wav", Multimodal.wavPcm(9L, 8000, 1, 256))): Unit
    // loud on stereo (ambiguous envelope) and on junk bytes
    intercept[IllegalArgumentException] {
      Multimodal.audioHash(MediaRecord(10L, "audio/wav", Multimodal.wavPcm(10L, 8000, 2, 256)))
    }
    intercept[Exception] {
      Multimodal.audioHash(MediaRecord(11L, "audio/wav", Array.fill[Byte](64)(42)))
    }
  }

  test("audio near-dup survives a flood of identical clips (star guard)") {
    import session.implicits._
    val smp = Multimodal.docSamples("flood clip")
    val other = Multimodal.docSamples("an entirely different clip")
    val recs = ((0L until 300L).map(id =>
        MediaRecord(id, "audio/wav", Multimodal.wavPcm8(smp, 8000))) ++
      Seq(MediaRecord(300L, "audio/wav", Multimodal.wavPcm8(other, 8000))))
      .toDS()
    val pairs = Dedup.simhashPairs(Multimodal.audioHashes(recs), maxHamming = 3, maxBucket = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert((1L until 300L).forall(j => pairs.contains((0L, j, 0L))),
      s"missing star pairs; got ${pairs.length}")
    assert(pairs.length < 1200, s"quadratic pair blow-up: ${pairs.length}")
  }

  test("container probes parse real WAV headers and MP4 boxes, fail loudly on junk") {
    // WAV via the JDK's independent encoder
    val wav = MediaRecord(1L, "audio/wav", Multimodal.wavPcm(1L, 16000, 2, 480))
    val pw = Multimodal.probeContainer(wav)
    assert(pw == MediaProbe(1L, "wav", 30L, Some(16000L), Some(2L), None))
    // MP4 v0 mvhd + three traks
    val mp4 = MediaRecord(2L, "video/mp4", Multimodal.mp4Stub(600, 1800L, 3))
    val pm = Multimodal.probeContainer(mp4)
    assert(pm == MediaProbe(2L, "mp4", 3000L, None, None, Some(3L)))
    // v1 mvhd (64-bit times): hand-built to cover the version branch
    def box(t: String, payload: Array[Byte]): Array[Byte] =
      java.nio.ByteBuffer.allocate(payload.length + 8)
        .putInt(payload.length + 8).put(t.getBytes("US-ASCII")).put(payload).array()
    val mvhd1 = java.nio.ByteBuffer.allocate(112)
    mvhd1.put(1.toByte).put(Array[Byte](0, 0, 0)) // version 1 + flags
    mvhd1.putLong(0L).putLong(0L)                 // 64-bit ctime/mtime
    mvhd1.putInt(90000)                           // timescale
    mvhd1.putLong(450000L)                        // 64-bit duration
    val v1 = box("ftyp", "isom".getBytes("US-ASCII")) ++
      box("moov", box("mvhd", mvhd1.array()) ++ box("trak", Array.empty[Byte]))
    assert(Multimodal.probeContainer(MediaRecord(3L, "video/mp4", v1)) ==
      MediaProbe(3L, "mp4", 5000L, None, None, Some(1L)))
    // junk: loud, never a fake probe
    intercept[IllegalArgumentException](Multimodal.probeContainer(
      MediaRecord(4L, "audio/wav", Array.fill[Byte](64)(7))))
    // crafted sizes: loud, never a hang (0xFFFFFFF8 chunk size would make
    // an unguarded walker loop forever) or a negative-index crash
    val evil = Multimodal.wavPcm(5L, 8000, 1, 8)
    evil(16) = 0xf8.toByte; evil(17) = 0xff.toByte
    evil(18) = 0xff.toByte; evil(19) = 0xff.toByte // fmt chunk size -> huge
    intercept[IllegalArgumentException](Multimodal.probeContainer(
      MediaRecord(5L, "audio/wav", evil)))
    val evilMp4 = Multimodal.mp4Stub(1000, 100L, 1)
    evilMp4(0) = 0x80.toByte // ftyp box size -> 2^31
    intercept[IllegalArgumentException](Multimodal.probeContainer(
      MediaRecord(6L, "video/mp4", evilMp4)))
  }

  test("superseded index versions are MARKED, ride out in-flight plans, reap past the horizon") {
    val idx = java.nio.file.Files.createTempDirectory("llm-ivf-mark").toString
    Similarity.saveIndex(randVecs(71, 25), randVecs(72, 3, offset = 9000L), idx)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def exists(p: String) = fs.exists(new org.apache.hadoop.fs.Path(p))
    // resolve a plan against the LIVE version, then fold: the old rule
    // (reap at next maintenance op) would delete its files mid-plan
    val inflight = Similarity.readIndexCells(session, idx)
    Similarity.foldShards(session, idx) // installs v-2, supersedes v-1
    assert(exists(s"$idx/v-1/_superseded"), "superseded version must be marked")
    assert(inflight.count() == 25L,
      "an in-flight plan over the superseded version must still read its files")
    // a FURTHER maintenance op must NOT reap a fresh-marked version
    Similarity.foldShards(session, idx) // installs v-3, supersedes v-2
    assert(exists(s"$idx/v-1") && exists(s"$idx/v-2"),
      "fresh-marked versions survive subsequent ops (grace window)")
    // marked versions are invisible to resolution (pointer heal ignores them)
    assert(Similarity.currentRoot(session, idx).endsWith("v-3"))
    // past the staleness horizon the reap happens
    fs.setTimes(new org.apache.hadoop.fs.Path(s"$idx/v-1/_superseded"),
      System.currentTimeMillis() - 2 * graft.engine.Catalog.CompactLockStaleMs, -1)
    Similarity.foldShards(session, idx)
    assert(!exists(s"$idx/v-1"), "aged-out superseded version must be reaped")
    assert(exists(s"$idx/v-2"), "fresh-marked sibling stays")
    assert(Similarity.readIndexCells(session, idx).count() == 25L)
  }

  test("a crashed pointer flip never loses the index; maintenance heals it") {
    val idx = java.nio.file.Files.createTempDirectory("llm-ivf-ptr").toString
    Similarity.saveIndex(randVecs(81, 30), randVecs(82, 3, offset = 9000L), idx)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def ids() = Similarity.readIndexCells(session, idx)
      .select("id").collect().map(_.getLong(0)).toSet
    val live = ids()
    // simulate a crash inside flipCurrent's delete->rename window: the
    // pointer is gone but the complete version dir remains
    fs.delete(new org.apache.hadoop.fs.Path(s"$idx/_current"), false)
    // readers fall back to the highest complete version (never "empty")
    assert(ids() == live)
    // the next maintenance op HEALS the pointer instead of sweeping the
    // "unreferenced" complete version away
    Similarity.foldShards(session, idx)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$idx/_current")))
    assert(ids() == live)
  }

  test("appendToIndex replays stay no-ops after their shard was folded") {
    val idx = java.nio.file.Files.createTempDirectory("llm-ivf-foldeo").toString
    Similarity.saveIndex(randVecs(91, 20), randVecs(92, 3, offset = 9000L), idx)
    val shard = randVecs(93, 10, offset = 1000L)
    assert(Similarity.appendToIndex(session, idx, shard, "day5"))
    def ids() = Similarity.readIndexCells(session, idx)
      .select("id").collect().map(_.getLong(0)).toList.sorted
    val before = ids()
    // fold absorbs day5's data into the base shard
    Similarity.foldShards(session, idx)
    assert(Similarity.committedShards(session, idx) == Seq("base"))
    // a crash-recovery replay of the day5 append MUST stay a no-op: the
    // fold carries the commit evidence forward (exactly-once survives
    // maintenance)
    assert(!Similarity.appendToIndex(session, idx, shard, "day5"))
    assert(ids() == before, "replayed append after fold duplicated ids")
    // and the folded evidence survives a SECOND fold too
    Similarity.foldShards(session, idx)
    assert(!Similarity.appendToIndex(session, idx, shard, "day5"))
    assert(ids() == before)
  }

  test("append path is GATED: a clean index pays one LIST and never the reap sweep") {
    val idx = java.nio.file.Files.createTempDirectory("llm-ivf-gate").toString
    Similarity.saveIndex(randVecs(95, 20), randVecs(96, 3, offset = 9000L), idx)
    // clean index (one live version, no debris): the per-micro-batch
    // append must cost one pointer read + ONE version-root LIST and no
    // per-directory marker stats — the mark-and-reap sweep stays gated
    // off the hot path (object-store request cost at high append cadence)
    val sweeps0 = Similarity.staleSweeps.get()
    val lists0 = Similarity.rootListings.get()
    assert(Similarity.appendToIndex(session, idx, randVecs(97, 5, offset = 2000L), "s1"))
    assert(Similarity.staleSweeps.get() == sweeps0,
      "a clean append must not run the reap sweep")
    assert(Similarity.rootListings.get() - lists0 == 1,
      "a clean append must cost exactly one version-root LIST")
    // debris present (the fold superseded v-1): the gate opens and the
    // append sweeps — reap correctness is not lost, only deferred to
    // appends that actually have something to look at (or maintenance)
    Similarity.foldShards(session, idx)
    val sweeps1 = Similarity.staleSweeps.get()
    assert(Similarity.appendToIndex(session, idx, randVecs(98, 5, offset = 3000L), "s2"))
    assert(Similarity.staleSweeps.get() == sweeps1 + 1,
      "debris must open the gate: the append sweeps")
    // a missing pointer (crashed flip) always sweeps: that heal is what
    // keeps the append from failing outright
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$idx/_current"), false)
    assert(Similarity.appendToIndex(session, idx, randVecs(99, 5, offset = 4000L), "s3"))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$idx/_current")),
      "an append over a crashed flip must heal the pointer")
    assert(Similarity.readIndexCells(session, idx).select("id").collect()
      .map(_.getLong(0)).toSet ==
      ((0L until 20L) ++ (2000L until 2005L) ++ (3000L until 3005L)
        ++ (4000L until 4005L)).toSet)
  }
}