package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.{Dedup, Multimodal, TextFunctions => TF}
import Q._

/**
 * LLM-training-data text operators over `documents`: stats/quality, lang-id,
 * fingerprinting, exact dedup, MinHash-LSH near-dup with exact-Jaccard
 * verification, pairwise n-gram Jaccard, SimHash (+ pigeonhole-banded
 * near-dup pairs), and the multimodal binary-column pipeline.
 *
 * Every oracle is an independent SQL formulation (DuckDB list/lambda
 * functions, or machine-generated bit arithmetic for SimHash); the MinHash
 * query's oracle is the EXACT all-pairs Jaccard — so the LSH path is graded
 * on true recall, not against itself.
 */
object TextPack extends QueryPack {


  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_stats" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      d.select(col("doc_id"),
        TF.tokenCount(col("text")).as("n_tokens"),
        length(col("text")).cast("long").as("n_chars"),
        TF.distinctTokenCount(col("text")).as("n_distinct"),
        TF.markerCount(col("text"), Seq("the", "a", "of", "and", "is", "to", "in")).as("n_stop"),
        TF.typeTokenRatioMicro(col("text")).as("ttr_micro"),
        TF.meanTokenLenMicro(col("text")).as("mtl_micro"))
        .orderBy(col("doc_id"))
    },
    "q_text_langid" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val scores = TF.langScores(col("text"))
      d.select(Seq(col("doc_id")) ++
        scores.map { case (lang, c) => c.as(s"s_$lang") } :+
        TF.langId(col("text")).as("guess"): _*)
        .orderBy(col("doc_id"))
    },
    "q_text_quality" -> { (s, dir) =>
      val text = col("text")
      t(s, dir, "documents").select(col("doc_id"),
        TF.tokenCount(text).as("n_tokens"),
        TF.meanTokenLenMicro(text).as("mtl_micro"),
        TF.typeTokenRatioMicro(text).as("ttr_micro"),
        TF.stopwordRatioMicro(text, TF.LangMarkers.flatMap(_._2)).as("stop_micro"),
        TF.punctRatioMicro(text).as("punct_micro"),
        TF.qualityFlag(text).as("quality"))
        .orderBy(col("doc_id"))
    },
    "q_text_classifier" -> { (s, dir) =>
      // hashed bag-of-words linear classifier (fastText-style quality
      // filter): md5-bucketed tokens, integer weights, instance-summed
      // score, threshold verdict — the oracle re-derives every score
      // bit-identically from the same hash/mix formulas
      val d = t(s, dir, "documents")
      d.select(col("doc_id"),
          graft.llm.Classifier.score(TF.tokens(col("text"))).as("score"),
          TF.tokenCount(col("text")).as("n_tokens"))
        .withColumn("keep", graft.llm.Classifier.keep(col("score")))
        .orderBy(col("doc_id"))
    },
    "q_text_fingerprint" -> { (s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TF.fingerprint(col("text")).as("fp"),
        substring(TF.fingerprint(col("text")), 1, 8).as("fp8"))
        .orderBy(col("doc_id"))
    },
    "q_text_bpe" -> { (s, dir) =>
      // BPE-ish token counting + rolling-hash fingerprint, both with
      // independent SQL formulations (RE2 regex / list_reduce fold)
      t(s, dir, "documents").select(col("doc_id"),
        TF.bpeTokenCount(col("text")).as("n_bpe"),
        TF.tokenCount(col("text")).as("n_ws"),
        TF.rollingFingerprint(col("text")).as("roll_fp"))
        .orderBy(col("doc_id"))
    },
    "q_pipeline_clean" -> { (s, dir) =>
      // the composed cleaning pass: quality gate → exact dedup → verified
      // near-dup removal; the oracle independently re-derives the survivor
      // set (including the all-pairs Jaccard step), so the whole chain —
      // not just each operator — is graded. The corpus has no duplicate
      // texts at the graded scale factors, so copies of the first 25 docs
      // are synthesized under high ids (mirrored in the oracle): a broken
      // exact-dedup stage leaks them and fails the row count.
      val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val corpus = base.unionByName(
        base.filter(col("doc_id") < 25)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      graft.llm.Pipelines.cleanCorpus(corpus, nearDupThreshold = 0.9)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    },
    "q_pipeline_full" -> { (s, dir) =>
      // THE product use case, end-to-end as ONE composed DAG: ingest the
      // raw corpus into a TOPIC (metadata = doc id JSON, payload = the
      // document bytes), then curate straight off the topic read —
      // quality gate → exact dedup → verified near-dup removal →
      // benchmark decontamination → stratified sampling → greedy
      // sequence packing — and publish the packed-bin manifest a
      // training-export job would hand to the trainer. The oracle
      // re-derives EVERY stage from the raw documents table (including
      // the all-pairs Jaccard verify and the 8-gram contamination join),
      // so the COMPOSITION is graded, not just the parts. Planted rows
      // make each removal stage falsifiable: BOTH planted sets (ids +1e6
      // and +2e6) are exact text copies, so md5 dedup kills them and
      // keeps the min-id originals — the benchmark members (doc_id < 10)
      // thus reach decontamination as themselves and must die THERE (they
      // are verbatim benchmark text). A dedup that passes everything
      // leaks 35 copies into the manifest; a decontamination that flags
      // nothing leaks the 10 originals — either breaks the graded counts.
      val d = EnginePack.tempDriver(s)
      d.createTopic("pipe_full", partitions = 4)
      val topic = d.openTopic("pipe_full")
      val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val corpus = base
        .unionByName(base.filter(col("doc_id") < 25)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        .unionByName(base.filter(col("doc_id") < 10)
          .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
      topic.producer().produce(corpus.select(
        to_json(struct(col("doc_id"))).as("metadata"),
        encode(col("text"), "UTF-8").as("data")))
      val docs = topic.events().select(
        get_json_object(col("metadata"), "$.doc_id").cast("long").as("doc_id"),
        decode(col("data"), "UTF-8").as("text"))
      val cleaned = graft.llm.Pipelines.cleanCorpus(docs, nearDupThreshold = 0.9)
      val benchmark = base.filter(col("doc_id") < 10)
      val decon = cleaned.join(
        graft.llm.Pipelines.decontaminate(cleaned, benchmark, shingleN = 8)
          .filter(col("contaminated")).select(col("doc_id")),
        Seq("doc_id"), "left_anti")
      val sampled = graft.llm.Sampling.stratifiedSample(
        decon.withColumn("stratum",
          when(TF.tokenCount(col("text")) >= 40, "long").otherwise("short")),
        "stratum", Map("long" -> 1.0, "short" -> 0.2), keyCol = "doc_id")
      graft.llm.Packing.packBins(
          sampled.withColumn("shard", pmod(col("doc_id"), lit(4L)).cast("int")),
          "shard", "doc_id", TF.tokenCount(col("text")), maxTokens = 2048L)
        .groupBy(col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TF.tokenCount(col("text"))).as("sum_tokens"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy(col("shard"), col("bin"))
    },
    "q_sample_stratified" -> { (s, dir) =>
      // Deterministic stratified sampling: keep every long doc, 20% of the
      // short ones. The keep-decision is a pure md5-derived function of
      // doc_id (NOT rand()), so the oracle independently re-derives the
      // EXACT sample — membership, not just approximate counts.
      val docs = t(s, dir, "documents")
        .withColumn("stratum",
          when(TF.tokenCount(col("text")) >= 40, "long").otherwise("short"))
      graft.llm.Sampling.stratifiedSample(docs, "stratum",
          Map("long" -> 1.0, "short" -> 0.2), keyCol = "doc_id")
        .groupBy(col("stratum"))
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("sum_ids"))
        .orderBy(col("stratum"))
    },
    "q_sample_mixture" -> { (s, dir) =>
      // domain-mixing balancer: down-sample to a uniform 20%-per-language
      // target mixture — the binding group (smallest lang) stays whole,
      // everything else down-samples to match; md5-deterministic
      // membership graded exactly, not just counts
      graft.llm.Sampling.mixtureSample(t(s, dir, "documents"),
          groupCol = "lang", keyCol = "doc_id",
          shares = Map("en" -> 0.2, "de" -> 0.2, "fr" -> 0.2,
            "es" -> 0.2, "zh" -> 0.2))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("sum_ids"))
        .orderBy(col("lang"))
    },
    "q_decontaminate" -> { (s, dir) =>
      // Benchmark decontamination: docs 0..9 form the held-out benchmark;
      // the corpus is everything else PLUS planted verbatim copies of the
      // benchmark under high ids — so a broken overlap join that flags
      // nothing (or everything) fails the oracle. Natural corpus docs
      // sharing an 8-gram with the benchmark are counted identically by
      // both engines.
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val benchmark = docs.filter(col("doc_id") < 10)
      val corpus = docs.filter(col("doc_id") >= 10).unionByName(
        benchmark.select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
      graft.llm.Pipelines.decontaminate(corpus, benchmark, shingleN = 8)
        .orderBy(col("doc_id"))
    },
    "q_text_novelty" -> { (s, dir) =>
      // n-gram novelty vs a reference corpus: docs 0..49 are the reference,
      // the corpus is docs >= 50 PLUS planted verbatim copies of reference
      // docs 0..4 (ids +3000000) that must score novelty 0 — catching a
      // vacuous overlap join that reports everything fresh
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val reference = docs.filter(col("doc_id") < 50)
      val corpus = docs.filter(col("doc_id") >= 50).unionByName(
        docs.filter(col("doc_id") < 5)
          .select((col("doc_id") + 3000000L).as("doc_id"), col("text")))
      graft.llm.Pipelines.noveltyScore(corpus, reference, shingleN = 8)
        .orderBy(col("doc_id"))
    },
    "q_text_vocab_coverage" -> { (s, dir) =>
      // tokenizer-fit diagnostic: coverage of each document by the corpus's
      // own top-500 token vocabulary, and the per-doc OOV rate — the signal
      // that decides whether a tokenizer/vocab suits a corpus before
      // training. Scale shape: one corpus-level groupBy(token) with
      // map-side combine, a bounded top-K (deterministic ties: count desc,
      // token asc), the K-row vocab BROADCAST back against the exploded
      // tokens (no shuffle of the corpus for the membership test), one
      // groupBy(doc).
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), explode(TF.tokens(col("text"))).as("tok"))
        .filter(col("tok") =!= "")
      val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok")).limit(500)
        .select(col("tok").as("vtok"))
      toks.join(broadcast(vocab), col("tok") === col("vtok"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), count(col("vtok")).as("n_covered"))
        .withColumn("oov_micro",
          round((col("n_tokens") - col("n_covered")).cast("double")
            / col("n_tokens") * 1000000).cast("long"))
        .select(col("doc_id"), col("n_tokens"), col("n_covered"), col("oov_micro"))
        .orderBy(col("doc_id"))
    },
    "q_text_repetition" -> { (s, dir) =>
      // Gopher-style within-document repetition: duplicate 2-gram/3-gram
      // instance fractions, plus a planted degenerate doc (one phrase
      // repeated 40×) that must score near-maximal — catching a vacuous
      // ratio that returns 0 everywhere. Tokens materialize behind the
      // exchange so the shingle lambdas stay O(tokens) per doc.
      import s.implicits._
      val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val corpus = base.unionByName(Seq(
        (3000000L, Seq.fill(40)("buy cheap stuff now").mkString(" ")))
        .toDF("doc_id", "text"))
      corpus
        .select(col("doc_id"), TF.tokens(col("text")).as("w"))
        .repartition(col("doc_id"))
        .select(col("doc_id"),
          TF.dupShingleRatioFromTokens(col("w"), 2).as("dup2_micro"),
          TF.dupShingleRatioFromTokens(col("w"), 3).as("dup3_micro"))
        .orderBy(col("doc_id"))
    },
    "q_text_redact" -> { (s, dir) =>
      // PII scrubbing: the corpus has no organic PII, so synthetic emails /
      // IPs / phone numbers are appended to the first 50 docs (mirrored in
      // the oracle) — a redactor that misses a category, or mangles clean
      // text, fails the per-doc counts or the redacted-text fingerprint.
      val planted = t(s, dir, "documents")
        .select(col("doc_id"), when(col("doc_id") < 50,
          concat(col("text"),
            lit(" reach me at user"), col("doc_id").cast("string"),
            lit("@example.com or 555-123-4567"),
            lit(" from 10.0."), pmod(col("doc_id"), lit(256L)).cast("string"),
            lit(".17")))
          .otherwise(col("text")).as("text"))
      planted.select(
        Seq(col("doc_id")) ++
          TF.piiCounts(col("text")).map { case (n, c) => c.cast("long").as(n) } :+
          md5(TF.redactPii(col("text"))).as("redacted_fp"): _*)
        .orderBy(col("doc_id"))
    },
    "q_pack_bins" -> { (s, dir) =>
      // Greedy sequence packing: docs concatenated in id order within 4
      // shards, cut into 2048-token bins; per (shard, bin) document counts
      // and token sums are re-derived by the oracle's own window cumsum.
      val docs = t(s, dir, "documents")
        .withColumn("shard", pmod(col("doc_id"), lit(4L)).cast("int"))
      graft.llm.Packing.packBins(docs, "shard", "doc_id",
          TF.tokenCount(col("text")), maxTokens = 2048L)
        .groupBy(col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TF.tokenCount(col("text"))).as("sum_tokens"))
        .orderBy(col("shard"), col("bin"))
    },
    "q_dedup_exact" -> { (s, dir) =>
      Dedup.exactGroups(t(s, dir, "documents"), "doc_id", "text")
        .select(col("keep_id"), col("n_copies"))
        .orderBy(col("keep_id"))
    },
    "q_dedup_minhash" -> { (s, dir) =>
      // Graded against the EXACT all-pairs Jaccard oracle — deliberately:
      // LSH recall is what is being checked. Parameters are sized for the
      // fixture's margin (lowest true pair jac=0.90; with 16 bands of 4
      // rows a 0.90-pair is missed with p = (1-0.9^4)^16 ≈ 1.2e-6, and the
      // frozen seed=42 corpus is verified green; a pair at exactly 0.80
      // would carry p≈2e-4 — acceptable for graded data, tune bands up for
      // adversarial corpora).
      Dedup.nearDuplicates(t(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, bands = 16, rowsPerBand = 4, threshold = 0.8)
        .orderBy(col("doc_a"), col("doc_b"))
    },
    "q_dedup_trim_spans" -> { (s, dir) =>
      // duplicated-span REMOVAL (the rewrite duplicatedPassages only
      // measures): a 30-token excerpt of each long-enough early doc is
      // planted inside unique framing tokens — the span must be trimmed
      // from host AND copy while the framing and everything else survives.
      // Grading hashes the full rewritten text, so one misplaced token
      // anywhere in 500 docs fails the row.
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val w = TF.tokens(col("text"))
      val planted = docs.filter(col("doc_id") < 10 && size(w) >= 60)
        .select((col("doc_id") + 7000000L).as("doc_id"),
          concat(lit("zq1 zq2 zq3 "), array_join(slice(w, lit(11), lit(30)), " "),
            lit(" zq4 zq5")).as("text"))
      Dedup.trimDuplicatedSpans(docs.unionByName(planted), "doc_id", "text", n = 8)
        .select(col("doc_id"), col("n_tokens"), col("n_removed"),
          md5(col("trimmed")).as("trimmed_md5"))
        .orderBy(col("doc_id"))
    },
    "q_dedup_incremental_near" -> { (s, dir) =>
      // growing-corpus NEAR-dedup: the store is the MinHash signature
      // relation of shard 1 (docs < 250); shard 2 = docs >= 250 PLUS
      // planted near-duplicates — docs 0..9's text with the FIRST TOKEN
      // dropped (ids +5000000). Not verbatim, so exact-hash incremental
      // dedup would keep them; shingle Jaccard vs the host is (m-3)/(m-2)
      // ≥ 0.94 at m ≥ 20 tokens, so the banded store join must kill them.
      // Same LSH recall stance as q_dedup_minhash (16 bands × 4 rows: a
      // 0.9-pair missed with p ≈ 1.2e-6; graded against the EXACT
      // all-pairs Jaccard oracle, store scan never re-reads shard-1 text).
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val w = TF.tokens(col("text"))
      val planted = docs.filter(col("doc_id") < 10 && size(w) >= 20)
        .select((col("doc_id") + 5000000L).as("doc_id"),
          array_join(slice(w, lit(2), size(w)), " ").as("text"))
      val shard2 = docs.filter(col("doc_id") >= 250).unionByName(planted)
      // the store is a REAL persisted parquet relation (the cross-shard
      // lifecycle, like q_knn_ivf_indexed's index): shard 1 is tokenized
      // once at store-build time and never again — the dedup pass reads
      // signatures and shingle sets back from disk
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-sigstore").toString
      Dedup.signatureStore(docs.filter(col("doc_id") < 250),
          "doc_id", "text", shingleN = 3, bands = 16, rowsPerBand = 4)
        .write.mode("overwrite").parquet(storeDir)
      val (survivors, _) = Dedup.incrementalNear(shard2, "doc_id", "text",
        s.read.parquet(storeDir), shingleN = 3, bands = 16, rowsPerBand = 4,
        threshold = 0.8)
      survivors.select(col("doc_id")).orderBy(col("doc_id"))
    },
    "q_text_jaccard" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val pairs = docs.select(col("doc_id").as("doc_a"), (col("doc_id") + 1).as("doc_b"))
        .join(docs.select(col("doc_id").as("doc_b")), "doc_b")
      Dedup.pairJaccard(pairs, docs, "doc_id", TF.charShingles(col("text"), 4))
        .orderBy(col("doc_a"))
    },
    "q_dedup_simhash" -> { (s, dir) =>
      Dedup.simhash(t(s, dir, "documents"), "doc_id", "text")
        .select(col("id").as("doc_id"), col("simhash"))
        .orderBy(col("doc_id"))
    },
    "q_dedup_simhash_pairs" -> { (s, dir) =>
      Dedup.simhashPairs(
        Dedup.simhash(t(s, dir, "documents"), "doc_id", "text"), maxHamming = 3)
        .orderBy(col("doc_a"), col("doc_b"))
    },
    "q_media_neardup" -> { (s, dir) =>
      // Perceptual image near-dup: per document an 8×8 grayscale PNG is
      // rendered (pixel i = byte i of md5(text||chunk) — [[Multimodal
      // .docGrays]]), pushed through the REAL codec path (PNG encode →
      // full ImageIO pixel decode → 63-bit aHash) on executors, and the
      // hashes banded with the SAME pigeonhole machinery as text simhash
      // (Dedup.simhashPairs — bucketed joins, star-guarded, nothing
      // quadratic). Every 25th doc also plants a near-copy (first two
      // pixels SWAPPED — sum-preserving, so the aHash mean is unchanged
      // and only bits 0/1 can differ: hamming ≤ 2 by construction) under
      // id+10,000,000. The oracle re-derives the 64 gray values from md5
      // hex, the hash bits, and EVERY pair independently in SQL — the
      // codec round-trip is graded bit-exact, not trusted.
      import s.implicits._
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val jobs = docs.select(col("doc_id"), col("text"), lit(0).as("perturb"))
        .unionByName(docs.filter(col("doc_id") % 25 === 0)
          .select((col("doc_id") + 10000000L).as("doc_id"), col("text"),
            lit(1).as("perturb")))
      val media = jobs.as[(Long, String, Int)].map { case (id, text, perturb) =>
        val g = Multimodal.docGrays(text)
        if (perturb == 1) { val t0 = g(0); g(0) = g(1); g(1) = t0 }
        graft.llm.MediaRecord(id, "image/png", Multimodal.pngGray8x8(g))
      }
      Dedup.simhashPairs(Multimodal.perceptualHashes(media), maxHamming = 3)
        .orderBy(col("doc_a"), col("doc_b"))
    },
    "q_audio_neardup" -> { (s, dir) =>
      // Perceptual AUDIO near-dup, completing the multimodal dedup story
      // beside q_media_neardup's images: per document a 256-sample 8-bit
      // PCM WAV is written by the JDK's REAL encoder (sample i = byte i of
      // md5(text||chunk) — [[Multimodal.docSamples]]), decoded back through
      // javax.sound, and fingerprinted as a 63-bit amplitude envelope
      // ([[Multimodal.audioHash]]: frame mean vs global mean, 64 frames),
      // then banded with the SAME star-guarded simhash pigeonhole machinery
      // (bucketed joins, nothing quadratic). Every 25th doc also plants a
      // near-copy with frames 0 and 1 SWAPPED — total-sum preserving, so
      // the global mean is unchanged and only bits 0/1 can differ: hamming
      // ≤ 2 by construction — under id+10,000,000. The oracle re-derives
      // the 256 samples from md5 hex, every envelope bit, and EVERY pair
      // independently in SQL — the codec round-trip is graded bit-exact.
      import s.implicits._
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val jobs = docs.select(col("doc_id"), col("text"), lit(0).as("perturb"))
        .unionByName(docs.filter(col("doc_id") % 25 === 0)
          .select((col("doc_id") + 10000000L).as("doc_id"), col("text"),
            lit(1).as("perturb")))
      val media = jobs.as[(Long, String, Int)].map { case (id, text, perturb) =>
        val smp = Multimodal.docSamples(text)
        if (perturb == 1) {
          var k = 0
          while (k < 4) { val t0 = smp(k); smp(k) = smp(4 + k); smp(4 + k) = t0; k += 1 }
        }
        graft.llm.MediaRecord(id, "audio/wav", Multimodal.wavPcm8(smp, 8000))
      }
      Dedup.simhashPairs(Multimodal.audioHashes(media), maxHamming = 3)
        .orderBy(col("doc_a"), col("doc_b"))
    },
    "q_media_probe" -> { (s, dir) =>
      // Header-only container probing beside the image path (payload-lazy
      // for non-image corpora): WAV payloads come from the JDK's REAL
      // javax.sound encoder — the RIFF chunk walker is graded against an
      // independent writer — and MP4 payloads from the box builder (no
      // muxer in-env; the box WALKER is the production parser). Container
      // parameters derive from document columns, so the oracle recomputes
      // every probed value (duration/rate/channels/tracks) arithmetically.
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), length(col("text")).cast("int").as("len"))
      val media = docs.as[(Long, Int)].map { case (id, len) =>
        if (id % 2 == 0) {
          val sr = 8000 + (id % 4).toInt * 4000
          val ch = 1 + ((id / 2) % 2).toInt
          graft.llm.MediaRecord(id, "audio/wav",
            Multimodal.wavPcm(id, sr, ch, (len + 1) * 3))
        } else {
          graft.llm.MediaRecord(id, "video/mp4",
            Multimodal.mp4Stub(1000, (len + 1).toLong * 7, 1 + (id % 3).toInt))
        }
      }
      Multimodal.probe(media).toDF().orderBy(col("doc_id"))
    },
    "q_media_meta" -> { (s, dir) =>
      // Oracle note: the operator is BYTE-oriented (payload length, first
      // payload bytes); the SQL mirror uses length()/ascii() which are
      // character-oriented — equivalent only because the documents fixture
      // is pure ASCII (verified at every sf).
      Multimodal.decode(Multimodal.mediaFromDocuments(s, t(s, dir, "documents")))
        .toDF()
        .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
          col("fingerprint").as("payload_fp"))
        .orderBy(col("doc_id"))
    },
    "q_media_frames" -> { (s, dir) =>
      // frame-sampling batch shape: payload → 16-byte frames, every 2nd
      // kept; counts and byte totals re-derivable from text length (ASCII
      // corpus, same q_media_meta caveat). Zero-byte payloads fan out to
      // zero frames, so both sides exclude empty docs explicitly.
      val media = Multimodal.mediaFromDocuments(s,
        t(s, dir, "documents").filter(length(col("text")) > 0))
      Multimodal.sampleFrames(media, frameBytes = 16, everyNth = 2).toDF()
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sampled"),
          sum(length(col("frame"))).cast("long").as("sampled_bytes"))
        .orderBy(col("doc_id"))
    },
  )

  // ---- oracle SQL ---------------------------------------------------------

  // whitespace class shared verbatim with the Spark side (TF.Ws): Java \s
  // and RE2 \s disagree on \x0B, an explicit class cannot
  private[queries] val W = s"string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+')"

  // SQL mirrors of the TF quality signals — single definitions shared by
  // every oracle that states the quality gate, so the gate cannot drift
  // between oracles when TF.qualityFlag's formula or defaults change
  private val stopListSql = TF.LangMarkers.flatMap(_._2).map(w => s"'$w'").mkString(",")
  private val mtlSql =
    s"CAST(round(CAST(list_sum(list_transform($W, x -> length(x))) AS BIGINT) * 1.0 / len($W) * 1000000) AS BIGINT)"
  private[queries] val ttrSql =
    s"CAST(round(len(list_distinct($W)) * 1.0 / len($W) * 1000000) AS BIGINT)"
  private val stopSql =
    s"CAST(round(len(list_filter($W, x -> x IN ($stopListSql))) * 1.0 / len($W) * 1000000) AS BIGINT)"
  /** WHERE body of TF.qualityFlag with its default thresholds. */
  private[queries] val qualityCond =
    s"""len($W) BETWEEN 10 AND 100000
       |    AND $mtlSql BETWEEN 2000000 AND 12000000
       |    AND $ttrSql >= 100000
       |    AND $stopSql >= 10000""".stripMargin

  /** 3-gram-shingle exact-Jaccard CTE chain over `rel`(doc_id, text):
    * produces `shg` (distinct shingles), `cnt`, and `inter` (pair
    * intersections, doc_a < doc_b) — shared by the minhash-recall oracle
    * and the pipeline oracle so the shingle semantics stay in lockstep. */
  private[queries] def jaccardCtes(rel: String): String =
    s"""dw AS (SELECT doc_id, $W AS w FROM $rel),
       |shg AS (SELECT DISTINCT doc_id, unnest(${shingleListSql(3)}) AS s
       |        FROM dw),
       |cnt AS (SELECT doc_id, count(*) AS n FROM shg GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
       |          FROM shg a JOIN shg b ON a.s = b.s AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)""".stripMargin

  /** DuckDB mirror of `Sampling.bucket`: first four md5 hex nibbles of the
    * stringified key as a 16-bit value (no mod — exactly uniform). */
  private[queries] def bucketSql(keyExpr: String): String = {
    val nib = (i: Int) =>
      s"(strpos('0123456789abcdef', substr(md5(CAST($keyExpr AS VARCHAR)), $i, 1)) - 1)"
    s"(${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 + ${nib(4)})"
  }

  /** DuckDB mirror of `TextFunctions.wordShingles(text, n)` over a token
    * array column `w` (short doc ⇒ one whole-doc shingle, like the Spark
    * side). */
  private[queries] def shingleListSql(n: Int): String =
    s"""CASE WHEN len(w) < $n THEN [array_to_string(w, ' ')]
       |     ELSE [array_to_string(w[i:i+${n - 1}], ' ') for i in range(1, len(w) - ${n - 2})] END""".stripMargin

  /** Per-language marker-score columns (`s_<lang>`) — the langid oracle's
    * scoring stage, shared with every oracle that re-derives the detector. */
  private[queries] def langScoreColsSql: String =
    TF.LangMarkers.map { case (lang, words) =>
      s"len(list_filter($W, x -> x IN (${words.map(w => s"'$w'").mkString(",")}))) AS s_$lang"
    }.mkString(", ")

  /** Mirror of TF.langId over [[langScoreColsSql]]'s columns: highest score
    * wins, earlier language wins ties, zero everywhere ⇒ 'und'. */
  private[queries] def langGuessSql: String = {
    val best = s"greatest(${TF.LangMarkers.map { case (l, _) => s"s_$l" }.mkString(",")})"
    TF.LangMarkers.map { case (l, _) =>
      s"WHEN s_$l = $best AND $best > 0 THEN '$l'"
    }.mkString("CASE ", " ", " ELSE 'und' END")
  }

  /** DuckDB mirror of the 63-bit simhash as a doc_id→simhash CTE body. */
  private def simhashCte: String = {
    val votes = (0 until Dedup.SimHashBits).map { i =>
      s"sum((((strpos('0123456789abcdef', substr(h, ${1 + i / 4}, 1)) - 1) >> ${i % 4}) & 1) * 2 - 1) AS b$i"
    }.mkString(", ")
    val bits = (0 until Dedup.SimHashBits).map { i =>
      s"CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END"
    }.mkString(" + ")
    s"""toks AS (SELECT doc_id, unnest($W) AS tok FROM documents),
       |hb AS (SELECT doc_id, md5(tok) AS h FROM toks),
       |acc AS (SELECT doc_id, $votes FROM hb GROUP BY doc_id),
       |sh AS (SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM acc)""".stripMargin
  }

  override def oracles: Map[String, String] = Map(
    "q_text_stats" ->
      s"""SELECT doc_id,
         | len($W) AS n_tokens,
         | CAST(length(text) AS BIGINT) AS n_chars,
         | len(list_distinct($W)) AS n_distinct,
         | len(list_filter($W, x -> x IN ('the','a','of','and','is','to','in'))) AS n_stop,
         | CAST(round(len(list_distinct($W)) * 1.0 / len($W) * 1000000) AS BIGINT) AS ttr_micro,
         | CAST(round(CAST(list_sum(list_transform($W, x -> length(x))) AS BIGINT) * 1.0 / len($W) * 1000000) AS BIGINT) AS mtl_micro
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_langid" ->
      s"""SELECT doc_id, s_en, s_de, s_fr, s_es, $langGuessSql AS guess
         |FROM (SELECT doc_id, $langScoreColsSql FROM documents) s
         |ORDER BY doc_id""".stripMargin,
    "q_text_quality" -> {
      val punct = "CAST(round((length(trim(text)) - length(regexp_replace(trim(text), '[[:punct:]]', '', 'g'))) * 1.0 / length(trim(text)) * 1000000) AS BIGINT)"
      s"""SELECT doc_id,
         | len($W) AS n_tokens,
         | $mtlSql AS mtl_micro,
         | $ttrSql AS ttr_micro,
         | $stopSql AS stop_micro,
         | $punct AS punct_micro,
         | ($qualityCond) AS quality
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    // classifier score re-derived per token: same md5-nibble bucket, same
    // integer mix to a signed 6-bit weight, instance sum (bias 0)
    "q_text_classifier" -> {
      val weight = s"((${bucketSql("t")} * 2654435761 + 104729) % 64 - 32)"
      s"""SELECT doc_id,
         | CAST(list_sum(list_prepend(CAST(0 AS BIGINT),
         |   list_transform($W, t -> $weight))) AS BIGINT) AS score,
         | len($W) AS n_tokens,
         | CAST(list_sum(list_prepend(CAST(0 AS BIGINT),
         |   list_transform($W, t -> $weight))) AS BIGINT) >= 0 AS keep
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    "q_text_fingerprint" ->
      """SELECT doc_id, md5(lower(trim(text))) AS fp,
        | substr(md5(lower(trim(text))), 1, 8) AS fp8
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_pipeline_clean" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 25),
         |q AS (
         |  SELECT doc_id, text FROM corpus
         |  WHERE $qualityCond),
         |u AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
         |uq AS (SELECT q.doc_id, q.text FROM q JOIN u USING (doc_id)),
         |${jaccardCtes("uq")},
         |dropped AS (SELECT DISTINCT db AS doc_id
         |            FROM inter JOIN cnt ca ON ca.doc_id = da
         |                       JOIN cnt cb ON cb.doc_id = db
         |            WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.9)
         |SELECT doc_id FROM uq
         |WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
         |ORDER BY doc_id""".stripMargin,
    // the full pipeline re-derived stage by stage: quality gate → md5
    // exact-dedup survivors → all-pairs-Jaccard near-dup removal →
    // 8-gram benchmark contamination join → md5-bucket stratified keep →
    // per-shard window-cumsum bin cut — the packed manifest re-built
    // from first principles (the topic round-trip is identity: payload
    // bytes are the document text)
    "q_pipeline_full" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 25
         |  UNION ALL
         |  SELECT doc_id + 2000000, text FROM documents WHERE doc_id < 10),
         |q AS (
         |  SELECT doc_id, text FROM corpus
         |  WHERE $qualityCond),
         |u AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
         |uq AS (SELECT q.doc_id, q.text FROM q JOIN u USING (doc_id)),
         |${jaccardCtes("uq")},
         |dropped AS (SELECT DISTINCT db AS doc_id
         |            FROM inter JOIN cnt ca ON ca.doc_id = da
         |                       JOIN cnt cb ON cb.doc_id = db
         |            WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.9),
         |clean AS (SELECT doc_id, text FROM uq
         |          WHERE doc_id NOT IN (SELECT doc_id FROM dropped)),
         |clw AS (SELECT doc_id, $W AS w FROM clean),
         |csh AS (SELECT DISTINCT doc_id, unnest(${shingleListSql(8)}) AS s FROM clw),
         |bw AS (SELECT $W AS w FROM documents WHERE doc_id < 10),
         |bsh AS (SELECT DISTINCT unnest(${shingleListSql(8)}) AS s FROM bw),
         |contam AS (SELECT DISTINCT c.doc_id FROM csh c JOIN bsh b ON c.s = b.s),
         |decon AS (SELECT doc_id, len(w) AS tokens FROM clw
         |          WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
         |kept AS (SELECT doc_id, tokens FROM decon
         |         WHERE tokens >= 40 OR ${bucketSql("doc_id")} < 13107),
         |p AS (SELECT CAST(doc_id % 4 AS INT) AS shard, doc_id, tokens,
         |  CAST(COALESCE(sum(tokens) OVER (PARTITION BY doc_id % 4 ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
         |  FROM kept)
         |SELECT shard, start_offset // 2048 AS bin, count(*) AS n_docs,
         |  CAST(sum(tokens) AS BIGINT) AS sum_tokens,
         |  min(doc_id) AS min_id, max(doc_id) AS max_id
         |FROM p GROUP BY 1, 2 ORDER BY shard, bin""".stripMargin,
    // 16-byte frames, every 2nd sampled: all sampled frames are full except
    // possibly the last frame (index nf-1), included only when nf-1 is even
    "q_media_frames" ->
      """WITH f AS (SELECT doc_id,
        |   CAST(ceil(length(text) / 16.0) AS BIGINT) AS nf,
        |   CAST(length(text) AS BIGINT) AS len FROM documents
        |   WHERE length(text) > 0)
        |SELECT doc_id, (nf + 1) // 2 AS n_sampled,
        |  CASE WHEN (nf - 1) % 2 = 0
        |       THEN ((nf + 1) // 2 - 1) * 16 + (len - 16 * (nf - 1))
        |       ELSE ((nf + 1) // 2) * 16 END AS sampled_bytes
        |FROM f ORDER BY doc_id""".stripMargin,
    "q_text_bpe" ->
      s"""SELECT doc_id,
         | len(regexp_extract_all(trim(text), '${TF.BpeTokenPattern}')) AS n_bpe,
         | len($W) AS n_ws,
         | list_reduce(
         |   list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(trim(text))+1),
         |     i -> CAST(ord(substr(trim(text), i, 1)) AS BIGINT))),
         |   (a, b) -> (a * 257 + b) % 2147483647) AS roll_fp
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
    // EXACT all-pairs jaccard — independent of the LSH implementation
    "q_dedup_minhash" ->
      s"""WITH ${jaccardCtes("documents")}
         |SELECT da AS doc_a, db AS doc_b,
         |  CAST(round((i * 1.0 / (ca.n + cb.n - i)) * 1000000) AS BIGINT) AS jac_micro
         |FROM inter JOIN cnt ca ON ca.doc_id = da JOIN cnt cb ON cb.doc_id = db
         |WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin,
    // re-derives removal independently: positional shingles → cross-doc
    // df → covered positions → list-comprehension rebuild of the kept text
    "q_dedup_trim_spans" -> {
      def shingleIdx(n: Int) =
        s"""CASE WHEN len(w) < $n THEN [array_to_string(w, ' ')]
           |     ELSE [array_to_string(w[i:i+${n - 1}], ' ') for i in range(1, len(w) - ${n - 2})] END""".stripMargin
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 7000000,
         |    'zq1 zq2 zq3 ' || array_to_string(w[11:40], ' ') || ' zq4 zq5'
         |  FROM (SELECT doc_id, $W AS w FROM documents)
         |  WHERE doc_id < 10 AND len(w) >= 60),
         |dw AS (SELECT doc_id, $W AS w FROM corpus),
         |shp0 AS (SELECT doc_id, len(w) AS m, ${shingleIdx(8)} AS sl FROM dw),
         |shp AS (SELECT doc_id, m, unnest(sl) AS s,
         |               unnest(range(1, len(sl) + 1)) AS i FROM shp0),
         |dfq AS (SELECT s, count(*) AS ndocs
         |        FROM (SELECT DISTINCT doc_id, s FROM shp) GROUP BY s),
         |cov AS (SELECT DISTINCT doc_id, unnest(range(i, least(i + 7, m) + 1)) AS p
         |        FROM shp JOIN dfq USING (s) WHERE ndocs > 1),
         |covl AS (SELECT doc_id, list(p) AS cps FROM cov GROUP BY doc_id)
         |SELECT d.doc_id, len(w) AS n_tokens,
         |  CAST(coalesce(len(cps), 0) AS BIGINT) AS n_removed,
         |  md5(coalesce(array_to_string([w[p] for p in range(1, len(w) + 1)
         |    if NOT list_contains(coalesce(cps, []), p)], ' '), '')) AS trimmed_md5
         |FROM dw d LEFT JOIN covl USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin
    },
    // EXACT all-pairs Jaccard across store ∪ shard, mirroring the drop
    // rule: a shard-2 doc dies iff a ≥0.8 partner exists in the store or
    // at a smaller shard-2 id (store ids < 250 < every shard-2 id, so
    // "db ≥ 250" covers both arms of the pair relation)
    "q_dedup_incremental_near" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 5000000, array_to_string(w[2:len(w)], ' ')
         |  FROM (SELECT doc_id, $W AS w FROM documents)
         |  WHERE doc_id < 10 AND len(w) >= 20),
         |${jaccardCtes("corpus")},
         |dup AS (SELECT da, db, i, ca.n AS na, cb.n AS nb FROM inter
         |        JOIN cnt ca ON ca.doc_id = da JOIN cnt cb ON cb.doc_id = db
         |        WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.8)
         |SELECT doc_id FROM corpus
         |WHERE doc_id >= 250
         |  AND doc_id NOT IN (SELECT db FROM dup WHERE db >= 250)
         |ORDER BY doc_id""".stripMargin,
    "q_text_jaccard" ->
      """WITH docs AS (SELECT doc_id, trim(text) AS t FROM documents),
        |shg AS (SELECT DISTINCT doc_id,
        |         unnest(CASE WHEN length(t) <= 4 THEN [t]
        |                ELSE [substr(t, i, 4) for i in range(1, length(t) - 2)] END) AS s
        |        FROM docs),
        |cnt AS (SELECT doc_id, count(*) AS n FROM shg GROUP BY doc_id),
        |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |          FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1),
        |inter AS (SELECT doc_a, doc_b, count(*) AS i
        |          FROM pairs JOIN shg sa ON sa.doc_id = doc_a
        |                     JOIN shg sb ON sb.doc_id = doc_b AND sa.s = sb.s
        |          GROUP BY 1, 2)
        |SELECT p.doc_a, p.doc_b,
        |  CAST(round((coalesce(i, 0) * 1.0 / (ca.n + cb.n - coalesce(i, 0))) * 1000000) AS BIGINT) AS jac_micro
        |FROM pairs p LEFT JOIN inter USING (doc_a, doc_b)
        |  JOIN cnt ca ON ca.doc_id = p.doc_a JOIN cnt cb ON cb.doc_id = p.doc_b
        |ORDER BY doc_a""".stripMargin,
    // vocab re-derived: same split, same deterministic top-500 tie-break;
    // LEFT JOIN membership mirrors the broadcast join's count(vtok)
    "q_text_vocab_coverage" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($W) AS tok FROM documents),
         |tf AS (SELECT tok, count(*) AS cnt FROM toks WHERE tok <> '' GROUP BY tok),
         |vocab AS (SELECT tok FROM tf ORDER BY cnt DESC, tok LIMIT 500),
         |per AS (
         |  SELECT t.doc_id, count(*) AS n_tokens, count(v.tok) AS n_covered
         |  FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
         |  WHERE t.tok <> ''
         |  GROUP BY t.doc_id)
         |SELECT doc_id, n_tokens, n_covered,
         |  CAST(round((n_tokens - n_covered) * 1.0 / n_tokens * 1000000) AS BIGINT) AS oov_micro
         |FROM per ORDER BY doc_id""".stripMargin,
    // same planted degenerate doc; duplicate-instance fractions re-derived
    // from the shared shingle-list fragment
    "q_text_repetition" -> {
      def ratio(n: Int) =
        s"CAST(round((1.0 - len(list_distinct(${shingleListSql(n)})) * 1.0 / len(${shingleListSql(n)})) * 1000000) AS BIGINT)"
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT 3000000, trim(repeat('buy cheap stuff now ', 40))),
         |dw AS (SELECT doc_id, $W AS w FROM corpus)
         |SELECT doc_id, ${ratio(2)} AS dup2_micro, ${ratio(3)} AS dup3_micro
         |FROM dw ORDER BY doc_id""".stripMargin
    },
    // same planted PII, same RE2 regexes (DuckDB single-quoted strings pass
    // backslashes through verbatim), same redaction order → identical
    // counts and redacted-text fingerprints
    "q_text_redact" ->
      s"""WITH planted AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id < 50
         |         THEN text || ' reach me at user' || CAST(doc_id AS VARCHAR) ||
         |              '@example.com or 555-123-4567' || ' from 10.0.' ||
         |              CAST(doc_id % 256 AS VARCHAR) || '.17'
         |         ELSE text END AS text
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '${TF.EmailRe}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '${TF.Ipv4Re}')) AS BIGINT) AS n_ips,
         |  CAST(len(regexp_extract_all(text, '${TF.PhoneRe}')) AS BIGINT) AS n_phones,
         |  md5(regexp_replace(regexp_replace(regexp_replace(text,
         |    '${TF.EmailRe}', '<EMAIL>', 'g'),
         |    '${TF.Ipv4Re}', '<IP>', 'g'),
         |    '${TF.PhoneRe}', '<PHONE>', 'g')) AS redacted_fp
         |FROM planted ORDER BY doc_id""".stripMargin,
    // the oracle re-runs the same per-shard window cumsum and bin cut
    "q_pack_bins" ->
      s"""WITH d AS (
         |  SELECT doc_id, CAST(doc_id % 4 AS INT) AS shard, len($W) AS tokens
         |  FROM documents),
         |p AS (SELECT shard, tokens,
         |  CAST(COALESCE(sum(tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
         |  FROM d)
         |SELECT shard, start_offset // 2048 AS bin, count(*) AS n_docs,
         |  CAST(sum(tokens) AS BIGINT) AS sum_tokens
         |FROM p GROUP BY 1, 2 ORDER BY shard, bin""".stripMargin,
    // mixture re-derived: per-lang counts, binding total T = min(n/share),
    // per-lang threshold round(share*T/n*65536), same md5-nibble bucket.
    // Constrained to the 5 MAPPED langs throughout: the engine drops
    // groups absent from the shares map (and excludes them from the
    // binding min) — the oracle must mirror that, not assume the fixture
    // happens to contain exactly these languages.
    "q_sample_mixture" ->
      s"""WITH cnt AS (SELECT lang, count(*) AS n_g FROM documents
         |  WHERE lang IN ('en','de','fr','es','zh') GROUP BY lang),
         |tt AS (SELECT min(n_g / 0.2) AS t FROM cnt),
         |thr AS (SELECT lang, CAST(round(0.2 * t / n_g * 65536) AS BIGINT) AS thr
         |        FROM cnt, tt),
         |kept AS (
         |  SELECT d.lang, d.doc_id FROM documents d JOIN thr USING (lang)
         |  WHERE d.lang IN ('en','de','fr','es','zh')
         |    AND ${bucketSql("doc_id")} < thr)
         |SELECT lang, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS sum_ids
         |FROM kept GROUP BY lang ORDER BY lang""".stripMargin,
    // the sample is re-derived exactly: same md5-nibble bucket, same
    // per-stratum thresholds (long=65536/65536, short=round(0.2*65536))
    "q_sample_stratified" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CASE WHEN len($W) >= 40 THEN 'long' ELSE 'short' END AS stratum,
         |    ${bucketSql("doc_id")} AS bucket
         |  FROM documents),
         |kept AS (SELECT * FROM d
         |         WHERE bucket < CASE stratum WHEN 'long' THEN 65536 ELSE 13107 END)
         |SELECT stratum, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS sum_ids
         |FROM kept GROUP BY stratum ORDER BY stratum""".stripMargin,
    // novelty re-derived: distinct 8-grams per corpus doc, overlap vs the
    // reference's distinct 8-gram union, exact integer-ratio rounding
    "q_text_novelty" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id >= 50
         |  UNION ALL
         |  SELECT doc_id + 3000000, text FROM documents WHERE doc_id < 5),
         |cw AS (SELECT doc_id, $W AS w FROM corpus),
         |csh AS (SELECT DISTINCT doc_id, unnest(${shingleListSql(8)}) AS s FROM cw),
         |rw AS (SELECT $W AS w FROM documents WHERE doc_id < 50),
         |rsh AS (SELECT DISTINCT unnest(${shingleListSql(8)}) AS s FROM rw),
         |tot AS (SELECT doc_id, count(*) AS n_total FROM csh GROUP BY 1),
         |hits AS (SELECT c.doc_id, count(*) AS n_hits
         |         FROM csh c JOIN rsh r ON c.s = r.s GROUP BY 1)
         |SELECT t.doc_id, t.n_total,
         |  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
         |  CAST(round((t.n_total - COALESCE(h.n_hits, 0)) * 1.0 / t.n_total
         |    * 1000000) AS BIGINT) AS novelty_micro
         |FROM tot t LEFT JOIN hits h ON t.doc_id = h.doc_id
         |ORDER BY t.doc_id""".stripMargin,
    // independent 8-gram overlap recount against the same benchmark split
    "q_decontaminate" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id >= 10
         |  UNION ALL
         |  SELECT doc_id + 2000000, text FROM documents WHERE doc_id < 10),
         |cw AS (SELECT doc_id, $W AS w FROM corpus),
         |csh AS (SELECT DISTINCT doc_id, unnest(${shingleListSql(8)}) AS s FROM cw),
         |bw AS (SELECT $W AS w FROM documents WHERE doc_id < 10),
         |bsh AS (SELECT DISTINCT unnest(${shingleListSql(8)}) AS s FROM bw),
         |hits AS (SELECT c.doc_id, count(*) AS n_hits
         |         FROM csh c JOIN bsh b ON c.s = b.s GROUP BY 1)
         |SELECT d.doc_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
         |  COALESCE(h.n_hits, 0) >= 1 AS contaminated
         |FROM corpus d LEFT JOIN hits h ON d.doc_id = h.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "q_dedup_simhash" ->
      s"""WITH $simhashCte
         |SELECT doc_id, simhash FROM sh ORDER BY doc_id""".stripMargin,
    "q_dedup_simhash_pairs" ->
      s"""WITH $simhashCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,
    // aHash oracle: gray g[i] = byte i of md5(text||chunk) (4 chunks × 16
    // bytes, hex-parsed); planted copies swap g[1]/g[2] (1-based); bit j
    // set iff g[j+1] > list_sum(g)//64; pairs = all-pairs hamming ≤ 3 —
    // the whole codec+banding path graded against independent arithmetic
    "q_media_neardup" ->
      """WITH base AS (
        |  SELECT doc_id, text, 0 AS perturb FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000000, text, 1 FROM documents WHERE doc_id % 25 = 0
        |), grays AS (
        |  SELECT doc_id, perturb,
        |    flatten(list_transform(range(4), c -> list_transform(range(16), j ->
        |      16 * (strpos('0123456789abcdef', substr(md5(text || CAST(c AS VARCHAR)), 2*j + 1, 1)) - 1)
        |         + (strpos('0123456789abcdef', substr(md5(text || CAST(c AS VARCHAR)), 2*j + 2, 1)) - 1)
        |    ))) AS g0
        |  FROM base
        |), pg AS (
        |  SELECT doc_id,
        |    CASE WHEN perturb = 1
        |         THEN list_concat([g0[2], g0[1]], g0[3:]) ELSE g0 END AS g
        |  FROM grays
        |), sh AS (
        |  SELECT doc_id,
        |    list_sum(list_transform(range(63), j ->
        |      CASE WHEN g[j + 1] > list_sum(g) // 64
        |           THEN 1::BIGINT << j ELSE 0::BIGINT END)) AS hash
        |  FROM pg
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.hash, b.hash)) AS BIGINT) AS hamming
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.hash, b.hash)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,
    // 256 samples from md5 chains; perturbed copies swap frames 0/1
    // (sum-preserving); envelope bit j: frame sum × 64 vs total sum
    "q_audio_neardup" ->
      """WITH base AS (
        |  SELECT doc_id, text, 0 AS perturb FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000000, text, 1 FROM documents WHERE doc_id % 25 = 0
        |), smp AS (
        |  SELECT doc_id, perturb,
        |    flatten(list_transform(range(16), c -> list_transform(range(16), j ->
        |      16 * (strpos('0123456789abcdef', substr(md5(text || CAST(c AS VARCHAR)), 2*j + 1, 1)) - 1)
        |         + (strpos('0123456789abcdef', substr(md5(text || CAST(c AS VARCHAR)), 2*j + 2, 1)) - 1)
        |    ))) AS s0
        |  FROM base
        |), ps AS (
        |  SELECT doc_id,
        |    CASE WHEN perturb = 1
        |         THEN list_concat(s0[5:8], list_concat(s0[1:4], s0[9:])) ELSE s0 END AS s
        |  FROM smp
        |), fp AS (
        |  SELECT doc_id,
        |    list_sum(list_transform(range(63), j ->
        |      CASE WHEN (s[4*j + 1] + s[4*j + 2] + s[4*j + 3] + s[4*j + 4]) * 64 > list_sum(s)
        |           THEN 1::BIGINT << j ELSE 0::BIGINT END)) AS hash
        |  FROM ps
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.hash, b.hash)) AS BIGINT) AS hamming
        |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.hash, b.hash)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q_media_probe" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'mp4' END AS container,
        |  CAST(CASE WHEN doc_id % 2 = 0
        |       THEN ((length(text) + 1) * 3 * 1000) // (8000 + (doc_id % 4) * 4000)
        |       ELSE (length(text) + 1) * 7 END AS BIGINT) AS duration_ms,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 8000 + (doc_id % 4) * 4000 END AS BIGINT) AS sample_rate,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 + ((doc_id // 2) % 2) END AS BIGINT) AS channels,
        |  CAST(CASE WHEN doc_id % 2 = 1 THEN 1 + (doc_id % 3) END AS BIGINT) AS tracks
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_media_meta" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
        | CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS width,
        | CAST(ascii(substr(text, 2, 1)) AS BIGINT) AS height,
        | md5(text) AS payload_fp
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
