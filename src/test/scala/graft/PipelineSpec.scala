package graft

import graft.pipeline.{Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  val dir = "/root/testdata/sf0.001"
  lazy val docs = spark.read.parquet(s"$dir/documents.parquet").cache()
  lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()

  test("IVF scale path: 20k×64 clustered vectors — high recall, no data×data cartesian") {
    // synthetic clustered embeddings (64 clusters, deterministic hash noise):
    // 10× the sf0.1 embeddings table, enough that the bucketed join — not a
    // broadcast — is the plan that runs. Cluster base + small per-vector
    // noise ⇒ true nearest neighbors are in-cluster, so IVF with one
    // centroid per cluster must recover them.
    val n = 20000
    val emb20k = spark.range(n).select(col("id").as("vec_id"),
      expr("""transform(sequence(0, 63), j ->
        cast(pmod(hash((id % 64) * 64 + j), 1000) as double) / 1000.0 - 0.5 +
        cast(pmod(hash(id * 64 + j), 100) as double) / 2000.0)""").as("embedding"))
      .cache()
    emb20k.count()
    val queries = emb20k.filter(col("vec_id") < 15)
    val ivfDf = Similarity.ivfTopK(emb20k, queries, 5, nlist = 64, nprobe = 4)
    // scale guard: only the centroid table may cross-join (broadcast);
    // a data×data cartesian would be the brute-force anti-plan
    val plan = ivfDf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "IVF plan must not cartesian data×data")
    val ivf = ivfDf.select("qid", "nid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = Similarity.bruteForceTopK(emb20k, queries, 5).select("qid", "nid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(recall >= 0.8, s"IVF recall $recall on clustered vectors too low")
    emb20k.unpersist()
  }

  test("MinHash-LSH scale path: 20k docs — planted near-dup pairs found, no cartesian") {
    // synthetic corpus: 60 words from a 5k vocabulary, deterministic per doc;
    // ids < 600 come in consecutive pairs sharing all 60 words plus one
    // unique suffix word each (J = 60/62 ≈ 0.97) — the planted near-dups.
    val n = 20000
    val base = when(col("id") < 600, col("id") - pmod(col("id"), lit(2))).otherwise(col("id"))
    val docs20k = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ",
        concat_ws(" ", transform(sequence(lit(0), lit(59)),
          j => concat(lit("w"), pmod(hash(base * 60 + j), lit(5000))))),
        concat(lit("u"), col("id"))).as("text"))
      .cache()
    docs20k.count()
    val pairsDf = Dedup.minHashLshPairs(docs20k, threshold = 0.8)
    val plan = pairsDf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "LSH pair generation must never fall back to an all-pairs join")
    val got = pairsDf.select("ida", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until 600L by 2).map(i => (i, i + 1)).toSet
    assert(got === expected,
      s"missing=${(expected -- got).take(5)} spurious=${(got -- expected).take(5)}")
    docs20k.unpersist()
  }

  test("PII redaction replaces urls/emails/phones with typed tokens") {
    import spark.implicits._
    val t = Seq("contact a@b.co or https://x.io/page?q=1 call +1 (555) 123-4567 now")
      .toDF("text")
    val out = t.select(TextAnalysis.redactPii(col("text")).as("r")).collect()(0).getString(0)
    assert(out.contains("<EMAIL>") && out.contains("<URL>") && out.contains("<PHONE>"), out)
    assert(!out.contains("a@b.co") && !out.contains("x.io"), out)
  }

  test("exact dedup: survivors = distinct texts") {
    val distinctTexts = docs.select("text").distinct().count()
    assert(Dedup.exact(docs).count() === distinctTexts)
  }

  test("MinHash-LSH pairs equal exact n-gram Jaccard pairs at threshold 0.8") {
    val exact = Dedup.ngramJaccardPairs(docs, 0.8).select("ida", "idb")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minHashLshPairs(docs, 0.8).select("ida", "idb")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "expected planted near-duplicates in fixture")
    assert(lsh === exact)
  }

  test("dedupDocuments removes exactly the non-survivor of each dup cluster") {
    val pairs = Dedup.minHashLshPairs(docs, 0.8).select("ida", "idb")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val survivors = Dedup.dedupDocuments(docs, 0.8)
    // union-find on the pairs to get expected component count
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { val p = parent.getOrElse(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val comps = members.map(find).distinct.length
    assert(survivors.count() === docs.count() - (members.length - comps))
    // survivors contain the min id of each component
    val survivorIds = survivors.select("doc_id").collect().map(_.getLong(0)).toSet
    members.groupBy(find).values.foreach(g => assert(survivorIds.contains(g.min)))
  }

  test("SimHash: near-identical docs have small hamming distance") {
    val exact = Dedup.ngramJaccardPairs(docs, 0.9).select("ida", "idb")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simHashPairs(docs, maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every very-high-jaccard pair should be simhash-close
    val missed = exact -- sim
    assert(missed.size <= exact.size / 5, s"simhash missed too many planted dups: $missed")
  }

  test("cosine: self-similarity is 1, symmetry holds") {
    val c = emb.limit(3).select(col("vec_id"),
      Similarity.cosine(col("embedding"), col("embedding")).as("c")).collect()
    c.foreach(r => assert(math.abs(r.getAs[Double]("c") - 1.0) < 1e-12))
  }

  test("k-means centroids: Lloyd rounds beat the raw seed; hash seeding survives id-sorted corpora") {
    // 8k vectors in 32 planted clusters assigned by HASH of id — a uniform
    // 32-draw seed hits a random multiset of clusters (some get several seed
    // centroids, others none), the misalignment Lloyd rounds recover from by
    // re-centering.
    val n = 8000
    val embH = spark.range(n).select(col("id").as("vec_id"),
      expr("""transform(sequence(0, 31), j ->
        cast(pmod(hash(pmod(hash(id), 32) * 32 + j), 1000) as double) / 1000.0 - 0.5 +
        cast(pmod(hash(id * 32 + j), 100) as double) / 250.0)""").as("embedding"))
      .cache()
    embH.count()
    // queries DISJOINT from likely seed ids: a query that IS an init centroid
    // gets a bucket centered on itself, which flatters the raw-seed baseline
    // and hides exactly the effect this test measures
    val queries = embH.filter(col("vec_id") >= 200 && col("vec_id") < 215)
    val bf = Similarity.bruteForceTopK(embH, queries, 5).select("qid", "nid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(rounds: Int): Double = {
      val ivf = Similarity.ivfTopK(embH, queries, 5, nlist = 32, nprobe = 1,
        kmeansRounds = rounds).select("qid", "nid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (bf intersect ivf).size.toDouble / bf.size
    }
    val (r0, r2) = (recall(0), recall(2))
    assert(r2 > r0, s"k-means recall $r2 must beat seed-init recall $r0")
    assert(r2 >= 0.9, s"k-means recall $r2 too low on clustered vectors")
    embH.unpersist()

    // the id-SORTED corpus (cluster = id div 250): an id-ordered seed would
    // put all 32 seeds inside planted cluster 0 by construction; the
    // md5-sampled seed draws uniformly across ids, so even the RAW seed
    // (rounds=0) buckets most clusters usefully at nprobe=1
    val embR = spark.range(n).select(col("id").as("vec_id"),
      expr("""transform(sequence(0, 31), j ->
        cast(pmod(hash(cast(id div 250 as int) * 32 + j), 1000) as double) / 1000.0 - 0.5 +
        cast(pmod(hash(id * 32 + j), 100) as double) / 250.0)""").as("embedding"))
      .cache()
    embR.count()
    val queriesR = embR.filter(col("vec_id") % 250 === 7) // one query per planted cluster
    val bfR = Similarity.bruteForceTopK(embR, queriesR, 5).select("qid", "nid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallR(rounds: Int): Double = {
      val ivf = Similarity.ivfTopK(embR, queriesR, 5, nlist = 32, nprobe = 1,
        kmeansRounds = rounds).select("qid", "nid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (bfR intersect ivf).size.toDouble / bfR.size
    }
    assert(recallR(0) >= 0.3, s"hash-seeded raw recall ${recallR(0)} collapsed on id-sorted corpus")
    assert(recallR(2) >= 0.6, s"k-means recall ${recallR(2)} too low on id-sorted corpus")
    embR.unpersist()
  }

  test("IVF top-k recall vs brute force >= 0.5 at nprobe=4/nlist=16") {
    val queries = emb.filter(col("vec_id") < 20)
    val bf = Similarity.bruteForceTopK(emb, queries, 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, queries, 5, nlist = 16, nprobe = 4)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(recall >= 0.5, s"IVF recall $recall too low")
  }

  test("LSH signature: close vectors share more bits than far ones") {
    val sig = emb.select(col("vec_id"), Similarity.lshSignature(col("embedding"), 64).as("s"))
    assert(sig.count() === emb.count())
    assert(sig.select("s").distinct().count() > 1)
  }

  test("LshSignature expression matches the per-direction ArrayDot fold bit-for-bit") {
    // the single-pass codegen expression must reproduce the reference
    // formulation (bits separate ArrayDots, summed) EXACTLY — the DuckDB
    // oracle mirrors that formulation's float semantics
    val dirs = Similarity.lshDirections(64, 64, seed = 42L)
    val reference = (0 until 64).map { b =>
      val proj = graft.functions.ArrayDot(col("embedding"),
        array(dirs(b).toIndexedSeq.map(lit): _*))
      when(proj > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce(_ + _)
    val mismatches = emb.select(
      Similarity.lshSignature(col("embedding"), 64, bits = 64).as("fast"),
      reference.as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(mismatches === 0L)
  }

  test("LSH-bucketed cosine pairs ⊆ brute force; decent recall at 0.4") {
    val bf = Similarity.cosinePairs(emb, 0.4).select("ida", "idb")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // cos 0.4 ⇒ per-bit collision ≈ 0.63; 4-bit bands × 16 ⇒ recall ≈ 0.94
    val lsh = Similarity.lshCosinePairs(emb, 0.4, dim = 64, bandBits = 4)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bf.nonEmpty)
    assert((lsh -- bf).isEmpty, "LSH must not invent pairs (verification step)")
    val recall = (lsh intersect bf).size.toDouble / bf.size
    assert(recall >= 0.6, s"recall $recall too low for 4-bit bands")
  }

  test("JL random projection: engine matches full-binary oracle arithmetic on tie-adjacent sums") {
    import spark.implicits._
    // Simulates the DuckDB oracle with FULL-binary doubles feeding every
    // rounding step (new BigDecimal(d) — not the shortest repr Spark rounds),
    // exact decimal sums, the shared fixed-decimal 1/√outDim literal, and
    // HALF_UP (away from zero) at 6 dp ON THE DECIMAL. Any residual
    // shortest-repr-vs-binary sensitivity in the engine pipeline surfaces as
    // a cell mismatch here — this is the divergence class that made the old
    // double-division formulation hash-red (33/8000 cells off by 1 at 6 dp).
    def simulate(rows: Seq[(Long, Seq[Float])], outDim: Int, dim: Int): Map[(Long, Int), Double] = {
      val dirs = Similarity.lshDirections(dim, outDim, 42L)
      val inv = Similarity.invSqrtDecimal(outDim)
      (for ((id, vec) <- rows; j <- 0 until outDim) yield {
        val sum = vec.zipWithIndex.map { case (v, i) =>
          new java.math.BigDecimal(v.toDouble)
            .setScale(6, java.math.RoundingMode.HALF_UP)
            .multiply(java.math.BigDecimal.valueOf(dirs(j)(i).toLong))
        }.foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
        (id, j) -> sum.multiply(inv).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
      }).toMap
    }
    def run(rows: Seq[(Long, Seq[Float])], outDim: Int): Map[(Long, Int), Double] =
      Similarity.randomProject(rows.toDF("vec_id", "embedding"), outDim)
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap

    // EXACT 6-dp midpoints: signs chosen from direction row 0 so the j=0 sum
    // is ±3e-6 and × 1/√4 = ±0.0000015 — both engines must round AWAY from
    // zero (±0.000002); a double-division formulation rounds these by luck
    val dirs4 = Similarity.lshDirections(8, 4, 42L)
    val mid: Seq[(Long, Seq[Float])] = Seq(
      0L -> (Seq(dirs4(0)(0).toFloat * 3e-6f) ++ Seq.fill(7)(0f)),
      1L -> (Seq(-dirs4(0)(0).toFloat * 3e-6f) ++ Seq.fill(7)(0f)))
    val gotMid = run(mid, outDim = 4)
    assert(gotMid((0L, 0)) === 0.000002 && gotMid((1L, 0)) === -0.000002,
      s"midpoint sums must round away from zero, got ${gotMid((0L, 0))} / ${gotMid((1L, 0))}")
    assert(gotMid === simulate(mid, 4, 8))

    // broad sweep: 64 random float vectors, every cell bit-equal to the
    // binary-arithmetic simulation
    val rnd = new scala.util.Random(7)
    val sweep: Seq[(Long, Seq[Float])] =
      (0L until 64L).map(id => id -> Seq.fill(16)((rnd.nextDouble() - 0.5).toFloat))
    assert(run(sweep, outDim = 16) === simulate(sweep, 16, 16))
  }

  test("randomProject/pqEncode fail fast with a clear error on an empty corpus") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](Similarity.randomProject(empty))
    assert(e.getMessage.contains("empty"))
    val e2 = intercept[IllegalArgumentException](Similarity.pqEncode(empty))
    assert(e2.getMessage.contains("empty"))
  }

  test("nearDupAgainst: batch-vs-corpus pairs equal the restricted exact join; no within-side pairs") {
    import spark.implicits._
    // planted: batch docs 0,1 near-dup corpus docs 100,101; corpus has an
    // internal dup pair (102,103) that must NOT appear; 2 is clean
    def doc(words: Seq[String]) = words.mkString(" ")
    val base = (1 to 40).map(i => s"w$i")
    val corpus = Seq(
      100L -> doc(base :+ "ca"), 101L -> doc(base :+ "cb"),
      102L -> doc(base.map(_ + "x") :+ "cc"), 103L -> doc(base.map(_ + "x") :+ "cd"),
      104L -> doc((1 to 40).map(i => s"z$i"))).toDF("doc_id", "text")
    val batch = Seq(
      0L -> doc(base :+ "ba"), 1L -> doc(base :+ "bb"),
      2L -> doc((1 to 40).map(i => s"q$i"))).toDF("doc_id", "text")
    val got = Dedup.nearDupAgainst(corpus, batch, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((0L, 100L), (0L, 101L), (1L, 100L), (1L, 101L)))
    // re-ingest exclusion: identical ids across sides never pair with themselves
    val reIngest = Dedup.nearDupAgainst(corpus, corpus.filter(col("doc_id") === 102), 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reIngest === Set((102L, 103L)))
  }

  test("chunkBySentences: never splits a sentence, chunk rule is the prefix sum") {
    import spark.implicits._
    // sentences of 4/6/10/3/8 tokens; maxTokens=12: chunks by cum_before//12:
    // s0 (0), s1 (4), s2 (10) -> chunk 0; s3 (20->1), s4 (23->1)
    val text = "one two three four. a b c d e f! g h i j k l m n o p? x y z. q r s t u v w8."
    val got = TextAnalysis.chunkBySentences(Seq((1L, text)).toDF("doc_id", "text"), maxTokens = 12)
      .orderBy("chunk_id").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(got === Array(
      (0L, "one two three four. a b c d e f! g h i j k l m n o p?", 3L, 20L),
      (1L, "x y z. q r s t u v w8.", 2L, 10L)))
    // an over-long single sentence still lands whole in its own chunk
    val long = ("w " * 30).trim + "."
    val one = TextAnalysis.chunkBySentences(
      Seq((2L, s"$long tiny one two.")).toDF("doc_id", "text"), maxTokens = 12)
      .orderBy("chunk_id").collect()
    assert(one.length === 2)
    assert(one(0).getString(2) === long && one(0).getLong(4) === 30L)
    assert(one(1).getString(2) === "tiny one two.")
  }

  test("c4Clean applies every line and page rule; null text stays null") {
    import spark.implicits._
    val d = Seq(
      (1L, "good first line here.\nends with bang now!\nquoted line ends \"\nbad line\ntiny."),
      (2L, "uses javascript heavily today.\nfine line number one.\nfine line number two.\nfine line number three."),
      (3L, "some lorem ipsum filler page.\nother fine line here.\nanother fine line here."),
      (4L, "code page { body\nfine line one here.\nfine line two here.\nfine line three here."),
      (5L, "only one good line here.\nnope\nnah"),
      (6L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextAnalysis.c4Clean(d).collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)), r.getBoolean(2))).toMap
    // 1: three lines survive (terminal . ! and "), 'bad line' (no punct) and
    //    'tiny.' (<3 words) drop — page kept
    assert(got(1L) === ((Some("good first line here.\nends with bang now!\nquoted line ends \""), true)))
    // 2: the javascript line drops but three clean lines remain -> kept
    assert(got(2L) === ((Some("fine line number one.\nfine line number two.\nfine line number three."), true)))
    // 3: lorem ipsum anywhere drops the page
    assert(got(3L) === ((None, false)))
    // 4: '{' anywhere drops the page
    assert(got(4L) === ((None, false)))
    // 5: fewer than minLines surviving lines drops the page
    assert(got(5L) === ((None, false)))
    // 6: null input -> null text, not kept
    assert(got(6L) === ((None, false)))
    // minLines is tunable: page 5 survives at minLines = 1
    val loose = TextAnalysis.c4Clean(d, minLines = 1).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(loose(5L) === true)
  }

  test("text analysis: tokens/quality/langid/fingerprint are deterministic & sane") {
    val r = docs.select(
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.qualityScore(col("text")).as("q"),
      TextAnalysis.langId(col("text")).as("l"),
      TextAnalysis.fingerprintMd5(col("text")).as("f"),
      TextAnalysis.rollingFingerprint(col("text")).as("rf"),
      TextAnalysis.subwordCount(col("text")).as("sw")).collect()
    r.foreach { row =>
      assert(row.getAs[Int]("n") >= 10)
      val q = row.getAs[Double]("q"); assert(q >= 0.0 && q <= 1.0)
      assert(Set("en", "de", "fr", "es", "und").contains(row.getAs[String]("l")))
      assert(row.getAs[String]("f").length === 32)
      val rf = row.getAs[Long]("rf"); assert(rf >= 0 && rf < 2147483647L)
      assert(row.getAs[Int]("sw") >= row.getAs[Int]("n"))
    }
  }

  test("rolling fingerprint is shift-sensitive but deterministic") {
    import spark.implicits._
    val df = Seq("alpha beta gamma", "alpha beta gamma", "beta alpha gamma").toDF("text")
    val fps = df.select(TextAnalysis.rollingFingerprint(col("text"))).as[Long].collect()
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("ArrayDot: bit-equal to the higher-order fold; null on length mismatch") {
    import graft.functions.ArrayDot
    val native = emb.select(col("vec_id"), ArrayDot(col("embedding"), col("embedding")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fold = emb.select(col("vec_id"),
      aggregate(zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (a, x) => a + x).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(native === fold, "codegen dot must reproduce the interpreted fold bit-for-bit")
    import spark.implicits._
    val mismatch = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
      .select(ArrayDot(col("a"), col("b")).as("d")).collect()(0)
    assert(mismatch.isNullAt(0), "length mismatch must yield null (zip_with padding semantics)")
    // participates in whole-stage codegen (the "*(n)" star in the plan):
    // the projection containing array_dot must sit inside a codegen stage
    val plan = emb.select(ArrayDot(col("embedding"), col("embedding"))).queryExecution.executedPlan
    val codegenned = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w.toString
    }
    assert(codegenned.exists(_.contains("array_dot")),
      s"array_dot must run inside a WholeStageCodegen stage:\n$plan")
  }

  test("repetition signals: planted duplicate lines and repeated bigrams detected") {
    import spark.implicits._
    val d = Seq(
      (1L, "x y\nx y\nz w"),          // 3 lines, one duplicated
      (2L, "a b a b a b c"),          // dominant bigram "a b"
      (3L, "q")                       // single token: no bigrams at all
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(math.abs(out(1L).getDouble(1) - 1.0 / 3) < 1e-12)  // dup_line_frac
    // surplus duplicate chars: "x y" (3 chars) counted twice, once surplus; 9 line chars total
    assert(math.abs(out(1L).getDouble(2) - 3.0 / 9) < 1e-12)
    // doc 2: "a b" occurs 3× → 9 chars of 13
    assert(math.abs(out(2L).getDouble(3) - 9.0 / 13) < 1e-12)
    assert(out(3L).getDouble(3) === 0.0 && out(3L).getDouble(4) === 0.0)
  }

  test("contamination: docs sharing an 8-gram with the eval set are flagged") {
    import spark.implicits._
    val words = (1 to 12).map(i => s"w$i").mkString(" ")
    val evalSet = Seq((100L, words)).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, words),                                     // full overlap
      (2L, (1 to 7).map(i => s"w$i").mkString(" ")),   // < 8 words: no shingles
      (3L, "entirely different words " * 3)            // no overlap
    ).toDF("doc_id", "text")
    val out = Dedup.contamination(corpus, evalSet, n = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 12 words → 5 distinct 8-grams, all shared
    assert(out === Map(1L -> 5L))
  }

  test("mixture sampling: deterministic, per-source rates, stable across reruns") {
    val rates = Map("src0" -> 1.0, "src1" -> 0.5, "src5" -> 0.0)
    val s1 = TextAnalysis.mixtureSample(docs, rates).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val s2 = TextAnalysis.mixtureSample(docs, rates).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(s1 === s2, "resampling must be bit-stable")
    val bySource = TextAnalysis.mixtureSample(docs, rates)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.filter(col("source") === "src0").count()
    assert(bySource("src0") === total)            // rate 1.0 keeps everything
    assert(!bySource.contains("src5"))            // rate 0.0 drops everything
    assert(bySource.getOrElse("src1", 0L) < total) // rate 0.5 subsamples
    // unlisted sources default to rate 0
    assert(bySource.keySet.subsetOf(Set("src0", "src1")))
  }

  test("chunking: windows cover the doc once, overlap respected, no redundant tail") {
    import spark.implicits._
    val d = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")),  // 10 tokens
                (2L, "a b c")).toDF("doc_id", "text")            // fits one chunk
    val out = TextAnalysis.chunkDocuments(d, maxTokens = 8, overlap = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getLong(3))).toMap
    // stride 4: chunk 0 = tokens 1-8, chunk 1 = tokens 5-10 (reaches end, last)
    assert(out((1L, 0L)) === ((1 to 8).map(i => s"t$i").mkString(" "), 8L))
    assert(out((1L, 1L)) === ((5 to 10).map(i => s"t$i").mkString(" "), 6L))
    assert(!out.contains((1L, 2L)), "no fully-redundant trailing window")
    assert(out((2L, 0L)) === (("a b c", 3L)))
    // every token of doc 1 appears in some chunk
    val covered = out.collect { case ((1L, _), (t, _)) => t.split(" ") }.flatten.toSet
    assert(covered === (1 to 10).map(i => s"t$i").toSet)
  }

  test("token document frequency: df counts docs not occurrences, top-k deterministic") {
    import spark.implicits._
    val d = Seq((1L, "x x x y"), (2L, "x z"), (3L, "z z y")).toDF("doc_id", "text")
    val out = TextAnalysis.tokenDocFrequency(d, 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toList
    // x: 2 docs, y: 2, z: 2 — ties broken by token ascending
    assert(out === List(("x", 2L), ("y", 2L), ("z", 2L)))
  }

  test("PlanCache: repeated key reuses the frame; eviction and clear unpersist") {
    import spark.implicits._
    val base = Seq((1L, "a")).toDF("id", "v")
    val k = graft.core.PlanCache.key("test-op", base, 7)
    val a = graft.core.PlanCache.cached(spark, k)(base.select(col("id")))
    val b = graft.core.PlanCache.cached(spark, k)(base.select(col("id")))
    assert(a eq b, "same key must return the registered frame")
    assert(a.storageLevel.useMemory, "registered frame must be persisted")
    // semantically identical input built twice yields the same key
    val k2 = graft.core.PlanCache.key("test-op", Seq((1L, "a")).toDF("id", "v"), 7)
    assert(k === k2)
    graft.core.PlanCache.clear(spark)
    assert(!a.storageLevel.useMemory && !a.storageLevel.useDisk,
      "clear must unpersist registered frames")
  }

  test("unigramLogProb: common-token docs outscore rare-token docs") {
    import spark.implicits._
    val d = Seq(
      (1L, "the the the the"),          // corpus-dominant token
      (2L, "zzz qqq xyzzy plugh"),      // singletons
      (3L, "the the zzz the")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProb(d).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) > got(3L) && got(3L) > got(2L))
  }

  test("packSequences: greedy contiguous fill by preceding cumulative tokens") {
    import spark.implicits._
    // 3 docs x 3 tokens in one source, capacity 4:
    // prev cumsum 0,3,6 -> bins 0,0,1
    val d = Seq(
      (1L, "a b c", "s"), (2L, "d e f", "s"), (3L, "g h i", "s"),
      (4L, "x y", "t")                      // other source packs independently
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.packSequences(d, capacityTokens = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L))
  }

  test("dupSpanFraction: shared spans counted, unique docs score 0") {
    import spark.implicits._
    val shared = (1 to 10).map(i => s"w$i").mkString(" ") // 10 tokens = 3 8-grams
    val d = Seq(
      (1L, shared), (2L, shared),                       // all spans shared
      (3L, (11 to 20).map(i => s"u$i").mkString(" "))   // all spans unique
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpanFraction(d, n = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList.sortBy(_._1)
    assert(got === List((1L, 3L, 1.0), (2L, 3L, 1.0), (3L, 3L, 0.0)))
  }

  test("removeDupSpans cuts covered positions, keeps the rest in order") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d e f"),    // grams "a b c","b c d" shared with doc 2
      (2L, "x y a b c d z"),  // covered positions 2..5 -> "x y z" survives
      (3L, "p q"),            // shorter than n: no spans, untouched
      (4L, "m n o"), (5L, "m n o") // fully duplicated -> empty, not dropped
    ).toDF("doc_id", "text")
    val got = Dedup.removeDupSpans(d, n = 3).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "e f", 2L -> "x y z", 3L -> "p q", 4L -> "", 5L -> ""))
  }

  test("frequencySpectrum: frequency-of-frequencies partitions the vocab") {
    import spark.implicits._
    // a×3, b×2, c×1, d×1 -> freq 3:1 type, freq 2:1, freq 1:2
    val d = Seq((1L, "a b a c"), (2L, "a b d")).toDF("doc_id", "text")
    val got = TextAnalysis.frequencySpectrum(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(3L -> 1L, 2L -> 1L, 1L -> 2L))
  }

  test("joinKeyAudit: orphans and dup keys counted exactly, both sides") {
    import spark.implicits._
    val l = Seq((1L, "x"), (1L, "y"), (2L, "z"), (9L, "o")).toDF("k", "pay")
    val r = Seq((1L, "a"), (3L, "b")).toDF("k", "pay")
    val row = TextAnalysis.joinKeyAudit(l, "k", r, "k").collect()(0)
    val m = row.getValuesMap[Long](Seq("n_left", "left_keys", "left_dup_keys",
      "n_right", "right_keys", "right_dup_keys", "left_orphans", "right_orphans"))
    // left orphan ROWS: keys 2 and 9, one row each; right orphan: key 3
    assert(m === Map("n_left" -> 4L, "left_keys" -> 3L, "left_dup_keys" -> 1L,
      "n_right" -> 2L, "right_keys" -> 2L, "right_dup_keys" -> 0L,
      "left_orphans" -> 2L, "right_orphans" -> 1L))
  }

  test("fertility: subwords per word, punctuation splits raise it") {
    import spark.implicits._
    val d = Seq((1L, "en", "plain words here"),        // 3 words, 3 subwords
      (2L, "xx", "hy-phen a.b")).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.fertility(d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("en") === ((3L, 3L, 1000000L)))
    // "hy-phen" -> hy,-,phen; "a.b" -> a,.,b : 2 words, 6 subwords
    assert(got("xx") === ((2L, 6L, 3000000L)))
  }

  test("containmentPairs: full quote scores 1.0 where Jaccard stays low") {
    import spark.implicits._
    val small = (1 to 5).map(i => s"q$i").mkString(" ")          // 3 shingles
    val big = (small +: (6 to 40).map(i => s"w$i")).mkString(" ") // quotes small
    val d = Seq((1L, small), (2L, big), (3L, "z1 z2 z3 z4"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(d, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(5)).toMap
    assert(got === Map((1L, 2L) -> 1.0)) // contained; unrelated doc 3 absent
    // and the Jaccard join at the same bar misses it
    assert(Dedup.ngramJaccardPairs(d, threshold = 0.5).isEmpty)
  }

  test("filterReport: per-rule failure counts partition against n_pass") {
    import spark.implicits._
    val good = ((1 to 33).map(i => s"word$i") ++ Seq("the", "a")).mkString(" ")
    val d = Seq((1L, "s1", good), (2L, "s1", "x"), (3L, "s2", good))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.filterReport(d, minWords = 30).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(6), r.getLong(7)))).toMap
    // "x": fails word count, mean len (1 < 3), stopwords; s2 all-pass
    assert(got("s1") === ((2L, 1L, 1L, 1L, 1L)))
    assert(got("s2") === ((1L, 0L, 0L, 0L, 1L)))
  }

  test("survivorMap: one loser row per dropped dup, survivor = cluster min") {
    import spark.implicits._
    val t = (1 to 10).map(i => s"w$i").mkString(" ")
    val d = Seq((5L, t), (2L, t), (9L, t),              // one cluster, min 2
      (7L, (20 to 30).map(i => s"u$i").mkString(" ")))  // unpaired: no row
      .toDF("doc_id", "text")
    val got = Dedup.survivorMap(d, threshold = 0.8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(5L -> 2L, 9L -> 2L))
  }

  test("embeddingDimStats: exact moments per dimension; zero-variance std 0") {
    import spark.implicits._
    val d = Seq((1L, Seq(1.0f, 5.0f)), (2L, Seq(3.0f, 5.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.embeddingDimStats(d).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(got(0) === ((2L, 1.0, 3.0, 2.0, 1.0)))
    assert(got(1) === ((2L, 5.0, 5.0, 5.0, 0.0)))
  }

  test("winsorize: clamps to per-group interpolated quantile bounds") {
    import spark.implicits._
    // group a: values 0..10; p05 = 0.5, p95 = 9.5 -> 0 clips up, 10 down
    val rows = (0 to 10).map(i => (i.toLong, "a", i.toDouble)) :+ ((99L, "b", 7.0))
    val df = rows.toDF("event_id", "event_type", "value")
    val got = TextAnalysis.winsorize(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(0L) === 0.5 && got(10L) === 9.5 && got(5L) === 5.0)
    assert(got(99L) === 7.0) // single-value group: bounds collapse onto it
  }

  test("mutualInformation: zero iff independent, H(X) when determined") {
    import spark.implicits._
    // independent 2x2 uniform: MI = 0
    val ind = Seq(("a","x"),("a","y"),("b","x"),("b","y")).toDF("u","v")
    val mi0 = TextAnalysis.mutualInformation(ind, "u", "v").collect()(0)
    assert(mi0.getLong(0) === 4L && mi0.getDouble(1) === 0.0)
    // v fully determined by u, uniform over 2: MI = H = ln 2
    val dep = Seq(("a","x"),("a","x"),("b","y"),("b","y")).toDF("u","v")
    val mi1 = TextAnalysis.mutualInformation(dep, "u", "v").collect()(0)
    assert(math.abs(mi1.getDouble(1) - math.log(2.0)) < 1e-6)
    // NULLs excluded pairwise-complete
    val withNull = Seq(("a","x"),("a",null),(null,"y"),("b","y")).toDF("u","v")
    assert(TextAnalysis.mutualInformation(withNull, "u", "v")
      .collect()(0).getLong(0) === 2L)
  }

  test("removeDupLines: first (doc,pos) occurrence survives, rest cut") {
    import spark.implicits._
    val d = Seq(
      (1L, "keep me\nshared line\nalso mine"),  // first holder of "shared line"
      (2L, "shared line\nunique two"),          // later holder -> line cut
      (3L, "shared line"),                      // whole doc duplicated -> ''
      (4L, "x\n\ny"),                           // blank line < minChars: kept
      (5L, null.asInstanceOf[String])           // NULL stays NULL
    ).toDF("doc_id", "text")
    val got = Dedup.removeDupLines(d).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got === Map(
      1L -> Some("keep me\nshared line\nalso mine"),
      2L -> Some("unique two"),
      3L -> Some(""),
      4L -> Some("x\n\ny"),
      5L -> None))
    // intra-doc repeats of a line are also global dups: only the first stays
    val rep = Seq((7L, "a\nb\na\nc")).toDF("doc_id", "text")
    val got2 = Dedup.removeDupLines(rep).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got2 === Map(7L -> "a\nb\nc"))
  }

  test("span removal preserves NULL text; '' only for fully-removed docs") {
    import spark.implicits._
    val d = Seq((1L, "m n o"), (2L, "m n o"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    // NULL input stays NULL (same contract as truncateTokens); the
    // fully-duplicated docs come back as '' — present, empty, not null
    assert(asMap(Dedup.removeDupSpans(d, n = 3)) ===
      Map(1L -> Some(""), 2L -> Some(""), 3L -> None))
    assert(asMap(Dedup.removeRepeatedSpans(d.filter(col("doc_id") =!= 2), n = 3)) ===
      Map(1L -> Some("m n o"), 3L -> None))
  }

  test("dedupStats emits no zero-count bucket when every document is paired") {
    import spark.implicits._
    // two identical docs — one cluster of size 2, NO size-1 singles row
    val d = Seq((1L, "w1 w2 w3 w4 w5 w6"), (2L, "w1 w2 w3 w4 w5 w6")).toDF("doc_id", "text")
    val rows = Dedup.dedupStats(d, threshold = 0.8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows === Map(2L -> 1L), s"unexpected histogram: $rows")
  }

  test("pqEncode: one in-range code per subspace, every vector, deterministic") {
    val codes = Similarity.pqEncode(emb, m = 2, k = 8, rounds = 2).cache()
    assert(codes.count() === emb.count())
    assert(codes.columns.toSeq === Seq("vec_id", "code0", "code1"))
    val mins = codes.agg(min("code0"), max("code0"), min("code1"), max("code1")).head
    assert(mins.getInt(0) >= 0 && mins.getInt(1) < 8)
    assert(mins.getInt(2) >= 0 && mins.getInt(3) < 8)
    // deterministic: a second full train+encode reproduces every code
    val again = Similarity.pqEncode(emb, m = 2, k = 8, rounds = 2)
    assert(codes.exceptAll(again).isEmpty && again.exceptAll(codes).isEmpty)
    codes.unpersist()
  }

  test("pqTopK: shape on the real corpus; cluster recovery on planted data") {
    import spark.implicits._
    val q = emb.filter($"vec_id" < 10)
    val pq = Similarity.pqTopK(emb, q, k = 5).cache()
    assert(pq.count() === 50) // 10 queries x 5
    assert(pq.groupBy("qid").agg(countDistinct("rank").as("r")).collect()
      .forall(_.getLong(1) === 5))
    pq.unpersist()
    // ADC is a quantizer: it ranks at codebook-cell resolution, so the right
    // quality bar is CLUSTER recovery, not exact top-5 (the real sf0.001
    // embeddings are unclustered — even brute-force top-5 shares a label only
    // 4% of the time, so no recall bar is meaningful there). Planted corpus:
    // 8 tight clusters (id % 8), every 8-dim subspace carries the cluster
    // signal, so per-subspace codebooks must align and ADC's top-5 must come
    // from the query's own cluster.
    val n = 2000
    val planted = spark.range(n).select(col("id").as("vec_id"),
      expr("""transform(sequence(0, 31), j ->
        cast(pmod(hash((id % 8) * 32 + j), 1000) as double) / 1000.0 - 0.5 +
        cast(pmod(hash(id * 32 + j), 100) as double) / 2000.0)""").as("embedding"))
      .cache()
    planted.count()
    val pqueries = planted.filter(col("vec_id") >= 100 && col("vec_id") < 110)
    val top = Similarity.pqTopK(planted, pqueries, k = 5, m = 4, codes = 8)
    val sameCluster = top.select($"qid", $"nid").collect()
      .count(r => r.getLong(0) % 8 == r.getLong(1) % 8)
    assert(sameCluster >= 45, s"ADC same-cluster hits $sameCluster/50") // >= 90%
    planted.unpersist()
  }

  test("ivfPqTopK: no data-by-data cartesian; full rank shape") {
    val q = emb.filter(col("vec_id") < 10)
    val df = Similarity.ivfPqTopK(emb, q, k = 5)
    // centroid/LUT cross joins are broadcast nlist- and k-row frames; the
    // corpus must reach the query side only through the bucket equi-join
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "IVF-PQ must not cartesian data frames")
    val rows = df.collect()
    assert(rows.length === 50 && rows.map(_.getInt(2)).forall(r => r >= 1 && r <= 5))
  }

  test("pqDecode: reconstruction approximates originals on clustered data") {
    val n = 2000
    val planted = spark.range(n).select(col("id").as("vec_id"),
      expr("""transform(sequence(0, 31), j ->
        cast(pmod(hash((id % 8) * 32 + j), 1000) as double) / 1000.0 - 0.5 +
        cast(pmod(hash(id * 32 + j), 100) as double) / 2000.0)""").as("embedding"))
      .cache()
    planted.count()
    val recon = Similarity.pqDecode(planted, m = 4, codes = 8)
    val joined = recon.withColumnRenamed("embedding", "r")
      .join(planted, Seq("vec_id"))
      .select(Similarity.cosine(col("embedding"), col("r")).as("c"))
    // per-cluster codewords ≈ cluster centers; tight noise ⇒ high fidelity
    // in aggregate, with a bounded tail (a cell straddling cluster boundary
    // reconstructs its stragglers a little off-center — deterministic)
    val st = joined.agg(min(col("c")).as("mn"), avg(col("c")).as("av")).head
    assert(st.getDouble(1) >= 0.9, s"mean reconstruction cosine ${st.getDouble(1)}")
    assert(st.getDouble(0) >= 0.8, s"reconstruction cosine floor ${st.getDouble(0)}")
    assert(recon.count() === n)
    planted.unpersist()
  }

  test("removeDupSpans scale path: 20k docs, planted shared spans, no cartesian") {
    // each doc: 40 unique words (id-derived) + docs 0..599 share one planted
    // 8-word span pairwise (consecutive pairs) appended at the end. The
    // removal must cut exactly the planted span from sharers and nothing
    // from the rest.
    val n = 20000
    val planted = when(col("id") < 600, col("id") - pmod(col("id"), lit(2)))
    val uniq = transform(sequence(lit(0), lit(39)), j => concat(lit("u"), col("id") * 40 + j))
    val span = transform(sequence(lit(0), lit(7)), j => concat(lit("s"), planted * 8 + j))
    val docs20k = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", when(col("id") < 600, concat(uniq, span)).otherwise(uniq)).as("text"))
      .cache()
    docs20k.count()
    val outDf = Dedup.removeDupSpans(docs20k, n = 8)
    val plan = outDf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "span removal must stay equi-join only")
    val out = outDf.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // sharers lose exactly the 8-token span; everyone keeps their 40 uniques
    assert((0L until 600L).forall(i => out(i).split(" ").length === 40),
      "sharers must lose exactly the planted span")
    assert((600L until 620L).forall(i => out(i).split(" ").length === 40),
      "non-sharers must be untouched")
    assert(out(0L).split(" ").forall(_.startsWith("u")))
    docs20k.unpersist()
  }

  test("removeDupSpans/removeRepeatedSpans invariants (ScalaCheck)") {
    import org.scalacheck.Gen
    import spark.implicits._
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")
    val doc = Gen.chooseNum(1, 12).flatMap(k => Gen.listOfN(k, word)).map(_.mkString(" "))
    val docsGen = Gen.chooseNum(2, 6).flatMap(k => Gen.listOfN(k, doc))
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15),
      org.scalacheck.Prop.forAll(docsGen) { texts =>
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        val dup = Dedup.removeDupSpans(df, n = 3).collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        val rep = Dedup.removeRepeatedSpans(df, n = 3).collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        texts.zipWithIndex.forall { case (t, i) =>
          val toks = t.split(" ").toSeq
          def isSubseqInOrder(out: String): Boolean = {
            val o = if (out.isEmpty) Seq.empty else out.split(" ").toSeq
            var j = 0
            o.forall { w => val k = toks.indexOf(w, j); if (k < 0) false else { j = k + 1; true } }
          }
          val short = toks.length < 3
          isSubseqInOrder(dup(i.toLong)) && isSubseqInOrder(rep(i.toLong)) &&
            (!short || (dup(i.toLong) == t && rep(i.toLong) == t))
        }
      })
    assert(res.passed, s"property failed: $res")
  }

  test("removeRepeatedSpans: later in-doc occurrences cut, first survives") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c x a b c y"), // "a b c" repeats at 4: cut 4..6, keep 0..2 + y
      (2L, "p q r s"),         // no repetition: untouched
      (3L, "a a a a")          // n=2 self-overlap collapses greedily to "a"
    ).toDF("doc_id", "text")
    val g3 = Dedup.removeRepeatedSpans(d, n = 3).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(g3(1L) === "a b c x y")
    assert(g3(2L) === "p q r s")
    val g2 = Dedup.removeRepeatedSpans(d.filter($"doc_id" === 3L), n = 2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(g2(3L) === "a")
  }

  test("PlanCache: cycling session clones keeps the session-map count bounded") {
    import spark.implicits._
    val base = Seq((1L, "a")).toDF("id", "v")
    (1 to 100).foreach { i =>
      val clone = spark.newSession()
      val k = graft.core.PlanCache.key("clone-op", base, i)
      graft.core.PlanCache.cached(clone, k)(base.select(col("id")))
    }
    assert(graft.core.PlanCache.sessionCount <= 8,
      s"expected bounded session maps, got ${graft.core.PlanCache.sessionCount}")
  }

  test("multimodal: synthesize → repartition → stub decode plumbing") {
    val media = Multimodal.synthesizeMedia(docs.limit(50))
    assert(media.schema("media").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    val sized = Multimodal.repartitionByBytes(media, totalBytes = 1 << 20, targetBytes = 256 << 10)
    val feats = Multimodal.decodeStub(sized)
    assert(feats.schema === Multimodal.featureSchema)
    val rows = feats.collect()
    assert(rows.length === 50)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bytes") > 0)
      assert(r.getAs[Seq[Float]]("feature").length === 8)
    }
    // determinism across two runs
    val again = Multimodal.decodeStub(sized).collect()
    assert(rows.map(_.getLong(2)).sorted.toSeq === again.map(_.getLong(2)).sorted.toSeq)
  }

  test("survivorsByPairs matches a driver-side union-find on random pair graphs") {
    import spark.implicits._
    // deterministic pseudo-random pair graphs (no Random: fixed seeds via hash)
    for (seed <- 1 to 3) {
      val n = 60
      val ids = (0L until n).toSeq
      val pairs = (for {
        i <- 0 until n; j <- (i + 1) until n
        if math.abs((i * 2654435761L + j * 40503L + seed * 97L) % 23) == 0
      } yield (i.toLong, j.toLong)).toSeq
      // reference: driver-side union-find
      val parent = scala.collection.mutable.ArrayBuffer.range(0, n)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = ids.filter(i => find(i.toInt) == i.toInt).toSet
      val data = ids.toDF("vec_id")
      val pairsDf = pairs.toDF("ida", "idb")
      val got = graft.pipeline.Dedup.survivorsByPairs(data, pairsDf, "vec_id")
        .collect().map(_.getLong(0)).toSet
      assert(got === expect, s"seed=$seed pairs=${pairs.size}")
    }
  }

  test("semanticDedup: drops within-cluster near-dups, keeps min id and singletons") {
    import spark.implicits._
    // two tight duplicate groups along different axes + two isolated vectors;
    // nlist=2 → the md5-sampled seeds are ids 11 (x-axis) and 20 (y-axis),
    // so each planted duplicate group co-clusters with its seed (a larger
    // nlist here would make BOTH members of a dup pair their own centroid
    // and legitimately never pair them — cluster-confined search semantics)
    def v(x: Double, y: Double, z: Double) = Seq(x, y, z).map(_.toFloat)
    val data = Seq(
      (0L, v(1, 0, 0)), (1L, v(0, 1, 0)), (2L, v(0, 0, 1)), (3L, v(1, 1, 1)),
      (10L, v(0.99, 0.01, 0)), (11L, v(0.98, 0.02, 0)),   // dups of 0
      (20L, v(0.01, 0.99, 0))                             // dup of 1
    ).toDF("vec_id", "embedding")
    val kept = graft.pipeline.Similarity.semanticDedup(data, threshold = 0.95, nlist = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // components: {0,10,11} → keep 0; {1,20} → keep 1; 2, 3 isolated
    assert(kept === Set(0L, 1L, 2L, 3L))
  }

  test("bm25TopK: term-frequency saturation and length normalization rank as expected") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "spark shuffle join"),                      // one hit, short doc
      (2L, "join join join join"),                     // saturating tf
      (3L, "filter scan filter scan filter scan"),     // no query terms
      (4L, "join shuffle " + ("pad " * 40).trim)       // hits diluted by length
    ).toDF("doc_id", "text")
    val top = TextAnalysis.bm25TopK(corpus, Seq("join", "shuffle"), k = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // doc 3 has no query term → excluded entirely
    assert(!top.map(_._1).contains(3L))
    assert(top.length === 3)
    // doc 1 (both terms, short) must beat doc 4 (both terms, long — length
    // normalization) and doc 2 (one term saturated)
    assert(top.head._1 === 1L)
    // scores strictly positive and sorted descending
    assert(top.forall(_._2 > 0))
    assert(top.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("lengthQuantiles: exact interpolated quartiles on a known distribution") {
    import spark.implicits._
    // group a: lengths 1,2,3,4 tokens → p25=1.75, p50=2.5, p75=3.25
    val d = Seq(
      ("a", "x"), ("a", "x x"), ("a", "x x x"), ("a", "x x x x"),
      ("b", "y y")
    ).toDF("source", "text")
    val q = TextAnalysis.lengthQuantiles(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(q("a") === ((4L, 1.75, 2.5, 3.25)))
    assert(q("b") === ((1L, 2.0, 2.0, 2.0)))
  }

  test("domainQuota keeps at most n best-first docs per source, deterministically") {
    import org.apache.spark.sql.functions._
    val out = TextAnalysis.domainQuota(docs, n = 10)
    val perSource = out.groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSource.values.forall(_ <= 10))
    // best-first: the kept docs are exactly the top-10 by (n_chars desc, id)
    val src = perSource.keys.head
    val want = docs.filter(col("source") === src)
      .orderBy(col("n_chars").desc, col("doc_id"))
      .limit(10).select("doc_id").collect().map(_.getLong(0)).toSet
    val got = out.filter(col("source") === src)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === want)
    // deterministic across evaluations
    val again = TextAnalysis.domainQuota(docs, n = 10)
      .filter(col("source") === src).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === got)
  }

  test("l2Normalize: unit norm for all embeddings; zero vector unchanged") {
    import org.apache.spark.sql.functions._
    val norms = emb.select(
      Similarity.norm(Similarity.l2Normalize(col("embedding"))).as("n")).collect()
    assert(norms.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-9))
    val z = spark.range(1).select(array(lit(0.0f), lit(0.0f)).as("v"))
    assert(z.select(Similarity.norm(Similarity.l2Normalize(col("v")))).collect()(0).getDouble(0) === 0.0)
  }

  test("topBigrams: adjacent pairs counted, ties broken by bigram text") {
    import spark.implicits._
    val d = Seq("a b a b", "b a").toDF("text")
    val got = TextAnalysis.topBigrams(d, k = 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    // "a b a b" → [a b, b a, a b]; "b a" → [b a] ⇒ both bigrams ×2, tie → text asc
    assert(got === Seq("a b" -> 2L, "b a" -> 2L))
  }

  test("vocabStats: exact token/distinct counts and type-token ratio") {
    import spark.implicits._
    val d = Seq(("x", "a a b"), ("y", "c")).toDF("source", "text")
    val got = TextAnalysis.vocabStats(d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("x") === ((3L, 2L, 0.666667)))
    assert(got("y") === ((1L, 1L, 1.0)))
  }

  test("quantizeInt8: codes bounded, dequantization within half a step") {
    import org.apache.spark.sql.functions._
    val q = emb.select(col("embedding").as("v"),
      Similarity.quantizeInt8(col("embedding")).as("q"))
    val checked = q.select(
      aggregate(transform(col("q.codes"), c => abs(c)), lit(0), (a, c) => greatest(a, c)).as("maxc"),
      aggregate(
        zip_with(col("v"), col("q.codes"), (x, c) =>
          abs(x - c * col("q.scale") / 127.0)),
        lit(0.0d), (a, e) => greatest(a, e)).as("maxerr"),
      col("q.scale").as("s")).collect()
    assert(checked.forall(_.getInt(0) <= 127))
    assert(checked.forall(r => r.getDouble(1) <= r.getDouble(2) / 254.0 * 1.0001))
    // zero vector: scale 0, all-zero codes
    val z = spark.range(1).select(array(lit(0.0f), lit(0.0f)).as("v"))
      .select(Similarity.quantizeInt8(col("v")).as("q")).collect()(0)
    assert(z.getStruct(0).getDouble(0) === 0.0)
    assert(z.getStruct(0).getSeq[Int](1).forall(_ === 0))
  }

  test("meanPool: centroid rows match a hand-computed group mean") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val d = Seq((0, Seq(1.0f, 3.0f)), (0, Seq(3.0f, 5.0f)), (1, Seq(2.0f, 2.0f)))
      .toDF("label", "embedding")
    val got = Similarity.meanPool(d).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got((0, 0)) === 2.0 && got((0, 1)) === 4.0)
    assert(got((1, 0)) === 2.0 && got((1, 1)) === 2.0)
  }

  test("frameSamplePlan: cap respected, null/zero durations dropped, spacing exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val media = Seq(
      (1L, Some(10000L)), // 5 frames at 2000ms
      (2L, Some(100000L)), // capped at maxFrames
      (3L, None), (4L, Some(0L)) // dropped
    ).toDF("doc_id", "dur").select(col("doc_id"), struct(
      lit(Array[Byte]()).as("payload"), lit("v").as("format"),
      lit(0).as("width"), lit(0).as("height"), col("dur").as("duration_ms")).as("media"))
    val out = Multimodal.frameSamplePlan(media, everyMs = 2000, maxFrames = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byDoc = out.groupBy(_._1)
    assert(byDoc(1L).length === 5 && byDoc(2L).length === 8)
    assert(!byDoc.contains(3L) && !byDoc.contains(4L))
    assert(byDoc(1L).sortBy(_._2).map(_._3).toSeq === Seq(0L, 2000L, 4000L, 6000L, 8000L))
  }

  test("chunkPlan: ranges tile the payload exactly with a clamped tail") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val media = Seq((1L, "a" * 2500), (2L, "")).toDF("doc_id", "text")
    val m = Multimodal.synthesizeMedia(media, "doc_id", "text")
    val out = Multimodal.chunkPlan(m, chunkBytes = 1000)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3), r.getLong(4)))
    assert(out.forall(_._1 === 1L)) // empty payload dropped
    assert(out.sortBy(_._2).toSeq === Seq((1L, 0, 0L, 1000L), (1L, 1, 1000L, 2000L), (1L, 2, 2000L, 2500L)))
  }

  test("survivorsByPriority: keeps the max-priority row per component, ties to min id") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val data = Seq((1L, 10), (2L, 30), (3L, 30), (4L, 5), (9L, 7))
      .toDF("doc_id", "prio")
    // component {1,2,3}: 2 and 3 tie on prio 30 → keep min id 2; 4 and 9 unpaired → kept
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("ida", "idb")
    val kept = Dedup.survivorsByPriority(data, pairs, "doc_id", col("prio"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 4L, 9L))
  }

  test("scoreLinear: exact decimal accumulation, unknown tokens weightless") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val d = Seq((1L, "good good bad zz"), (2L, "zz zz"), (3L, "bad"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.scoreLinear(d, Map("good" -> 1.0, "bad" -> -0.5),
      bias = 0.1, threshold = 0.2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(out(1L) === ((4L, 0.475, true)))   // 0.1 + (2*1.0 - 0.5)/4
    assert(out(2L) === ((2L, 0.1, false)))    // no vocab hits → bias only
    assert(out(3L) === ((1L, -0.4, false)))
  }

  test("bpePairCounts: pair counts weighted by word frequency, single-char words dropped") {
    import spark.implicits._
    val d = Seq((1L, "abc ab a"), (2L, "abc x")).toDF("doc_id", "text")
    // word freqs: abc:2 ab:1 a:1 x:1 → pairs ab:2+1=3, bc:2
    val out = TextAnalysis.bpePairCounts(d, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(out === Seq("ab" -> 3L, "bc" -> 2L))
  }

  test("hashSplit: total partition, stable under corpus growth, ~weight proportions") {
    import org.apache.spark.sql.functions._
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val full = TextAnalysis.hashSplit(docs, w, salt = "s")
    val n = docs.count()
    assert(full.count() === n) // every row assigned exactly once
    val counts = full.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(counts("train").toDouble / n > 0.7 && counts("train").toDouble / n < 0.9)
    // stability: the assignment of a row must not depend on the rest of the corpus
    val half = TextAnalysis.hashSplit(docs.filter(col("doc_id") % 2 === 0), w, salt = "s")
    val fullEven = full.filter(col("doc_id") % 2 === 0)
      .select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    half.select("doc_id", "split").collect().foreach { r =>
      assert(fullEven(r.getLong(0)) === r.getString(1))
    }
  }

  test("stratifiedSplit: exact ceil boundaries per stratum, deterministic") {
    import org.apache.spark.sql.functions._
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = TextAnalysis.stratifiedSplit(docs, w, salt = "s").cache()
    val perStratum = out.groupBy("source").pivot("split", Seq("train", "val", "test"))
      .count().na.fill(0L).collect()
    perStratum.foreach { r =>
      val (tr, va, te) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val n = tr + va + te
      // rank cuts: train = ceil(0.8n), train+val = ceil((0.8+0.1)n)
      assert(tr === math.ceil(0.8 * n).toLong)
      assert(tr + va === math.ceil((0.8 + 0.1) * n).toLong)
    }
    val again = TextAnalysis.stratifiedSplit(docs, w, salt = "s")
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    out.unpersist()
  }

  test("shuffled: salt-keyed permutation is stable per salt and differs across salts") {
    import org.apache.spark.sql.functions._
    val a1 = TextAnalysis.shuffled(docs, "s1").select("doc_id").collect().map(_.getLong(0)).toSeq
    val a2 = TextAnalysis.shuffled(docs, "s1").select("doc_id").collect().map(_.getLong(0)).toSeq
    val b = TextAnalysis.shuffled(docs, "s2").select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(a1 === a2)           // same salt → identical order
    assert(a1 !== b)            // different salt → a different epoch order
    assert(a1.toSet === b.toSet) // …but the same corpus
  }

  test("contaminationOverlap: fraction over distinct n-grams, thresholded; short docs yield no row") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c d e"),          // grams: {a b c, b c d, c d e} — 2/3 shared
      (2L, "x y z w v"),          // no overlap
      (3L, "a b")                 // < n words: no shingles, no row
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "a b c d q r s")).toDF("doc_id", "text")
    val out = Dedup.contaminationOverlap(corpus, eval, n = 3, minOverlap = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq((1L, 3L, 2L, 0.666667)))
    // threshold above the fraction excludes it
    assert(Dedup.contaminationOverlap(corpus, eval, n = 3, minOverlap = 0.7).count() === 0)
  }

  test("decodeImages: real JDK PNG decode — true dimensions, exact histogram, garbage tolerated") {
    import spark.implicits._
    val media = Multimodal.synthesizePngMedia(Seq(7L, 8L).toDF("doc_id"))
    val rows = Multimodal.decodeImages(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(7L).getInt(1) === 8 && rows(7L).getInt(2) === 8)
    // pixel i of image id carries gray (id*31+i) % 256 -> exact 8-bin histogram
    def hist(id: Long): Seq[Float] = {
      val h = new Array[Long](8)
      (0 until 64).foreach(i => h((((id * 31 + i) % 256) / 32).toInt) += 1)
      h.map(_.toFloat / 64).toSeq
    }
    assert(rows(7L).getSeq[Float](3) === hist(7L))
    assert(rows(8L).getSeq[Float](3) === hist(8L))
    // an undecodable payload yields a null-dimension row, not an exception
    val bad = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(99L,
        org.apache.spark.sql.Row("not an image".getBytes, "image/png", 0, 0, null)))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("media", Multimodal.mediaSchema))))
    val b = Multimodal.decodeImages(bad).collect()(0)
    assert(b.getLong(0) === 99L && b.isNullAt(1) && b.isNullAt(3))
  }

  test("decodeAudio: real JDK WAV parse — rate, exact integer signal stats, garbage tolerated") {
    import spark.implicits._
    val media = Multimodal.synthesizeWavMedia(Seq(3L).toDF("doc_id"), nSamples = 16, sampleRate = 16000)
    val row = Multimodal.decodeAudio(media).collect()(0)
    val want = (0 until 16).map(i => ((3L * 7919 + i.toLong * 31) % 65536 - 32768).toInt)
    assert(row.getInt(1) === 16000 && row.getLong(2) === 16L)
    assert(row.getInt(3) === want.min && row.getInt(4) === want.max)
    assert(row.getLong(5) === want.map(s => math.abs(s.toLong)).sum)
    // an unparsable payload yields a null row, not an exception
    val bad = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(5L,
        org.apache.spark.sql.Row("nope".getBytes, "audio/wav", null, null, null)))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("media", Multimodal.mediaSchema))))
    val b = Multimodal.decodeAudio(bad).collect()(0)
    assert(b.getLong(0) === 5L && b.isNullAt(1) && b.isNullAt(5))
  }

  test("resizeImages: deterministic nearest-neighbor downsample composes with decode") {
    import spark.implicits._
    val media = Multimodal.synthesizePngMedia(Seq(11L).toDF("doc_id"))
    val row = Multimodal.decodeImages(Multimodal.resizeImages(media, 4, 4)).collect()(0)
    assert(row.getInt(1) === 4 && row.getInt(2) === 4)
    // NN map: dst (x,y) samples src (2x,2y) -> src index 16*(i/4)+2*(i%4)
    val h = new Array[Long](8)
    (0 until 16).foreach { i =>
      val g = (11L * 31 + 16 * (i / 4) + 2 * (i % 4)) % 256
      h((g / 32).toInt) += 1
    }
    assert(row.getSeq[Float](3) === h.map(_.toFloat / 16).toSeq)
  }

  test("imageAHash: exact bits vs reference arithmetic; invariant to upscaling") {
    import spark.implicits._
    val media = Multimodal.synthesizePngMedia(Seq(7L, 264L).toDF("doc_id"))
    val got = Multimodal.imageAHash(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def ref(id: Long): (Long, Long) = {
      val g = (0 until 64).map(i => (id * 31 + i) % 256)
      val sum = g.sum
      var lo = 0L; var hi = 0L
      (0 until 64).foreach { i =>
        if (g(i) * 64 > sum) { if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32) }
      }
      (hi, lo)
    }
    assert(got(7L) === ref(7L))
    // ids congruent mod 256 render identical pixels -> identical hashes
    assert(got(264L) === ref(264L) && got(264L) === ref(8L))
    // the hash is computed on an 8x8 NN subsample, so a lossless upscale
    // (every 8x8 cell maps back to the same source pixel) preserves it —
    // the property that makes aHash a NEAR-dup key, not an exact-byte key
    val up = Multimodal.imageAHash(Multimodal.resizeImages(media, 16, 16)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(up === got)
    // undecodable payload -> null hash words, kept
    val bad = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(99L,
        org.apache.spark.sql.Row("junk".getBytes, "image/png", 0, 0, null)))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("media", Multimodal.mediaSchema))))
    val b = Multimodal.imageAHash(bad).collect()(0)
    assert(b.getLong(0) === 99L && b.isNullAt(1) && b.isNullAt(2))
  }

  test("persisted IVF-PQ index: disk search equals in-session; bucket partitions prune dynamically") {
    val path = java.nio.file.Files.createTempDirectory("graft-ivfpq-idx").toString
    Similarity.writeIvfPqIndex(emb, path)
    val queries = emb.filter(col("vec_id") < 10)
    val fromDisk = Similarity.searchIvfPqIndex(spark, path, queries, k = 5)
    // the search's bucket join prunes code PARTITIONS at file level —
    // dynamic partition pruning on the partition column, asserted in-plan
    fromDisk.count()
    val plan = fromDisk.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected dynamic partition pruning on the codes scan:\n${plan.take(2000)}")
    // layout: codes are physically bucket-partitioned
    assert(new java.io.File(s"$path/codes").listFiles()
      .exists(_.getName.startsWith("bucket=")))
    // deterministic training makes the persisted search IDENTICAL to the
    // in-session composition
    val got = fromDisk.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = Similarity.ivfPqTopK(emb, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === want)
  }

  test("audioFingerprint: exact frame-energy bits; short and garbage payloads null") {
    import spark.implicits._
    val media = Multimodal.synthesizeWavMedia(Seq(3L, 4L).toDF("doc_id"))
    val got = Multimodal.audioFingerprint(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def ref(id: Long): (Long, Long) = {
      val s = (0 until 256).map(i => ((id * 7919 + i.toLong * 31) % 65536 - 32768))
      val e = (0 until 64).map(f => (0 until 4).map(j => math.abs(s(4 * f + j))).sum)
      val tot = e.sum
      var lo = 0L; var hi = 0L
      (0 until 64).foreach { f =>
        if (e(f) * 64 > tot) { if (f < 32) lo |= 1L << f else hi |= 1L << (f - 32) }
      }
      (hi, lo)
    }
    assert(got(3L) === ref(3L) && got(4L) === ref(4L))
    // < 64 samples cannot frame -> null words, kept
    val short = Multimodal.audioFingerprint(
      Multimodal.synthesizeWavMedia(Seq(9L).toDF("doc_id"), nSamples = 32)).collect()(0)
    assert(short.getLong(0) === 9L && short.isNullAt(1) && short.isNullAt(2))
    // the generic Hamming join accepts the afp columns directly
    val many = Multimodal.audioFingerprint(
      Multimodal.synthesizeWavMedia((0L until 60L).toDF("doc_id"))).cache()
    val pairs = Multimodal.hammingNearDupPairs(many, "afp_hi", "afp_lo", maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val hs = many.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = (for {
      (ia, hia, loa) <- hs; (ib, hib, lob) <- hs if ia < ib
      d = java.lang.Long.bitCount(hia ^ hib) + java.lang.Long.bitCount(loa ^ lob)
      if d <= 7
    } yield (ia, ib) -> d).toMap
    assert(pairs === want)
    many.unpersist()
  }

  test("imageNearDupPairs: banded join equals brute-force Hamming, no cartesian") {
    import spark.implicits._
    val ids = (0L until 80L).toDF("doc_id")
    val hashes = Multimodal.imageAHash(Multimodal.synthesizePngMedia(ids)).cache()
    val pairsDf = Multimodal.imageNearDupPairs(hashes, maxHamming = 7)
    val plan = pairsDf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "banded Hamming join must not fall back to all-pairs")
    val got = pairsDf.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // brute-force reference over the collected hash words
    val hs = hashes.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = (for {
      (ia, hia, loa) <- hs; (ib, hib, lob) <- hs if ia < ib
      d = java.lang.Long.bitCount(hia ^ hib) + java.lang.Long.bitCount(loa ^ lob)
      if d <= 7
    } yield (ia, ib) -> d).toMap
    assert(got === want)
    assert(want.nonEmpty, "fixture should contain at least the mod-256 identical pairs")
    hashes.unpersist()
  }

  test("randomProject fails loudly on a null projection instead of emitting null") {
    import spark.implicits._
    // an all-null element vector makes the decimal sum NULL — the same
    // output the overflow cast produces under non-ANSI mode; the guard must
    // raise, never return a null val
    val df = spark.range(1).select(col("id").as("vec_id"),
      array(lit(null).cast("double"), lit(null).cast("double"),
        lit(null).cast("double"), lit(null).cast("double")).as("embedding"))
    val e = intercept[Exception](
      Similarity.randomProject(df, outDim = 4).collect())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("randomProject: null projection")),
      s"expected the loud guard, got: ${messages(e).mkString(" | ")}")
  }

  test("bpeEncode: rank-ordered merges compose; boundaries and non-ASCII handled") {
    import spark.implicits._
    import graft.pipeline.TextAnalysis
    val docs = Seq(
      (1L, "the then"),          // t+h -> th, th+e -> the; 'then' keeps th e n -> the n? no: single pass
      (2L, "a\u00e9b  c\nd"),    // non-ASCII stripped, whitespace runs = one boundary
      (3L, "")
    ).toDF("doc_id", "text")
    val merges = Seq("t" -> "h", "th" -> "e")
    val got = TextAnalysis.bpeEncode(docs, merges)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    // doc 1: "the" -> t h e -> th e -> the (1 unit); "then" -> th e n -> the n (2 units)
    assert(got(1L) === ((3, "the|the|n")))
    // doc 2: "ab c d" after stripping \u00e9 -> units a b / c / d
    assert(got(2L) === ((4, "a|b|c|d")))
    assert(got(3L) === ((0, "")))
    // merges crossing a word boundary never fire: "t h" split across words
    val cross = Seq((9L, "cat hat")).toDF("doc_id", "text")
    val g2 = TextAnalysis.bpeEncode(cross, Seq("t" -> "h"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(g2(9L) === "c|a|t|h|a|t")
    // guards
    intercept[IllegalArgumentException](TextAnalysis.bpeEncode(docs, Nil))
    intercept[IllegalArgumentException](TextAnalysis.bpeEncode(docs, Seq("a " -> "b")))
  }

  test("profileColumns: exact single-pass stats; approx twin within tolerance") {
    import spark.implicits._
    import graft.pipeline.TextAnalysis
    val df = Seq(
      (1L, Some("en"), 10L), (2L, Some("de"), 20L),
      (3L, None, 30L), (4L, Some("en"), 40L)
    ).toDF("id", "lang", "n")
    val got = TextAnalysis.profileColumns(df, Seq("lang", "n")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))).toMap
    assert(got("lang") === ((4L, 1L, 2L, "de", "en")))
    assert(got("n") === ((4L, 0L, 4L, "10", "40")))
    intercept[IllegalArgumentException](TextAnalysis.profileColumns(df, Seq("nope")))
    // approx: same shape, ndv within 20% on a small exact-friendly input
    val approx = TextAnalysis.profileColumnsApprox(df, Seq("lang", "n")).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(math.abs(approx("lang") - 2L) <= 1 && math.abs(approx("n") - 4L) <= 1)
  }

  test("oovRate: exact per-doc OOV integers against the corpus top-k vocab") {
    import spark.implicits._
    import graft.pipeline.TextAnalysis
    // corpus frequencies: "a" x4, "b" x3, "c" x1, "d" x1 -> vocab(2) = {a, b}
    val docs = Seq(
      (1L, "a a b c"), (2L, "a b b d"), (3L, "a a")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.oovRate(docs, vocabSize = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(1L -> ((4L, 1L, 250000L)), 2L -> ((4L, 1L, 250000L)),
      3L -> ((2L, 0L, 0L))))
    // boundary tie-break is deterministic: c and d tie at f=1; vocab(3) takes "c"
    val g3 = TextAnalysis.oovRate(docs, vocabSize = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(g3 === Map(1L -> 0L, 2L -> 1L, 3L -> 0L))
    intercept[IllegalArgumentException](TextAnalysis.oovRate(docs, 0))
  }

  test("binaryQuantize: sign bits match per-direction dots; Hamming composition works") {
    import spark.implicits._
    import graft.pipeline.{Similarity, Multimodal}
    val rnd = new scala.util.Random(23)
    val rows: Seq[(Long, Seq[Float])] =
      (0L until 20L).map(id => id -> Seq.fill(16)((rnd.nextDouble() - 0.5).toFloat)) :+
        (100L -> Seq.fill(16)(0.25f)) :+ (101L -> Seq.fill(16)(0.25f)) // planted identical pair
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.binaryQuantize(df)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // reference: left-to-right double dot per direction
    val dirs = Similarity.lshDirections(16, 128)
    def word(vec: Seq[Float], lo: Int): Long = (0 until 64).foldLeft(0L) { (acc, j) =>
      var s = 0.0
      for (i <- 0 until 16) s += vec(i).toDouble * dirs(lo + j)(i)
      if (s > 0) acc | (1L << j) else acc
    }
    for ((id, vec) <- rows)
      assert(got(id) === ((word(vec, 64), word(vec, 0))), s"vec $id")
    // identical vectors -> identical signatures -> Hamming 0 pair via the banded join
    val pairs = Multimodal.hammingNearDupPairs(
      Similarity.binaryQuantize(df), "sig_hi", "sig_lo", maxHamming = 7, idCol = "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.contains((100L, 101L)) && pairs((100L, 101L)) === 0)
  }

  test("bpeEncode equals the JVM single-pass replace chain (ScalaCheck)") {
    import org.scalacheck.Gen
    import spark.implicits._
    import graft.pipeline.TextAnalysis
    val charGen = Gen.frequency(6 -> Gen.alphaLowerChar, 2 -> Gen.const(' '),
      1 -> Gen.oneOf('.', '#', '\u00e9'), 1 -> Gen.const('\n'))
    val textGen = Gen.chooseNum(0, 60).flatMap(k => Gen.listOfN(k, charGen)).map(_.mkString)
    val unitGen = Gen.chooseNum(1, 2).flatMap(k => Gen.listOfN(k, Gen.alphaLowerChar)).map(_.mkString)
    val mergesGen = Gen.chooseNum(1, 6).flatMap(k =>
      Gen.listOfN(k, Gen.zip(unitGen, unitGen)))
    def reference(text: String, merges: Seq[(String, String)]): (Int, String) = {
      val ascii = text.replaceAll("[^\\x20-\\x7E]", "")
      val sent = ascii.replaceAll("\\s+", "\u0001")
      val spaced = " " + sent.flatMap(c => s"$c ")
      val merged = merges.foldLeft(spaced) { case (acc, (a, b)) =>
        acc.replace(s" $a $b ", s" $a$b ") }
      val units = merged.split(" ", -1).filter(u => u.nonEmpty && u != "\u0001").toSeq
      (units.size, units.take(8).mkString("|"))
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15),
      org.scalacheck.Prop.forAll(Gen.listOfN(4, textGen), mergesGen) { (texts, merges) =>
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        val got = TextAnalysis.bpeEncode(df, merges)
          .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
        texts.zipWithIndex.forall { case (t, i) =>
          got(i.toLong) == reference(t, merges) }
      })
    assert(res.passed, s"property failed: $res")
  }

  test("rangeSearch: threshold dual of top-k, self-matches excluded") {
    import spark.implicits._
    import graft.pipeline.Similarity
    val rows = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(1f, 0.01f)), (3L, Seq(0f, 1f)), (4L, Seq(-1f, 0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.rangeSearch(rows, rows.filter(col("vec_id") === 1L), 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L))) // only the near-parallel vector passes 0.9
    val none = Similarity.rangeSearch(rows, rows.filter(col("vec_id") === 3L), 0.99)
    assert(none.isEmpty)
  }

  test("languageMix: per-window id catches code-switching the whole-doc id hides") {
    import spark.implicits._
    import graft.pipeline.TextAnalysis
    val en = "the of and is"
    val de = "der und ist zu"
    val docs = Seq((1L, s"$en $en $de"), (2L, en)).toDF("doc_id", "text")
    val got = TextAnalysis.languageMix(docs, windowTokens = 4).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))).toMap
    // doc 1 = en,en,de windows: dominant en at 2/3; doc 2 = one en window
    assert(got(1L) === ((3L, 2L, "en", 666666L)))
    assert(got(2L) === ((1L, 1L, "en", 1000000L)))
    // the whole-document id reports plain 'en' for doc 1 — the window report
    // is what exposes the switch
    val whole = docs.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(whole(1L) === "en")
  }

  test("annRecall: perfect when every bucket is probed; summary micro-averages") {
    import spark.implicits._
    import graft.pipeline.Similarity
    val vecs = (0L until 12L).map { i =>
      (i, Seq.tabulate(4)(d => if (d == (i % 4).toInt) 1f else (i % 3) * 0.1f))
    }.toDF("vec_id", "embedding")
    // nprobe = nlist: IVF degenerates to exact search -> recall 1 everywhere
    val full = Similarity.annRecall(vecs, vecs.filter(col("vec_id") < 3), k = 3,
      nlist = 4, nprobe = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(full.size === 4 && full.values.forall(_ === 1000000L), s"got $full")
    // probing one bucket of four can only lose recall, never exceed 1
    val one = Similarity.annRecall(vecs, vecs.filter(col("vec_id") < 3), k = 3,
      nlist = 4, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(one.forall(t => t._4 <= 1000000L && t._2 <= t._3))
    val sm = one.find(_._1 == -1L).get
    assert(sm._2 === one.filter(_._1 != -1L).map(_._2).sum,
      "summary row must micro-average the per-query hits")
  }

  test("weightedSample: exact k per group, deterministic, nonpositive weights out") {
    import spark.implicits._
    import graft.pipeline.TextAnalysis
    val docs = ((1L to 10L).map(i => (i, "a", if (i == 5L) 0L else i)) ++
      (11L to 20L).map(i => (i, "b", i)) ++
      Seq((21L, "c", 7L), (22L, "c", -3L))).toDF("doc_id", "source", "wt")
    def run() = TextAnalysis.weightedSample(docs, 3, col("wt"),
      groupCol = "source", idCol = "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val got = run()
    val byGroup = got.groupBy(_._1).view.mapValues(_.size).toMap
    // a and b fill k = 3; c has one positive-weight doc
    assert(byGroup === Map("a" -> 3, "b" -> 3, "c" -> 1))
    assert(!got.exists(_._2 == 5L), "zero-weight row must never be sampled")
    assert(!got.exists(_._2 == 22L), "negative-weight row must never be sampled")
    assert(got === run(), "hash-seeded sampling must replay identically")
    // selected priorities are the group's maxima (A-Res takes the top-k keys)
    val all = TextAnalysis.weightedSample(docs, 100, col("wt"),
      groupCol = "source", idCol = "doc_id")
      .collect().map(r => (r.getString(0), r.getDouble(2)))
    val topA = all.filter(_._1 == "a").map(_._2).sorted.reverse.take(3).toSet
    assert(got.filter(_._1 == "a").map(_._3) === topA)
  }

  test("epochBudget: exact repeat factors, over-epoching flagged, unlisted source zeroed") {
    import spark.implicits._
    import graft.pipeline.TextAnalysis
    val docs = Seq(
      (1L, "a b c d", "small"),   // 4 tokens
      (2L, "a b c d e f", "big"), // 6 tokens
      (3L, "x y", "big"),         // 2 tokens -> big has 8
      (4L, "q r s", "other")).toDF("doc_id", "text", "source")
    val got = TextAnalysis.epochBudget(docs,
      Seq(("small", 750000L), ("big", 250000L)), budgetTokens = 64L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    // small: target 48 over 4 available = 12x epochs -> flagged at the 4x default
    assert(got("small") === ((4L, 48L, 12000000L, true)))
    // big: target 16 over 8 = 2x, inside budget
    assert(got("big") === ((8L, 16L, 2000000L, false)))
    // unlisted source: zero target, zero epochs, not flagged
    assert(got("other") === ((3L, 0L, 0L, false)))
  }

  test("bpeTrain: learns frequency-ordered merges that compose, feeds bpeEncode") {
    import spark.implicits._
    import graft.pipeline.TextAnalysis
    // 'th' dominates, then 'the' via composition with the learned 'th' unit
    val docs = Seq(
      (1L, "the the the the then then that"),
      (2L, "the then that this this")).toDF("doc_id", "text")
    val m = TextAnalysis.bpeTrain(docs, numMerges = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m(0) === ((1L, "t", "h", 12L)))          // th in every word
    assert(m(1) === ((2L, "th", "e", 8L)))          // the/then: composed unit
    // rank 3: remaining pairs — 'th a' (that x2) vs 'th i' (this x2) vs
    // 'the n' (then x3): then wins
    assert(m(2) === ((3L, "the", "n", 3L)))
    // the learned table drives bpeEncode: 'the' collapses to ONE unit
    val enc = TextAnalysis.bpeEncode(docs,
      m.map(x => (x._2, x._3)).toSeq)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(enc(1L).startsWith("the|the"), s"got ${enc(1L)}")
    // exhaustion: a single-char vocabulary stops early, no phantom rows
    val tiny = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeTrain(tiny, numMerges = 5).isEmpty)
  }

  test("importanceWeights: target-like documents outscore off-distribution ones") {
    import spark.implicits._
    import graft.pipeline.TextAnalysis
    // target corpus speaks alpha/beta; the crawl bulk speaks zeta/eta;
    // docs 10 and 11 are held-out members of each style
    val docs = (Seq(
      (1L, "alpha beta alpha beta gamma", true),
      (2L, "beta alpha beta alpha alpha", true),
      (10L, "alpha beta gamma alpha beta", false),
      (11L, "zeta eta theta zeta eta", false)) ++
      (20L to 29L).map(i => (i, "zeta eta zeta theta eta zeta", false)))
      .toDF("doc_id", "text", "is_target")
    val w = TextAnalysis.importanceWeights(docs, col("is_target"), buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w.size === docs.count())
    assert(w(10L) > w(11L),
      s"held-out target-style doc must outscore crawl-style: ${w(10L)} vs ${w(11L)}")
    assert(w(1L) > 0.0 && w(20L) < w(1L))
    // deterministic: same inputs, same weights
    val w2 = TextAnalysis.importanceWeights(docs, col("is_target"), buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w2 === w)
    // the frozen-model composition (what the streaming twin runs) is the
    // same op: model once, score against — identical weights
    val model = TextAnalysis.dsirModel(docs, col("is_target"), buckets = 256)
    val w3 = TextAnalysis.importanceWeightsAgainst(docs, model, buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w3 === w)
  }

  test("exact pair kernels fail loudly past spark.graft.exactPairs.maxRows") {
    // the exact kernels are diagnostic baselines; the conf cap makes
    // pointing one at a full corpus an immediate error, not a cartesian
    spark.conf.set("spark.graft.exactPairs.maxRows", "10")
    try {
      val big = spark.range(50).select(col("id").as("vec_id"),
        expr("array(cast(id as double), 1.0d)").as("embedding"))
      val e1 = intercept[IllegalArgumentException] {
        Similarity.cosinePairs(big, 0.5)
      }
      assert(e1.getMessage.contains("exactPairs.maxRows") &&
        e1.getMessage.contains("quadratic"))
      val e2 = intercept[IllegalArgumentException] {
        Similarity.bruteForceTopK(big, big.limit(3), 3)
      }
      assert(e2.getMessage.contains("bruteForceTopK"))
      val e3 = intercept[IllegalArgumentException] {
        Similarity.hardNegatives(big.withColumn("label", lit("x")),
          big.withColumn("label", lit("y")).limit(3), 3)
      }
      assert(e3.getMessage.contains("hardNegatives"))
      // at or under the cap the kernels still run
      assert(Similarity.cosinePairs(big.limit(10), -1.0).count() > 0L)
      assert(Similarity.bruteForceTopK(big.limit(10), big.limit(2), 3)
        .count() === 6L)
    } finally spark.conf.unset("spark.graft.exactPairs.maxRows")
  }
}
