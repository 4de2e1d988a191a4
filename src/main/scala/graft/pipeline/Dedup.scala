package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document deduplication for large-scale training-data pipelines: exact,
  * n-gram Jaccard, MinHash+LSH, SimHash. All set-oriented DataFrame plans —
  * no driver-side loops — designed so every stage is one shuffle keyed on
  * something that stays balanced at 100 TB (see notes per operator).
  */
object Dedup {

  /** Word tokens (simple whitespace model — the pipeline tokenizer, distinct
    * from the query-predicate tokenizer in graft.expr.Text). */
  def words(text: Column): Column = split(text, "\\s+")

  /** Distinct word n-gram shingles of a text column. A document with fewer
    * than n words has NO shingles (empty array) — a truncated partial shingle
    * would make sub-n-word documents compare as near-identical. */
  def shingles(text: Column, n: Int = 3): Column = {
    // Expression-level LET: the token array is bound ONCE as a lambda
    // variable of a 1-element transform. An expression captured inside a
    // higher-order-function lambda is re-evaluated per element (no
    // subexpression elimination across the lambda boundary), so the direct
    // form re-split the text once per shingle — O(len²) splits per document
    // across every shingle consumer (r17: the sf0.1 stupid-backoff position
    // explode fell 9.2 s → 0.45 s from the same fix).
    element_at(transform(array(words(text)), w =>
      when(size(w) >= n,
        array_distinct(transform(
          sequence(lit(0), size(w) - n),
          i => concat_ws(" ", slice(w, i + 1, lit(n))))))
        .otherwise(array().cast(ArrayType(StringType)))), 1)
  }

  /** Exact dedup: group identical texts, keep the smallest id as survivor.
    * Scale: single hash-aggregate shuffle on a 128-bit text hash (not the
    * text itself) — constant-width shuffle rows even for long documents. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol), md5(col(textCol)).as("h"))
      .groupBy(col("h"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("copies"))
      .select(col(idCol), col("copies"))

  /** Exact n-gram Jaccard similarity join via inverted shingle index:
    * explode distinct shingles → self-join on shingle → |A∩B| per pair →
    * J = |A∩B| / (|A|+|B|-|A∩B|). Returns (ida, idb, jaccard) with ida<idb.
    *
    * Scale: the shuffle key is the shingle; frequency-skewed shingles blow up
    * the join (a shingle shared by m docs yields m² candidate rows), so
    * shingles above `maxDocFreq` are dropped — standard stop-shingle filtering;
    * with n≥3 a high-frequency shingle carries almost no similarity signal. */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text",
      maxDocFreq: Long = 100000L): DataFrame =
    sharedShingleCounts(docs, n, idCol, textCol, maxDocFreq)
      .withColumn("jaccard", col("shared").cast(DoubleType) /
        (col("sza") + col("szb") - col("shared")).cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select(col("ida"), col("idb"), col("jaccard"))

  /** Shingle-CONTAINMENT pairs (Broder's containment, the quote /
    * subsumption detector Jaccard misses): c = |A∩B| / min(|A|, |B|) — a
    * short document fully quoted inside a long one scores c = 1 while its
    * Jaccard is tiny. Returns every pair at `c ≥ threshold` with the exact
    * shared/size integers so the caller can see WHICH side is contained.
    * Same inverted-index + stop-shingle machinery as [[ngramJaccardPairs]]
    * (one shared pair-count builder — one scan, shingle-keyed shuffle,
    * heavy-shingle cap). */
  def containmentPairs(docs: DataFrame, threshold: Double, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text",
      maxDocFreq: Long = 100000L): DataFrame =
    sharedShingleCounts(docs, n, idCol, textCol, maxDocFreq)
      .withColumn("containment", col("shared").cast(DoubleType) /
        least(col("sza"), col("szb")).cast(DoubleType))
      .filter(col("containment") >= threshold)
      .select(col("ida"), col("idb"), col("shared"), col("sza"), col("szb"),
        col("containment"))

  /** Shared machinery of the exact shingle-set joins: distinct-shingle
    * inverted index → stop-shingle cap → pair intersection counts.
    * Returns (ida < idb, shared, sza, szb). */
  private def sharedShingleCounts(docs: DataFrame, n: Int,
      idCol: String, textCol: String, maxDocFreq: Long): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), shingles(col(textCol), n).as("gs"))
      .withColumn("sz", size(col("gs")))
    val tok = sh.select(col("id"), col("sz"), explode(col("gs")).as("g"))
    // stop-shingle removal via an aggregate + anti-join instead of a window
    // that would sort the entire exploded token table. The heavy set is
    // data-dependent-unbounded (#shingles with df > maxDocFreq grows
    // linearly with corpus size), so the join is AQE-decided — no forced
    // broadcast.
    val heavy = tok.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDocFreq).select(col("g"))
    val filtered = tok.join(heavy, Seq("g"), "left_anti")
    val a = filtered.select(col("id").as("ida"), col("sz").as("sza"), col("g"))
    val b = filtered.select(col("id").as("idb"), col("sz").as("szb"), col("g"))
    a.join(b, Seq("g")).filter(col("ida") < col("idb"))
      .groupBy(col("ida"), col("idb"))
      .agg(count(lit(1)).as("shared"), first(col("sza")).as("sza"),
        first(col("szb")).as("szb"))
  }

  /** Train/eval decontamination: documents sharing at least one word n-gram
    * with the evaluation set, with the count of distinct shared n-grams —
    * the standard benchmark-leakage check run before training. Returns
    * (idCol, n_shared) for contaminated docs only.
    *
    * Scale: the eval side is small by definition — its distinct shingle set
    * broadcasts; the corpus side explodes shingles once and inner-joins, so
    * the cost is one broadcast hash join over the exploded corpus with no
    * shuffle of the corpus at all (count agg is map-side combinable keyed by
    * doc id). An 8-gram is specific enough that cross-doc collisions are
    * near-certain leaks, per the public decontamination recipes. */
  def contamination(corpus: DataFrame, evalSet: DataFrame, n: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val evalGrams = evalSet
      .select(explode(shingles(col(textCol), n)).as("g")).distinct()
    corpus.select(col(idCol), explode(shingles(col(textCol), n)).as("g"))
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_shared"))
  }

  /** Overlap-FRACTION decontamination — the thresholded variant of
    * [[contamination]] from the public GPT-3-style recipes: per corpus
    * document, the share of its distinct word n-grams that occur anywhere in
    * the evaluation set; only documents at or above `minOverlap` return
    * (any single shared 8-gram flags under [[contamination]]; the fraction
    * variant tolerates incidental short collisions on shorter n). Returns
    * (idCol, n_grams, n_shared, overlap), overlap rounded to 6dp for
    * engine-exact comparison.
    *
    * Scale: identical to [[contamination]] — the eval shingle set broadcasts
    * (small by definition), the corpus explodes its distinct shingles once
    * and LEFT-joins so both counts come from one map-side-combinable
    * aggregate; the corpus never shuffles. */
  def contaminationOverlap(corpus: DataFrame, evalSet: DataFrame, n: Int = 8,
      minOverlap: Double = 0.2, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val evalGrams = evalSet
      .select(explode(shingles(col(textCol), n)).as("g")).distinct()
      .withColumn("__hit", lit(1L))
    corpus.select(col(idCol), explode(shingles(col(textCol), n)).as("g"))
      .join(broadcast(evalGrams), Seq("g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_shared"))
      .withColumn("overlap", round(col("n_shared").cast(DoubleType) /
        col("n_grams").cast(DoubleType), 6))
      .filter(col("overlap") >= minOverlap)
      .select(col(idCol), col("n_grams"), col("n_shared"), col("overlap"))
  }

  /** Cross-document duplicated-span fraction (the exact-substring dedup
    * signal of the public RefinedWeb/Gopher recipes): per document, the share
    * of its DISTINCT word n-grams that also occur in at least one OTHER
    * document. High values mark boilerplate/templated documents that survive
    * document-level dedup. Returns (idCol, n_spans, dup_frac); documents
    * shorter than n tokens yield no row (no spans to measure).
    *
    * Scale shape: same inverted shingle index as the Jaccard join — explode
    * distinct shingles once, a map-side-combinable doc-count per shingle,
    * join back, per-doc ratio of two integers (deterministic division,
    * rounded). No pair explosion: cost is linear in total distinct spans. */
  def dupSpanFraction(docs: DataFrame, n: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = docs.select(col(idCol), explode(shingles(col(textCol), n)).as("g"))
    val docFreq = sh.groupBy(col("g")).agg(count(lit(1)).as("ndocs"))
    sh.join(docFreq, Seq("g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        round(sum(when(col("ndocs") > 1, 1L).otherwise(0L)).cast(DoubleType) /
          count(lit(1)).cast(DoubleType), 6).as("dup_frac"))
  }

  /** Exact-substring span REMOVAL — the surgical form of the public
    * exact-substring dedup recipe ("Deduplicating Training Data Makes
    * Language Models Better", Lee et al. 2022: cut the duplicated substring,
    * keep the rest of the document): every token position covered by ANY
    * word n-gram that occurs in at least `minDocs` distinct documents is
    * removed, and the survivors re-join in order. Documents shorter than n
    * tokens (no spans) pass through untouched; a fully-duplicated document
    * comes back as the empty string, not dropped — downstream length filters
    * decide its fate. Returns (idCol, textCol) with the rewritten text.
    *
    * Scale shape: the gram frame carries (id, start, md5(gram)) — constant
    * width through the doc-frequency shuffle no matter how long the grams
    * are. Coverage explodes ×n only for grams that MATCHED the duplicate
    * set; the rebuild is one anti-join plus a per-doc sort of its own kept
    * tokens (array_sort of (pos, tok) structs — order-exact, no window).
    * Nothing here is quadratic: cost is linear in total tokens. */
  def removeDupSpans(docs: DataFrame, n: Int = 8, minDocs: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val withL = docs.select(col(idCol).as("__id"), words(col(textCol)).as("__l"))
    val grams = positionedGramHashes(withL, n)
    val dup = grams.groupBy(col("__h"))
      .agg(count_distinct(col("__id")).as("__d"))
      .filter(col("__d") >= minDocs).select(col("__h"))
    val covered = grams.join(dup, Seq("__h"), "left_semi")
      .select(col("__id"),
        explode(sequence(col("__start"), col("__start") + lit(n - 1))).as("__pos"))
      .distinct()
    rebuildWithoutCovered(docs, withL, covered, idCol, textCol)
  }

  /** INTRA-document repetition removal — the within-document half of the
    * exact-substring recipe (templated boilerplate repeating inside one page
    * rather than across the corpus): every token position covered by an
    * n-gram occurrence OTHER than that gram's first occurrence in the same
    * document is cut; the first occurrence (and everything never repeated)
    * survives in order. Deterministic: "first" = minimal start position, no
    * tie possible. Self-overlapping runs collapse greedily (e.g. "a a a a"
    * at n=2 keeps exactly one "a"). Returns (idCol, textCol) rewritten.
    *
    * Scale: per-(doc, gram) min is one map-side-combinable aggregate over
    * the same constant-width (id, start, md5) frame as [[removeDupSpans]];
    * everything downstream is shared. */
  def removeRepeatedSpans(docs: DataFrame, n: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val withL = docs.select(col(idCol).as("__id"), words(col(textCol)).as("__l"))
    val grams = positionedGramHashes(withL, n)
    val firstStart = grams.groupBy(col("__id"), col("__h"))
      .agg(min(col("__start")).as("__first"))
    val covered = grams.join(firstStart, Seq("__id", "__h"))
      .filter(col("__start") > col("__first"))
      .select(col("__id"),
        explode(sequence(col("__start"), col("__start") + lit(n - 1))).as("__pos"))
      .distinct()
    rebuildWithoutCovered(docs, withL, covered, idCol, textCol)
  }

  /** CROSS-corpus line-level dedup — the C4 recipe's global half (Raffel et
    * al. 2020 drop repeated lines corpus-wide, complementing the per-page
    * rules in [[graft.pipeline.TextAnalysis.c4Clean]]): any line occurring
    * more than once in the corpus survives only at its FIRST occurrence,
    * first = the lexicographically-minimal (doc, line-index) pair —
    * deterministic, no RNG, no insertion order. Lines shorter than
    * `minChars` characters (blank separators by default) are never treated
    * as duplicates — every occurrence survives. Docs whose every line is
    * cut come back as ''; NULL text stays NULL. `sep` generalizes the unit
    * (newline by default; any literal delimiter makes this a first-wins
    * record dedup over that granularity).
    *
    * Scale: lines cross the shuffle as (md5, doc, idx) — constant width
    * regardless of line length; the keep-set is one map-side-combinable
    * min-struct + count agg per DISTINCT line, and only lines with a
    * duplicate anywhere re-join (the singleton majority never produces
    * covered traffic). Rebuild is the shared order-exact array_sort
    * reassembly — no window functions anywhere. */
  def removeDupLines(docs: DataFrame, minChars: Int = 1,
      sep: String = "\n",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val withL = docs.select(col(idCol).as("__id"),
      split(col(textCol), java.util.regex.Pattern.quote(sep)).as("__l"))
    val lines = withL
      .select(col("__id"), posexplode(col("__l")).as(Seq("__pos", "__line")))
      .filter(length(col("__line")) >= minChars)
      .select(col("__id"), col("__pos"), md5(col("__line")).as("__h"))
    val dupFirst = lines.groupBy(col("__h"))
      .agg(min(struct(col("__id"), col("__pos"))).as("__f"),
        count(lit(1)).as("__n"))
      .filter(col("__n") >= 2)
      .select(col("__h"), col("__f"))
    val covered = lines.join(dupFirst, Seq("__h"))
      .filter(col("__id") =!= col("__f.__id") || col("__pos") =!= col("__f.__pos"))
      .select(col("__id"), col("__pos"))
    rebuildWithoutCovered(docs, withL, covered, idCol, textCol, sep = sep)
  }

  /** Positioned gram hashes of (__id, __l token array): one row per n-gram
    * occurrence, (__id, __start, __h=md5) — constant width through every
    * downstream exchange regardless of gram length. */
  private def positionedGramHashes(withL: DataFrame, n: Int): DataFrame =
    withL.filter(size(col("__l")) >= n)
      .select(col("__id"), explode(transform(
        sequence(lit(0), size(col("__l")) - n),
        i => struct(i.as("start"),
          md5(concat_ws(" ", slice(col("__l"), i + 1, lit(n)))).as("h")))).as("g"))
      .select(col("__id"), col("g.start").as("__start"), col("g.h").as("__h"))

  /** Anti-join the covered (__id, __pos) set against the token stream and
    * reassemble each document's survivors in order (array_sort of (pos, tok)
    * structs — order-exact, no window). Docs losing every token come back as
    * '' rather than disappearing; a NULL input text stays NULL (no text
    * operator here rewrites null → '' — same contract as truncateTokens). */
  private def rebuildWithoutCovered(docs: DataFrame, withL: DataFrame,
      covered: DataFrame, idCol: String, textCol: String,
      sep: String = " "): DataFrame = {
    val kept = withL
      .select(col("__id"), posexplode(col("__l")).as(Seq("__pos", "__tok")))
      .join(covered, Seq("__id", "__pos"), "left_anti")
      .groupBy(col("__id"))
      .agg(array_sort(collect_list(struct(col("__pos"), col("__tok")))).as("__s"))
      .select(col("__id"),
        concat_ws(sep, transform(col("__s"), s => s.getField("__tok"))).as("__text"))
    docs.select(col(idCol), col(textCol).isNull.as("__wasnull"))
      .join(kept, col(idCol) === kept("__id"), "left")
      .select(col(idCol),
        when(col("__wasnull"), lit(null).cast(StringType))
          .otherwise(coalesce(col("__text"), lit(""))).as(textCol))
  }

  // ---------------- MinHash + LSH ----------------

  /** Seeded affine hash family (a,b) over the Mersenne prime p=2³¹-1.
    * 31-bit operands keep a·x+b < 2⁶² — no long overflow under ANSI mode.
    * Deterministic across runs/partitions (seed-derived, no RNG at exec). */
  private val MersennePrime = 2147483647L // 2^31 - 1
  private def hashFamily(numHashes: Int, seed: Long): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numHashes)((
      (rnd.nextLong() & 0x7FFFFFFFL) | 1L,
      rnd.nextLong() & 0x7FFFFFFFL))
  }

  /** Base shingle hashes of a text column (31-bit). */
  def shingleHashes(text: Column, n: Int = 3): Column =
    transform(shingles(text, n), g => pmod(xxhash64(g), lit(MersennePrime)))

  /** MinHash signatures as a DataFrame: (id, text, sig array<long>).
    *
    * Formulation matters at scale: higher-order array functions
    * (transform/array_min) are interpreted (CodegenFallback), and 128 of them
    * would each re-evaluate the shingle split per row — measured 100×
    * slower. Instead: explode the shingle hashes once (string work happens
    * exactly once per shingle) and compute the 128 permutation minima as
    * codegen'd `min` aggregates with map-side partial aggregation — one
    * shuffle of 5·10³-wide partial rows per doc, not the raw shingles.
    *
    * Contract: documents shorter than `n` words produce NO shingles and are
    * dropped from the output (no signature row) — they can never be near-dups
    * under shingle Jaccard, matching the pair-generation semantics of
    * `minHashLshPairs`/`dedupDocuments`. Callers needing one row per input
    * doc should left-join the result back to their doc table. */
  def minHashSignatures(docs: DataFrame, n: Int = 3, numHashes: Int = 128,
      seed: Long = 42L, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val fam = hashFamily(numHashes, seed)
    // two-step select: referencing the just-aliased text column inside the
    // same projection as explode() trips lateral-column-alias resolution.
    // Only (id, hash) rides through the explode + aggregation shuffle — the
    // text column would be duplicated per shingle (~300×) otherwise; it
    // rejoins from the base table afterwards (one row per doc).
    val base = docs.select(col(idCol).as("id"), col(textCol).as("text"))
    val exploded = base.select(col("id"),
      explode(shingleHashes(col("text"), n)).as("__h"))
    val aggs = fam.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("__h") * lit(a) + lit(b), lit(MersennePrime))).as(s"__m$i")
    }
    exploded.groupBy(col("id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("id"),
        array((0 until numHashes).map(i => col(s"__m$i")): _*).as("sig"))
      .join(base, Seq("id"))
  }

  /** The LSH S-CURVE tuning table — the planning sheet every MinHash
    * deployment reads before picking (bands, rows): for each candidate
    * banding of the signature and each Jaccard similarity s on a 0.05 grid,
    * the candidate-pair probability P = 1 − (1 − s^rows)^bands (Broder /
    * Leskovec-Rajaraman-Ullman "Mining of Massive Datasets" ch. 3; the
    * curve's threshold sits near (1/bands)^(1/rows)). Returns (bands, rows,
    * s_x100, p_x1e6) — pick the banding whose steep section straddles your
    * target threshold, e.g. [[minHashLshPairs]]'s default 32×4.
    *
    * Determinism: bands and rows must be powers of two, so BOTH
    * exponentiations are pure square-and-round chains — each squaring is an
    * exact DECIMAL product rounded to 12 dp, mirrored step-for-step by the
    * SQL oracle; no float `pow` anywhere. Scale: the output is
    * |configs|·19 rows of arithmetic — the cost is zero at any corpus size
    * (the table depends only on the banding, never the data). */
  def lshTuningTable(spark: org.apache.spark.sql.SparkSession,
      configs: Seq[(Int, Int)] = Seq((64, 2), (32, 4), (16, 8), (8, 16))): DataFrame = {
    def log2(x: Int): Int = {
      require(x >= 1 && (x & (x - 1)) == 0, s"lshTuningTable: $x must be a power of two")
      java.lang.Integer.numberOfTrailingZeros(x)
    }
    // values live in [0,1]: DECIMAL(13,12) keeps the square's ideal type
    // (27,24) inside Spark's 38-digit cap, so the product is EXACT before
    // the 12-dp round — a wider operand would silently truncate instead
    val dec = DecimalType(13, 12)
    def sq(x: Column, times: Int): Column =
      (1 to times).foldLeft(x)((c, _) => round(c * c, 12).cast(dec))
    val grids = configs.map { case (b, r) =>
      import spark.implicits._
      val grid = (1 to 19).map { i =>
        (b, r, i * 5, new java.math.BigDecimal(i * 5).movePointLeft(2).setScale(12))
      }.toDF("bands", "rows", "s_x100", "s")
      val sr = sq(col("s").cast(dec), log2(r))
      val qb = sq(round(lit(1) - sr, 12).cast(dec), log2(b))
      grid.select(col("bands"), col("rows"), col("s_x100"),
        floor((lit(1) - qb) * lit(1000000L)).cast("long").as("p_x1e6"))
    }
    grids.reduce(_ unionAll _)
  }

  /** MinHash+LSH near-dup pairs: signature → bands → bucket join → exact
    * Jaccard verification ≥ threshold. With the default 32 bands × 4 rows the
    * detection probability at J=0.8 is 1-(1-0.8⁴)³² ≈ 1-1e-7, so verified
    * output matches the exact join (same oracle) while candidate generation
    * scales as the number of colliding pairs, not |docs|².
    *
    * Scale: shuffle key is (band, bucketHash); oversized buckets (skew) are
    * capped via maxBucketSize — a bucket of size m yields m² candidates. */
  def minHashLshPairs(docs: DataFrame, threshold: Double, n: Int = 3,
      numHashes: Int = 128, bands: Int = 32,
      idCol: String = "doc_id", textCol: String = "text",
      maxBucketSize: Long = 100000L): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // band on ids only: exploding bands multiplies rows by `bands`, so the
    // payload through this shuffle must be (id, band, bucket) — never the
    // document text (texts rejoin only for the small candidate set)
    // cached via PlanCache: the plan references this frame from THREE
    // branches (heavy-bucket stats + both sides of the bucket self-join);
    // without the cache each branch re-runs the 128-aggregate signature
    // computation — the dominant cost. (id, band, bucket) is 24 bytes/row —
    // |docs|·bands total, trivially cacheable at any scale that fits the
    // shuffle anyway. The bounded LRU also serves repeated calls over the
    // same input without leaking an entry per call.
    val banded = bandedFrame(docs, n, numHashes, bands, idCol, textCol)
    val heavyBuckets = banded.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("bsz")).filter(col("bsz") > maxBucketSize)
      .select(col("band"), col("bucket"))
    // no forced broadcast: #heavy buckets <= rows/maxBucketSize is
    // data-dependent-unbounded at 100x scale; AQE broadcasts the (typical)
    // small case from its RUNTIME size
    val capped = banded.join(heavyBuckets, Seq("band", "bucket"), "left_anti")
    val a = capped.select(col("band"), col("bucket"), col("id").as("ida"))
    val b = capped.select(col("band"), col("bucket"), col("id").as("idb"))
    val candidates = a.join(b, Seq("band", "bucket"))
      .filter(col("ida") < col("idb"))
      .select(col("ida"), col("idb"))
      .dropDuplicates("ida", "idb")
    val texts = docs.select(col(idCol).as("__tid"), col(textCol).as("__text"))
    val withTexts = candidates
      .join(texts, col("ida") === col("__tid")).withColumnRenamed("__text", "ta").drop("__tid")
      .join(texts, col("idb") === col("__tid")).withColumnRenamed("__text", "tb").drop("__tid")
    // exact verification on the candidate set only — native codegen'd
    // expression in the hot loop (graft.functions.ArrayJaccard)
    withTexts
      .withColumn("jaccard", graft.functions.ArrayJaccard(
        shingles(col("ta"), n), shingles(col("tb"), n)))
      .filter(col("jaccard") >= threshold)
      .select(col("ida"), col("idb"), col("jaccard"))
  }

  /** Banded MinHash frame (id, band, bucket) — the reusable LSH "index" of a
    * corpus, PlanCache-served so repeated calls (and the multiple plan
    * branches of a pair join) never retrain the 128-aggregate signature
    * computation. */
  private def bandedFrame(docs: DataFrame, n: Int, numHashes: Int, bands: Int,
      idCol: String, textCol: String): DataFrame = {
    val rows = numHashes / bands
    graft.core.PlanCache.cached(docs.sparkSession,
      graft.core.PlanCache.key("minhash-banded", docs, n, numHashes, bands, idCol, textCol)) {
      minHashSignatures(docs, n, numHashes, idCol = idCol, textCol = textCol)
        .select(col("id"),
          posexplode(transform(sequence(lit(0), lit(bands - 1)),
            b => xxhash64(concat_ws(",", slice(col("sig"), b * lit(rows) + 1, lit(rows)))))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    }
  }

  /** Near-dup pairs of `incoming` AGAINST an existing corpus — the
    * incremental-ingest dedup shape (dedupe today's crawl against what the
    * store already holds, instead of re-running the corpus×corpus join).
    * Same signature/band/verify machinery as [[minHashLshPairs]], but
    * candidates come from the CROSS-side bucket join only: no
    * corpus×corpus and no incoming×incoming candidate work. Rows whose ids
    * coincide across sides (re-ingested documents) are excluded. Returns
    * (in_id, corpus_id, jaccard).
    *
    * Scale: the corpus banded frame — |corpus|·bands rows of
    * (id, band, bucket) — is the persistent index, PlanCache-served across
    * batches (the MinHash analogue of the persisted IVF-PQ codes); each
    * batch shuffles only its own bands plus colliding corpus buckets.
    * Heavy corpus buckets are capped like the self-join. */
  def nearDupAgainst(corpus: DataFrame, incoming: DataFrame, threshold: Double,
      n: Int = 3, numHashes: Int = 128, bands: Int = 32,
      idCol: String = "doc_id", textCol: String = "text",
      maxBucketSize: Long = 100000L): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val corpusBanded = bandedFrame(corpus, n, numHashes, bands, idCol, textCol)
    val inBanded = bandedFrame(incoming, n, numHashes, bands, idCol, textCol)
    val heavy = corpusBanded.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("bsz")).filter(col("bsz") > maxBucketSize)
      .select(col("band"), col("bucket"))
    // unbounded heavy-bucket set: AQE-decided join, no forced broadcast
    val a = inBanded.join(heavy, Seq("band", "bucket"), "left_anti")
      .select(col("band"), col("bucket"), col("id").as("in_id"))
    val b = corpusBanded.join(heavy, Seq("band", "bucket"), "left_anti")
      .select(col("band"), col("bucket"), col("id").as("corpus_id"))
    val candidates = a.join(b, Seq("band", "bucket"))
      .filter(col("in_id") =!= col("corpus_id"))
      .select(col("in_id"), col("corpus_id"))
      .dropDuplicates("in_id", "corpus_id")
    val inTexts = incoming.select(col(idCol).as("__iid"), col(textCol).as("ta"))
    val corpusTexts = corpus.select(col(idCol).as("__cid"), col(textCol).as("tb"))
    candidates
      .join(inTexts, col("in_id") === col("__iid")).drop("__iid")
      .join(corpusTexts, col("corpus_id") === col("__cid")).drop("__cid")
      .withColumn("jaccard", graft.functions.ArrayJaccard(
        shingles(col("ta"), n), shingles(col("tb"), n)))
      .filter(col("jaccard") >= threshold)
      .select(col("in_id"), col("corpus_id"), col("jaccard"))
  }

  /** End-to-end near-dup removal: candidate pairs (MinHash-LSH, verified) →
    * transitive closure via GraphX connected components (near-duplication is
    * not transitive, but dedup must be — the standard cluster-then-keep-one) →
    * survivors = min doc id per component plus all unpaired docs.
    * Returns the deduplicated documents. */
  def dedupDocuments(docs: DataFrame, threshold: Double, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val pairs = minHashLshPairs(docs, threshold, n, idCol = idCol, textCol = textCol)
    survivorsByPairs(docs, pairs, idCol)
  }

  /** GraphX connected components over the candidate PAIR graph only (never
    * the full corpus — unpaired rows skip the RDD bridge entirely), as an
    * (id, component) frame. The one RDD bridge shared by every dedup family
    * (MinHash, SimHash, semantic/embedding) and both survivor policies. */
  private def pairComponents(pairs: DataFrame): DataFrame = {
    import org.apache.spark.graphx.{Edge => GxEdge, Graph => GxGraph}
    val spark = pairs.sparkSession
    // cast up front: an Int (or other integral) id column satisfies the
    // generic signature but would ClassCastException on getLong in the bridge
    val edgeRdd = pairs.select(col("ida").cast(LongType), col("idb").cast(LongType)).rdd
      .map(r => GxEdge(r.getLong(0), r.getLong(1), ()))
    val cc = GxGraph.fromEdges(edgeRdd, ()).connectedComponents().vertices
    spark.createDataFrame(cc.map { case (id, comp) => (id, comp) })
      .toDF("id", "component")
  }

  /** Duplicate-cluster size histogram — the standard dedup REPORT (every
    * public dedup writeup leads with "X% of the corpus sits in clusters of
    * size ≥ k"): near-dup pairs at `threshold` → connected components →
    * (cluster_size, n_clusters), with unpaired documents counted as size-1
    * clusters so the histogram partitions the whole corpus
    * (Σ size·count = |docs|). Same pair/CC machinery as [[dedupDocuments]];
    * the histogram itself is two constant-width aggregates. */
  def dedupStats(docs: DataFrame, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val comps = pairComponents(minHashLshPairs(docs, threshold, idCol = idCol, textCol = textCol))
    val clustered = comps.groupBy(col("component")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
    val singles = docs.select(col(idCol).as("id"))
      .join(comps, Seq("id"), "left_anti")
      .agg(count(lit(1)).as("n_clusters"))
      .select(lit(1L).as("cluster_size"), col("n_clusters"))
    // the singles branch aggregates without a groupBy, so a fully-paired
    // corpus still yields one (1, 0) row — drop empty buckets so the report
    // never carries a zero-count line
    clustered.unionAll(singles)
      .groupBy(col("cluster_size")).agg(sum(col("n_clusters")).as("n_clusters"))
      .filter(col("n_clusters") > 0)
  }

  /** Cross-source duplication matrix — near-dup PAIR counts bucketed by the
    * (source, source) pair of their endpoints (sources ordered so each
    * unordered pair lands in one cell). The standard provenance report when
    * assembling a mixture: off-diagonal cells expose one source mirroring
    * another (scraped copies, shared upstream), diagonal cells in-source
    * duplication. Same pair machinery as [[dedupDocuments]]; the matrix is
    * one constant-width aggregate over the pairs. */
  def crossSourceDupMatrix(docs: DataFrame, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    val src = docs.select(col(idCol).as("__id"), col(sourceCol).as("__s"))
    minHashLshPairs(docs, threshold, idCol = idCol, textCol = textCol)
      .join(src.withColumnRenamed("__s", "sa"), col("ida") === col("__id")).drop("__id")
      .join(src.withColumnRenamed("__s", "sb"), col("idb") === col("__id")).drop("__id")
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Keep-one-per-duplicate-group: components over the candidate pairs, then
    * anti-join away every paired id that is not its component's minimum. */
  def survivorsByPairs(data: DataFrame, pairs: DataFrame, idCol: String): DataFrame = {
    val ccDf = pairComponents(pairs)
    val losers = ccDf // every paired element that is not its component's minimum
      .groupBy(col("component")).agg(min(col("id")).as("keep"))
      .join(ccDf, Seq("component"))
      .filter(col("id") =!= col("keep"))
      .select(col("id"))
    data.join(losers, data(idCol) === losers("id"), "left_anti")
  }

  /** Loser → survivor REMAP TABLE — the entity-resolution artifact
    * downstream systems need after dedup (every reference to a dropped
    * duplicate re-points at its cluster's survivor): near-dup pairs at
    * `threshold` → connected components → one (loser, survivor) row per
    * dropped document, survivor = the component's min id (the
    * [[dedupDocuments]] selection). Unpaired documents emit no row — the
    * identity majority never materializes.
    *
    * Scale: the map is pairs-sized (the CC runs on candidate pairs only),
    * never corpus-sized; survivors come from one map-side-combinable min
    * per component. */
  def survivorMap(docs: DataFrame, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val comps = pairComponents(
      minHashLshPairs(docs, threshold, idCol = idCol, textCol = textCol))
    comps.groupBy(col("component")).agg(min(col("id")).as("survivor"))
      .join(comps, Seq("component"))
      .filter(col("id") =!= col("survivor"))
      .select(col("id").as("loser"), col("survivor"))
  }

  /** Survivor selection by PRIORITY instead of min-id: within each duplicate
    * component keep the row maximizing `priority` (ties → smallest id) —
    * "keep the best-quality / longest copy", the selection real corpus
    * pipelines want. Same CC bridge as survivorsByPairs; the argmax is one
    * map-side-combinable max_by over the (small) paired-id set. */
  def survivorsByPriority(data: DataFrame, pairs: DataFrame, idCol: String,
      priority: Column): DataFrame = {
    val withP = pairComponents(pairs).join(
      data.select(col(idCol).cast(LongType).as("id"), priority.as("__p")), Seq("id"))
    val losers = withP
      .groupBy(col("component"))
      .agg(max_by(col("id"), struct(col("__p"), (-col("id")).as("__nid"))).as("keep"))
      .join(withP, Seq("component"))
      .filter(col("id") =!= col("keep"))
      .select(col("id"))
    data.join(losers, data(idCol) === losers("id"), "left_anti")
  }

  // ---------------- SimHash ----------------

  /** Token hash on the LOW 48 BITS of md5 — engine-portable (DuckDB computes
    * the identical value as `('0x' || substr(md5(w), 21, 12))::BIGINT`), so
    * SimHash built on it is exactly oracle-checkable across engines. The
    * default xxhash64 family is faster; this one buys cross-engine equality. */
  val md5Hash48: Column => Column =
    w => conv(substring(md5(w), 21, 12), 16, 10).cast(LongType)

  /** `bits`-wide SimHash fingerprints as a DataFrame (id, fp): per bit, sum
    * +w/-w of each distinct token's weight (its count) by whether the
    * token-hash bit is set; fingerprint bit = sign of the sum.
    *
    * Same scale formulation as minHashSignatures: explode tokens once, count
    * weights with one aggregation, then `bits` codegen'd conditional-sum
    * aggregates — all map-side combinable, no interpreted higher-order
    * expressions in the hot path. */
  def simHashes(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", bits: Int = 64,
      tokenHash: Column => Column = xxhash64(_)): DataFrame = {
    require(bits > 0 && bits <= 64)
    val base = docs.select(col(idCol).as("id"), col(textCol).as("text"))
    val tok = base.select(col("id"), explode(words(col("text"))).as("w"))
    val weighted = tok.groupBy(col("id"), col("w"))
      .agg(count(lit(1)).as("wgt"))
      .withColumn("__h", tokenHash(col("w")))
    val bitAggs = (0 until bits).map { i =>
      sum(when(shiftright(col("__h"), i).bitwiseAND(1) === 1, col("wgt"))
        .otherwise(-col("wgt"))).as(s"__b$i")
    }
    weighted.groupBy(col("id")).agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("id"),
        (0 until bits).map(i =>
          when(col(s"__b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
          .reduce(_ + _).as("fp"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, found by the
    * standard band trick: split the `bits`-wide fingerprint into bits/16
    * 16-bit bands; any pair within distance ≤ pieces-1 must collide on ≥1
    * band (so with maxHamming ≤ pieces-1 the output is exactly the set of
    * all pairs within the distance — band-independent and oracle-checkable).
    * Verification = bit_count(xor) on candidates. */
  def simHashPairs(docs: DataFrame, maxHamming: Int = 3,
      idCol: String = "doc_id", textCol: String = "text", bits: Int = 64,
      tokenHash: Column => Column = xxhash64(_)): DataFrame = {
    require(bits % 16 == 0, "bits must be a multiple of the 16-bit band width")
    val pieces = bits / 16
    val fp = simHashes(docs, idCol, textCol, bits, tokenHash)
    // cached for the same reason as minHashLshPairs: both sides of the band
    // self-join would re-run the 64-aggregate fingerprint computation
    // (bounded LRU — repeated calls reuse, no per-call leak)
    val banded = graft.core.PlanCache.cached(docs.sparkSession,
      // the rendered hash expression distinguishes token-hash families
      graft.core.PlanCache.key("simhash-banded", docs, bits, idCol, textCol,
        tokenHash(col("w")).toString)) {
      fp.select(col("id"), col("fp"),
        posexplode(array((0 until pieces).map(b =>
          pmod(shiftrightunsigned(col("fp"), b * 16), lit(65536L))): _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    }
    val a = banded.select(col("band"), col("bucket"), col("id").as("ida"), col("fp").as("fpa"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("idb"), col("fp").as("fpb"))
    a.join(b, Seq("band", "bucket")).filter(col("ida") < col("idb"))
      .dropDuplicates("ida", "idb")
      .withColumn("hamming", bit_count(col("fpa").bitwiseXOR(col("fpb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("ida"), col("idb"), col("hamming"))
  }
}
