package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (exact). Scale path: IVF — coarse
  * quantization into `nlist` buckets by nearest centroid, query probes the
  * `nprobe` nearest buckets only, turning the O(|Q|·|V|) cross product into
  * O(|Q|·|V|·nprobe/nlist) with a shuffle keyed by bucket id. An LSH variant
  * (random hyperplane signs) is provided for threshold joins.
  *
  * All math happens in double precision via higher-order array functions
  * (zip_with + aggregate) — codegen'd, no UDFs, no data movement beyond the
  * stated joins.
  */
object Similarity {

  /** Dot product of two array columns in double precision — a native codegen
    * Expression (graft.functions.ArrayDot) with the same left-to-right fold
    * semantics as `aggregate(zip_with(...))`, which is interpreted
    * (CodegenFallback) and pays closure dispatch per element. */
  def dot(a: Column, b: Column): Column = graft.functions.ArrayDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, 0 for zero vectors. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b); val na = norm(a); val nb = norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(d / (na * nb))
  }

  /** Scale guard for the EXACT quadratic diagnostic kernels
    * ([[bruteForceTopK]], [[cosinePairs]], [[hardNegatives]]): every input
    * side must be at or under `spark.graft.exactPairs.maxRows` (default 2M)
    * rows or the call fails loudly BEFORE any cartesian is scheduled. The
    * exact kernels are correctness baselines and quality-sheet ground
    * truth; their production twins ([[ivfPqTopK]], [[lshCosinePairs]],
    * [[semanticPairs]]) are bucketed — this cap turns "pointed the baseline
    * at the full corpus" from a cluster-killer into an immediate error.
    * Raise the conf deliberately for a bigger diagnostic. The guard's own
    * cost is bounded: a `limit(cap+1)` count never scans an over-cap side
    * past its first cap+1 rows. */
  private def requireExactScale(op: String, sides: (String, DataFrame)*): Unit = {
    val spark = sides.head._2.sparkSession
    val cap = spark.conf.get("spark.graft.exactPairs.maxRows", "2000000").toLong
    // A cap at or above Int.MaxValue is explicitly "guard off": the limit()
    // probe clamps to Int range, so such a cap could never fail the check —
    // skip the two probe jobs instead of running a vacuous guard.
    if (cap >= Int.MaxValue.toLong) return
    sides.foreach { case (role, df) =>
      val probe = (cap + 1L).toInt
      val n = df.limit(probe).count()
      require(n <= cap,
        s"$op: exact pair kernel is quadratic and the $role side exceeds " +
          s"spark.graft.exactPairs.maxRows=$cap rows — sample the input, or " +
          "use the bucketed twin (ivfPqTopK / lshCosinePairs / semanticPairs), " +
          "or raise the cap deliberately for a large diagnostic run")
    }
  }

  /** Exact brute-force cosine top-k: every query row against every data row,
    * per-query Window top-k. The data side is broadcast when small; at scale
    * prefer ivfTopK. Returns (qid, nid, rank, cos). Self-matches excluded.
    * Conf-capped via [[requireExactScale]] — a diagnostic baseline, not the
    * production path. */
  def bruteForceTopK(data: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    requireExactScale("bruteForceTopK", "data" -> data, "queries" -> queries)
    val d = data.select(col(idCol).as("nid"), col(vecCol).as("dvec"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val scored = q.crossJoin(d)
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("qvec"), col("dvec")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("cos"))
  }

  /** Exact cosine RANGE search (threshold query) — top-k's dual: every
    * (query, corpus) pair with cosine ≥ `threshold`, the shape
    * recommendation/retrieval pipelines use when the match COUNT matters
    * more than a fixed k. Returns (qid, nid); self-matches excluded.
    *
    * Scale: the query side BROADCASTS (range search is a small-queries
    * operation by construction) and the corpus is scanned ONCE with the
    * filter applied map-side — zero shuffle, no Q×corpus materialization
    * beyond the streamed filter. For corpus-scale query sets use
    * [[lshCosinePairs]] (self-join) or [[ivfPqTopK]] with a post-filter. */
  def rangeSearch(data: DataFrame, queries: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val d = data.select(col(idCol).as("nid"), col(vecCol).as("dvec"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    d.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("nid") &&
        cosine(col("qvec"), col("dvec")) >= threshold)
      .select(col("qid"), col("nid"))
  }

  /** Deterministic INITIAL coarse centroids: a HASH-SAMPLED seed — the
    * `nlist` vectors with the smallest `md5(id)` digest (id tie-break). An
    * id-ordered seed ("first nlist by id") collapses when ids correlate with
    * content (a corpus sorted by topic puts every seed in one true cluster);
    * md5 order is a uniform pseudo-random draw independent of id order, yet
    * fully deterministic and seedless, so a cross-engine SQL oracle mirrors
    * it verbatim (`ORDER BY md5(CAST(id AS VARCHAR))` — both engines emit
    * lowercase hex over identical decimal renderings of the id). cid is the
    * hash-order rank (0-based). The nlist-row window is a single tiny
    * partition, not a scale concern; the hash sort itself is a top-k
    * (TakeOrdered), never a full sort. Refined by [[kMeansCentroids]]. */
  def centroids(data: DataFrame, nlist: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val h = md5(col(idCol).cast("string").cast("binary"))
    data.select(col(idCol), col(vecCol), h.as("__h"))
      .orderBy(col("__h"), col(idCol)).limit(nlist)
      // partitionBy(lit(0)): the frame is already nlist rows (tiny) — the
      // explicit constant partition key silences Spark's "No Partition
      // Defined" warning without changing the single-partition plan
      .select((row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
          .orderBy(col("__h"), col(idCol))) - 1).as("cid"),
        col(vecCol).as("cvec"))
  }

  /** Deterministic spherical k-means (Lloyd) coarse quantizer: seeded by the
    * hash-sampled draw of [[centroids]], then `rounds` FIXED
    * reassign/recenter iterations (fixed, not converge-until-stable, so a
    * cross-engine oracle can mirror the exact computation round by round).
    *
    * Each round: nearest-centroid assignment by cosine (ties → lowest cid,
    * identical to [[assign]]), then per-dimension mean with DECIMAL
    * accumulation (order-insensitive, same recipe as [[meanPool]]) rounded to
    * 6 dp — the rounding pins the centroid doubles to values every engine
    * reproduces bit-identically, so downstream cosine comparisons cannot be
    * flipped by last-ulp division differences. Empty clusters drop out (a
    * GROUP BY mirrors this for free).
    *
    * Scale shape: one data pass per round — nearest-centroid is a broadcast
    * crossJoin against the nlist-row frame collapsed map-side by the argmax
    * agg; the recenter is one (cid, dim)-keyed partial-agg shuffle of
    * constant width. Centroids materialize on the driver between rounds
    * (nlist × dim doubles — a bounded control read, the standard iterative
    * k-means shape) so the per-round plans stay flat instead of nesting
    * `rounds` deep. */
  def kMeansCentroids(data: DataFrame, nlist: Int, rounds: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = data.sparkSession
    var cents = centroids(data, nlist, idCol, vecCol)
    for (_ <- 0 until rounds) {
      val means = assign(data, cents, idCol, vecCol)
        .select(col("cid"), posexplode(col(vecCol)).as(Seq("dim", "v")))
        .groupBy(col("cid"), col("dim"))
        .agg(round(sum(col("v").cast(DecimalType(27, 10))).cast(DoubleType) /
          count(lit(1)), 6).as("m"))
        .groupBy(col("cid"))
        // array_sort on struct(dim, m): dim is distinct per cid, so the
        // collect_list order never matters — fully deterministic
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("cid"), transform(col("dm"), x => x("m")).as("cvec"))
      val rows = means.collect() // ≤ nlist rows — driver-bounded control read
      cents = spark.createDataFrame(java.util.Arrays.asList(rows: _*), means.schema)
    }
    cents
  }

  /** Assign every vector to its nearest centroid: one broadcast join, then
    * an argmax AGGREGATE (`max_by` over (sim, −cid)) rather than a rank-1
    * window — the window formulation would shuffle the nlist×-amplified
    * candidate frame by id before discarding all but one row per vector;
    * the hash-agg collapses candidates map-side (broadcast keeps them
    * colocated), so only one row per vector ever reaches the shuffle.
    * Tie-break: highest sim, then lowest cid (−cid max) — identical to the
    * previous window order and to the SQL oracle's rank-1. */
  def assign(data: DataFrame, cents: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    data.crossJoin(broadcast(cents))
      .withColumn("sim", cosine(col(vecCol), col("cvec")))
      .groupBy(col(idCol))
      .agg(
        first(col(vecCol)).as(vecCol), // constant per group
        max_by(col("cid"), struct(col("sim"), (-col("cid")).cast("int"))).as("cid"))
      .select(col(idCol), col(vecCol), col("cid"))

  /** Spherical product quantization (PQ) encode — the memory-compression
    * half of the public IVF-PQ recipe (Jégou et al., "Product Quantization
    * for Nearest Neighbor Search"): the vector splits into `m` contiguous
    * subvectors; each subspace trains its own `k`-entry codebook with the
    * SAME deterministic spherical k-means as the IVF quantizer
    * ([[kMeansCentroids]] — hash-sampled seed, fixed Lloyd rounds, DECIMAL
    * means, so a cross-engine oracle mirrors every subspace verbatim); each
    * vector encodes as its nearest-codeword id per subspace. A 64-dim float
    * vector (256 B) compresses to m small ints. Spherical (cosine)
    * assignment rather than L2 — consistent with the engine's cosine-centric
    * similarity stack; same argmax-aggregate shape as [[assign]], no window.
    *
    * Returns (idCol, code0..code{m-1}) — codes as plain int columns. Scale:
    * per subspace, the codebook train is the bounded iterative k-means shape
    * and the encode is one broadcast-argmax pass; the m results join on id
    * (m is small and fixed; at 10¹⁰ rows each join is id-keyed and
    * AQE-planned). */
  def pqEncode(data: DataFrame, m: Int = 2, k: Int = 8, rounds: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dim = vecDim(data, vecCol)
    require(dim % m == 0, s"PQ: dim $dim not divisible into $m subspaces")
    val sub = dim / m
    (0 until m).map { s =>
      val sliced = data.select(col(idCol), slice(col(vecCol), s * sub + 1, sub).as(vecCol))
      val cents = pqCodebook(data, sliced, s, sub, k, rounds, idCol, vecCol)
      assign(sliced, cents, idCol, vecCol).select(col(idCol), col("cid").as(s"code$s"))
    }.reduce(_.join(_, Seq(idCol)))
  }

  /** PQ decode — reconstruct each vector from its codes as the concatenation
    * of its per-subspace codewords (the quantizer's approximation, exactly
    * what ADC scores against). Reconstruction is EXACT given the codebooks:
    * codeword components are 6-dp-rounded decimal means by construction
    * ([[kMeansCentroids]]), so the decoded values are bit-identical across
    * engines — a cross-engine oracle compares them directly, no tolerance.
    * Returns (idCol, vecCol) with the reconstructed array<double>.
    * Scale: m broadcast joins of the code columns against k-row codebooks —
    * no shuffle of the corpus beyond the encode itself. */
  def pqDecode(data: DataFrame, m: Int = 2, codes: Int = 8, rounds: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dim = vecDim(data, vecCol)
    require(dim % m == 0, s"PQ: dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val enc = pqEncode(data, m, codes, rounds, idCol, vecCol)
    (0 until m).foldLeft(enc) { (acc, s) =>
      val sliced = data.select(col(idCol), slice(col(vecCol), s * sub + 1, sub).as(vecCol))
      val cents = pqCodebook(data, sliced, s, sub, codes, rounds, idCol, vecCol)
      acc.join(broadcast(cents.select(col("cid").as(s"code$s"),
        col("cvec").as(s"__c$s"))), Seq(s"code$s"))
    }.select(col(idCol),
      concat((0 until m).map(s => col(s"__c$s")): _*).as(vecCol))
  }

  /** Per-subspace PQ codebook, served from the bounded PlanCache so one
    * input trains each subspace ONCE per session — pqEncode and the ADC
    * lookup-table builds (pqTopK / ivfPqTopK) share the same key and
    * therefore the same trained codebook instead of retraining the
    * dominant index-build stage twice per search call. */
  private def pqCodebook(data: DataFrame, sliced: DataFrame, s: Int, sub: Int,
      k: Int, rounds: Int, idCol: String, vecCol: String): DataFrame =
    graft.core.PlanCache.cached(data.sparkSession,
      graft.core.PlanCache.key("pq-cents", data, s, sub, k, rounds, idCol, vecCol)) {
      kMeansCentroids(sliced, k, rounds, idCol, vecCol)
    }

  /** PQ asymmetric-distance top-k (ADC — the search half of IVF-PQ): the
    * corpus is represented ONLY by its PQ codes; each query builds an
    * m × k lookup table of cosine similarities between its subvectors and
    * every codeword, and a candidate's score is the sum of its m looked-up
    * entries — the classic ADC estimate, never touching corpus vectors at
    * query time. Approximate by construction; [[bruteForceTopK]] is the
    * exactness baseline in tests.
    *
    * Determinism: the summed score adds the m lookups in FIXED subspace
    * order inside one projection (not an aggregate), and ranking tie-breaks
    * (score desc, id asc) — so a cross-engine oracle orders identically.
    *
    * Scale: codebooks and the per-query lookup tables are ≤ |Q|·m·k rows —
    * broadcast; the only corpus-sized work is m broadcast-hash joins keyed
    * on the code columns and one per-query top-k window over |Q|·|corpus|
    * scored rows, the same shape (and cost ceiling) as bruteForceTopK but
    * over code lookups instead of dim-wide dot products. */
  def pqTopK(data: DataFrame, queries: DataFrame, k: Int, m: Int = 2,
      codes: Int = 8, rounds: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dim = vecDim(data, vecCol)
    require(dim % m == 0, s"PQ: dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val encoded = pqEncode(data, m, codes, rounds, idCol, vecCol)
    val scored = (0 until m).foldLeft(
      queries.select(col(idCol).as("qid")).crossJoin(encoded)) { (acc, s) =>
      val sliced = data.select(col(idCol), slice(col(vecCol), s * sub + 1, sub).as(vecCol))
      val cents = pqCodebook(data, sliced, s, sub, codes, rounds, idCol, vecCol)
      // per-query lookup table: sim(query subvector, codeword) for all k
      // codewords — |Q|·k rows, broadcast into the code join
      val lut = queries
        .select(col(idCol).as("qid"), slice(col(vecCol), s * sub + 1, sub).as("qsub"))
        .crossJoin(broadcast(cents))
        .select(col("qid"), col("cid").as(s"code$s"),
          cosine(col("qsub"), col("cvec")).as(s"sim$s"))
      acc.join(broadcast(lut), Seq("qid", s"code$s"))
    }
    val score = (0 until m).map(s => col(s"sim$s")).reduce(_ + _) // fixed order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(score.desc, col(idCol).asc)
    scored.filter(col("qid") =!= col(idCol))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col(idCol).as("nid"), col("rank"))
  }

  /** IVF top-k: probe only the `nprobe` buckets whose centroids are nearest
    * to the query. Approximate (recall < 1 when a true neighbor lives in an
    * unprobed bucket); bruteForceTopK is the exactness oracle in tests. */
  def ivfTopK(data: DataFrame, queries: DataFrame, k: Int, nlist: Int = 16,
      nprobe: Int = 4, idCol: String = "vec_id", vecCol: String = "embedding",
      kmeansRounds: Int = 2): DataFrame = {
    // nlist rows, referenced from two broadcast branches — served from the
    // bounded per-session LRU (reuse across calls, no per-call cache leak)
    val cents = graft.core.PlanCache.cached(data.sparkSession,
      graft.core.PlanCache.key("ivf-cents", data, nlist, idCol, vecCol, kmeansRounds)) {
      kMeansCentroids(data, nlist, kmeansRounds, idCol, vecCol)
    }
    val bucketed = assign(data, cents, idCol, vecCol)
      .select(col(idCol).as("nid"), col(vecCol).as("dvec"), col("cid"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val probeW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("csim").desc, col("cid").asc)
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("csim", cosine(col("qvec"), col("cvec")))
      .withColumn("rn", row_number().over(probeW)).filter(col("rn") <= nprobe)
      .select(col("qid"), col("qvec"), col("cid"))
    val scored = probes.join(bucketed, Seq("cid")) // shuffle keyed by bucket
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("qvec"), col("dvec")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("cos"))
  }

  /** ANN index-quality report — recall@k of [[ivfTopK]]'s probed candidates
    * against the exact [[bruteForceTopK]] answer, the evaluation every
    * production vector index ships with (tuning nlist/nprobe IS reading
    * this table). Per query: hit count, exact-answer size (can be < k on a
    * small corpus) and recall ×10⁶ = hits·10⁶ DIV n_exact, plus one
    * micro-averaged summary row at qid = −1 (Σhits over Σexact). Exact
    * integer arithmetic end to end — the set intersection is a semi-join,
    * so the report is oracle-checkable like everything else.
    *
    * Cost = one brute pass over (queries × corpus) + one IVF search — the
    * brute side is the evaluation's price and is why recall reports run on
    * a query SAMPLE at scale (pass a sampled `queries`). */
  def annRecall(data: DataFrame, queries: DataFrame, k: Int, nlist: Int = 16,
      nprobe: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val exact = bruteForceTopK(data, queries, k, idCol, vecCol)
      .select(col("qid"), col("nid"))
    val approx = ivfTopK(data, queries, k, nlist, nprobe, idCol, vecCol)
      .select(col("qid"), col("nid"))
    val ex = exact.groupBy(col("qid")).agg(count(lit(1)).as("n_exact"))
    val hits = exact.join(approx, Seq("qid", "nid"), "left_semi")
      .groupBy(col("qid")).agg(count(lit(1)).as("hits"))
    // checkpoint: `per` feeds both the row output and the summary aggregate —
    // without it the brute-force pass (the expensive side) could plan twice
    val per = ex.join(hits, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("hits"), lit(0L)).as("hits"), col("n_exact"))
      .withColumn("recall_x1e6", expr("hits * 1000000L DIV n_exact"))
      .localCheckpoint(false)
    per.unionByName(per.agg(sum(col("hits")).as("__h"), sum(col("n_exact")).as("__n"))
      .select(lit(-1L).as("qid"), col("__h").as("hits"), col("__n").as("n_exact"),
        expr("__h * 1000000L DIV __n").as("recall_x1e6")))
  }

  /** IVF-PQ top-k — the full production ANN composition (Jégou et al.):
    * a coarse quantizer restricts candidates to the query's `nprobe` nearest
    * buckets (IVF), and candidates are scored from their PQ codes via the
    * per-query lookup tables (ADC) — corpus vectors are touched ONLY at
    * index-build time, never per query. Composes [[kMeansCentroids]]/
    * [[assign]] (coarse), [[pqEncode]] (codes) and the [[pqTopK]] scoring
    * shape (fixed-order summed lookups, ties → id).
    *
    * Scale: this is the shape that works at 10¹⁰ vectors — the per-query
    * candidate set is |corpus|·nprobe/nlist rows of CODES (m small ints, not
    * dim floats), reached by one bucket-keyed equi-join; LUTs and centroids
    * broadcast; no |Q|×|corpus| frame ever exists (unlike [[pqTopK]], whose
    * cross join is the declared didactic baseline). */
  def ivfPqTopK(data: DataFrame, queries: DataFrame, k: Int, nlist: Int = 16,
      nprobe: Int = 4, m: Int = 2, codes: Int = 8, rounds: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dim = vecDim(data, vecCol)
    require(dim % m == 0, s"PQ: dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val coarse = graft.core.PlanCache.cached(data.sparkSession,
      graft.core.PlanCache.key("ivf-cents", data, nlist, idCol, vecCol, rounds)) {
      kMeansCentroids(data, nlist, rounds, idCol, vecCol)
    }
    val bucketed = assign(data, coarse, idCol, vecCol)
      .select(col(idCol), col("cid").as("bucket"))
    val encoded = pqEncode(data, m, codes, rounds, idCol, vecCol)
      .join(bucketed, Seq(idCol))
    val probeW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("csim").desc, col("bucket").asc)
    val probes = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
      .crossJoin(broadcast(coarse.select(col("cid").as("bucket"), col("cvec"))))
      .withColumn("csim", cosine(col("qvec"), col("cvec")))
      .withColumn("rn", row_number().over(probeW)).filter(col("rn") <= nprobe)
      .select(col("qid"), col("bucket"))
    val candidates = probes.join(encoded, Seq("bucket")) // bucket-keyed join
    val scored = (0 until m).foldLeft(candidates) { (acc, s) =>
      val sliced = data.select(col(idCol), slice(col(vecCol), s * sub + 1, sub).as(vecCol))
      val cents = pqCodebook(data, sliced, s, sub, codes, rounds, idCol, vecCol)
      val lut = queries
        .select(col(idCol).as("qid"), slice(col(vecCol), s * sub + 1, sub).as("qsub"))
        .crossJoin(broadcast(cents))
        .select(col("qid"), col("cid").as(s"code$s"),
          cosine(col("qsub"), col("cvec")).as(s"sim$s"))
      acc.join(broadcast(lut), Seq("qid", s"code$s"))
    }
    val score = (0 until m).map(s => col(s"sim$s")).reduce(_ + _) // fixed order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(score.desc, col(idCol).asc)
    scored.filter(col("qid") =!= col(idCol))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col(idCol).as("nid"), col("rank"))
  }

  /** Persist a trained IVF-PQ index as a disk layout a search fleet reads
    * WITHOUT retraining — the missing production half of [[ivfPqTopK]]
    * (which trains per session):
    *   - `codes/`     one row per vector (id, code0..code{m-1}), PARTITIONED
    *                  BY the coarse bucket, so a search's nprobe buckets
    *                  prune at FILE-LISTING time (static or dynamic
    *                  partition pruning — |corpus|·nprobe/nlist bytes read,
    *                  the rest never opened);
    *   - `coarse/`    the nlist coarse centroids;
    *   - `codebooks/` the m × k PQ codewords (subspace, cid, cvec);
    *   - `meta/`      a 1-row parquet of the build parameters.
    * Training is the same deterministic pipeline as [[ivfPqTopK]]
    * (hash-seeded k-means, decimal means), so [[searchIvfPqIndex]] over the
    * persisted layout returns EXACTLY what the in-session composition
    * returns — the index is a materialization, not an approximation. At
    * 10¹⁰ vectors the codes table is the only corpus-sized artifact
    * (m ints + id per row); centroids and codebooks are KBs. */
  def writeIvfPqIndex(data: DataFrame, path: String, nlist: Int = 16,
      m: Int = 2, codes: Int = 8, rounds: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = data.sparkSession
    val dim = vecDim(data, vecCol)
    require(dim % m == 0, s"PQ: dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val coarse = graft.core.PlanCache.cached(spark,
      graft.core.PlanCache.key("ivf-cents", data, nlist, idCol, vecCol, rounds)) {
      kMeansCentroids(data, nlist, rounds, idCol, vecCol)
    }
    val bucketed = assign(data, coarse, idCol, vecCol)
      .select(col(idCol), col("cid").as("bucket"))
    pqEncode(data, m, codes, rounds, idCol, vecCol)
      .join(bucketed, Seq(idCol))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/codes")
    coarse.write.mode("overwrite").parquet(s"$path/coarse")
    (0 until m).map { s =>
      val sliced = data.select(col(idCol), slice(col(vecCol), s * sub + 1, sub).as(vecCol))
      pqCodebook(data, sliced, s, sub, codes, rounds, idCol, vecCol)
        .select(lit(s).as("subspace"), col("cid"), col("cvec"))
    }.reduce(_ unionAll _)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
    import spark.implicits._
    Seq((nlist, m, codes, rounds, dim)).toDF("nlist", "m", "codes", "rounds", "dim")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    // a rebuilt index invalidates any cached frame that read the OLD layout
    graft.core.PlanCache.invalidatePath(spark, path)
  }

  /** INCREMENTAL index maintenance — append new vectors to a persisted
    * [[writeIvfPqIndex]] layout WITHOUT retraining: the frozen coarse
    * centroids bucket the batch, the frozen per-subspace codebooks encode
    * it, and the codes land as appended partitions of the same
    * bucket-partitioned layout. This is how production ANN indexes ingest
    * (retraining on every batch would re-encode the whole corpus);
    * quantization error drifts as the data distribution moves away from
    * the training corpus — rebuild when an [[annRecall]]-style sheet says
    * so. Search results after an append are identical to an index built
    * with the SAME codebooks over the union corpus.
    *
    * Scale: the batch never touches existing codes (pure partition
    * append); centroids and codebooks are broadcast-sized reads; encode is
    * m broadcast-argmax passes over the batch only. */
  def appendToIvfPqIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      newData: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val meta = spark.read.parquet(s"$path/meta").head
    val m = meta.getAs[Int]("m")
    val dim = meta.getAs[Int]("dim")
    val sub = dim / m
    val newDim = vecDim(newData, vecCol)
    require(newDim == dim,
      s"appendToIvfPqIndex: batch dim $newDim != index dim $dim")
    val coarse = spark.read.parquet(s"$path/coarse")
    val books = spark.read.parquet(s"$path/codebooks")
    val bucketed = assign(newData, coarse, idCol, vecCol)
      .select(col(idCol), col("cid").as("bucket"))
    (0 until m).map { s =>
      val sliced = newData.select(col(idCol),
        slice(col(vecCol), s * sub + 1, sub).as(vecCol))
      assign(sliced, books.filter(col("subspace") === s)
          .select(col("cid"), col("cvec")), idCol, vecCol)
        .select(col(idCol), col("cid").as(s"code$s"))
    }.reduce(_.join(_, Seq(idCol)))
      .join(bucketed, Seq(idCol))
      .write.mode("append").partitionBy("bucket").parquet(s"$path/codes")
    // appended partitions stale any cached read of the codes layout
    graft.core.PlanCache.invalidatePath(spark, s"$path/codes")
  }

  /** ANN search over a persisted [[writeIvfPqIndex]] layout: probe the
    * nprobe nearest coarse buckets (centroids broadcast), read ONLY those
    * buckets' code partitions (the bucket join is on the partition column —
    * Spark's dynamic partition pruning skips every other file), score via
    * broadcast per-query lookup tables in fixed subspace order, rank with
    * the usual (score desc, id asc) tie-break. Identical results to
    * [[ivfPqTopK]] with the same build parameters; corpus vectors are never
    * read at search time — only codes. */
  def searchIvfPqIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int, nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val meta = spark.read.parquet(s"$path/meta").head
    val m = meta.getAs[Int]("m")
    val dim = meta.getAs[Int]("dim")
    val sub = dim / m
    val coarse = spark.read.parquet(s"$path/coarse")
    val codebooks = spark.read.parquet(s"$path/codebooks")
    val encoded = spark.read.parquet(s"$path/codes")
    val probeW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("csim").desc, col("bucket").asc)
    val probes = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
      .crossJoin(broadcast(coarse.select(col("cid").as("bucket"), col("cvec"))))
      .withColumn("csim", cosine(col("qvec"), col("cvec")))
      .withColumn("rn", row_number().over(probeW)).filter(col("rn") <= nprobe)
      .select(col("qid"), col("bucket"))
    val candidates = probes.join(encoded, Seq("bucket"))
    val scored = (0 until m).foldLeft(candidates) { (acc, s) =>
      val cents = codebooks.filter(col("subspace") === s).select(col("cid"), col("cvec"))
      val lut = queries
        .select(col(idCol).as("qid"), slice(col(vecCol), s * sub + 1, sub).as("qsub"))
        .crossJoin(broadcast(cents))
        .select(col("qid"), col("cid").as(s"code$s"),
          cosine(col("qsub"), col("cvec")).as(s"sim$s"))
      acc.join(broadcast(lut), Seq("qid", s"code$s"))
    }
    val score = (0 until m).map(s => col(s"sim$s")).reduce(_ + _) // fixed order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(score.desc, col(idCol).asc)
    scored.filter(col("qid") =!= col(idCol))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col(idCol).as("nid"), col("rank"))
  }

  /** Hubness diagnostic — the in-degree histogram of the k-NN digraph (how
    * many vectors count each vector among their top-k). High-dimensional
    * embedding spaces grow "hub" points that appear in a disproportionate
    * share of neighbor lists and distort retrieval (a standard
    * embedding-quality check from the public ANN literature). Returns
    * (in_degree, n_vectors), zero-degree vectors included so the histogram
    * partitions the corpus. Exact top-k inside; at corpus scale swap the
    * brute-force kernel for [[ivfPqTopK]] candidates — the histogram shape
    * is identical arithmetic. */
  def hubness(data: DataFrame, k: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val indeg = bruteForceTopK(data, data, k, idCol, vecCol)
      .groupBy(col("nid")).agg(count(lit(1)).as("in_degree"))
    data.select(col(idCol).as("nid")).join(indeg, Seq("nid"), "left")
      .select(coalesce(col("in_degree"), lit(0L)).as("in_degree"))
      .groupBy(col("in_degree")).agg(count(lit(1)).as("n_vectors"))
  }

  /** Johnson–Lindenstrauss random projection — the standard cheap
    * dimensionality reduction before ANN / clustering (±1 directions
    * preserve pairwise distances within (1±ε) at outDim = O(ln n / ε²);
    * Achlioptas' database-friendly variant, public). Directions come from
    * the SAME seeded ±1 family as the LSH signatures ([[lshDirections]]),
    * so projections are deterministic and a cross-engine oracle inlines the
    * identical matrix. out[j] = Σᵢ vec[i]·dir[j][i] / √outDim, each term
    * DECIMAL-cast before the sum (order-insensitive exact accumulation, the
    * proven meanPool recipe) and the result rounded to 6 dp. Returns
    * per-dimension rows (idCol, dim, val).
    *
    * Cross-engine determinism: every step before the final double cast is
    * exact DECIMAL arithmetic. Elements pin to 6 dp as DOUBLES first (a
    * 6-dp-pinned double casts to decimal identically in every engine —
    * Spark rounds the shortest decimal repr, other engines the full binary
    * value, and the two only diverge on unpinned doubles); the ±1 sum is an
    * exact decimal; the 1/√outDim factor is the shared fixed-decimal literal
    * of [[invSqrtDecimal]] so the division is an exact decimal multiply; and
    * the final 6-dp rounding happens ON THE DECIMAL (both engines round
    * exact decimals half-away-from-zero identically — rounding a tie-adjacent
    * DOUBLE quotient is where engines disagree).
    *
    * Scale: the direction matrix broadcasts (outDim×d ints); the per-vector
    * explode is collapsed map-side by the (id, j) partial agg, so the
    * shuffle carries outDim rows per vector — constant width. */
  def randomProject(data: DataFrame, outDim: Int = 16, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dim = vecDim(data, vecCol)
    val dirs = lshDirections(dim, outDim, seed)
    val dirRows = for (j <- 0 until outDim; i <- 0 until dim)
      yield (j, i, dirs(j)(i).toInt) // ±1 as INT: decimal × int stays exact
    val spark = data.sparkSession
    import spark.implicits._
    val dirDf = broadcast(dirRows.toDF("j", "i", "s"))
    val inv = invSqrtDecimal(outDim)
    data.select(col(idCol), posexplode(col(vecCol)).as(Seq("i", "v")))
      .join(dirDf, Seq("i"))
      .groupBy(col(idCol), col("j"))
      .agg(round(sum(round(col("v").cast(DoubleType), 6).cast(DecimalType(16, 6)) * col("s"))
          .cast(DecimalType(sumPrecision(inv), 10)) * lit(inv), 6)
        .cast(DoubleType).as("val"))
      // Fail loudly instead of emitting a silent null: under non-ANSI mode a
      // sum past the ~10^(p-10) decimal headroom becomes NULL at the cast
      // (so would an all-null element group). Neither is a value this
      // function may return.
      .select(col(idCol), col("j").as("dim"),
        when(col("val").isNotNull, col("val")).otherwise(raise_error(concat(
          lit("randomProject: null projection for ("), col(idCol).cast("string"),
          lit(s", dim "), col("j").cast("string"),
          lit(s") — decimal sum overflowed DecimalType(${sumPrecision(inv)},10) " +
            "or the vector elements were all null")))).as("val"))
  }

  /** Widest sum precision (scale 10) whose product with the 1/√outDim
    * literal stays exact in BOTH engines (Spark: p₁+p₂+1 ≤ 38; DuckDB:
    * w₁+w₂ ≤ 38) — e.g. 24 digits (≈10¹⁴ headroom) against a 13-digit inv,
    * 35 against √16's stripped 0.25. A sum beyond the headroom overflows
    * the cast (null under non-ANSI) rather than silently rounding. */
  private[graft] def sumPrecision(inv: java.math.BigDecimal): Int =
    37 - inv.precision // Spark bound (p1+p2+1 <= 38) is the tighter of the two

  /** 1/√outDim as a fixed 12-dp decimal — EXACT when √outDim is an integer
    * whose reciprocal terminates (outDim = 16 → 0.25), HALF_UP-pinned
    * otherwise. The SQL oracle inlines the identical literal
    * (`toPlainString`), so both engines multiply the same exact decimal
    * instead of dividing a double by `sqrt(outDim)` — double division is
    * where tie-adjacent quotients round differently across engines. */
  private[graft] def invSqrtDecimal(outDim: Int): java.math.BigDecimal = {
    require(outDim > 0, s"randomProject: outDim must be positive, got $outDim")
    val s = math.sqrt(outDim.toDouble)
    val si = math.rint(s).toLong
    val bd =
      if (si * si == outDim.toLong)
        java.math.BigDecimal.ONE.divide(
          java.math.BigDecimal.valueOf(si), 12, java.math.RoundingMode.HALF_UP)
      else java.math.BigDecimal.valueOf(1.0 / s)
    // trailing zeros cost precision budget in the decimal multiply (0.25
    // at scale 12 is a 12-digit literal) — strip them so the sum keeps the
    // widest exact headroom; a whole-number result keeps one digit
    val pinned = bd.setScale(12, java.math.RoundingMode.HALF_UP).stripTrailingZeros()
    if (pinned.scale < 0) pinned.setScale(0) else pinned
  }

  /** Vector dimensionality, probed once from an arbitrary row — with a clear
    * error on an empty corpus instead of a bare NoSuchElementException.
    * Dimensions are assumed uniform (the normal embedding-table contract);
    * set `spark.graft.similarity.checkDims=true` to pay one extra full-scan
    * aggregate that asserts it (off by default — at corpus scale the scan is
    * not free, and ragged embedding tables are a data bug upstream). */
  private[graft] def vecDim(data: DataFrame, vecCol: String): Int = {
    val head = data.select(size(col(vecCol)).as("d")).limit(1).collect()
    require(head.nonEmpty,
      s"Similarity: input corpus is empty — cannot infer the dimensionality of '$vecCol'")
    val dim = head(0).getInt(0)
    if (data.sparkSession.conf.getOption("spark.graft.similarity.checkDims").contains("true")) {
      val mm = data.agg(min(size(col(vecCol))).as("lo"), max(size(col(vecCol))).as("hi")).head
      require(mm.getInt(0) == dim && mm.getInt(1) == dim,
        s"Similarity: non-uniform '$vecCol' dimensions [${mm.getInt(0)}, ${mm.getInt(1)}] — expected $dim")
    }
    dim
  }

  /** Hard-negative mining for contrastive training data (the public
    * DPR/Contriever recipe: the best negatives are the most-similar examples
    * with a DIFFERENT label): per query, the top-k highest-cosine vectors
    * whose `labelCol` differs from the query's. Exact per-pair — the
    * different-label filter applies BEFORE ranking, so every returned rank
    * is a true negative. Ties → lowest id, so the oracle orders identically.
    *
    * Scale: this brute form is the correctness baseline; at corpus scale
    * compose with the candidate-restriction of [[ivfPqTopK]] (bucket-join
    * first, filter labels, then rank) — the filter commutes with candidate
    * restriction. */
  def hardNegatives(data: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    requireExactScale("hardNegatives", "data" -> data, "queries" -> queries)
    val d = data.select(col(idCol).as("nid"), col(vecCol).as("dvec"), col(labelCol).as("nlbl"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"), col(labelCol).as("qlbl"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    q.crossJoin(d)
      .filter(col("nlbl") =!= col("qlbl"))
      .withColumn("cos", cosine(col("qvec"), col("dvec")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"))
  }

  /** All pairs with cosine ≥ threshold (embedding near-dup detection).
    * Brute force O(n²/2); for scale, pre-bucket with lshSignature and join on
    * matching signatures before verifying. */
  /** SemDeDup-style semantic deduplication (cluster-then-dedup over an
    * embedding column): assign every vector to its nearest coarse centroid
    * (broadcast join), find within-cluster pairs with cosine ≥ threshold,
    * then drop all but the minimum-id member of each duplicate component.
    *
    * Scale shape: the quadratic pair search is confined to each cluster
    * (shuffle keyed by cid, per-cluster n/nlist rows — raise `nlist` with
    * corpus size to bound cluster width); the component pass touches only
    * candidate pairs. No corpus-wide cross join anywhere. */
  def semanticDedup(data: DataFrame, threshold: Double, nlist: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding",
      kmeansRounds: Int = 2): DataFrame =
    Dedup.survivorsByPairs(data,
      semanticPairs(data, threshold, nlist, idCol, vecCol, kmeansRounds), idCol)

  /** Within-cluster near-dup candidate pairs for semanticDedup (also useful
    * standalone for duplicate-rate reporting): nearest-centroid assignment,
    * then a cid-keyed equi-join — the quadratic search never leaves a
    * cluster. */
  def semanticPairs(data: DataFrame, threshold: Double, nlist: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding",
      kmeansRounds: Int = 2): DataFrame = {
    val cents = graft.core.PlanCache.cached(data.sparkSession,
      graft.core.PlanCache.key("ivf-cents", data, nlist, idCol, vecCol, kmeansRounds)) {
      kMeansCentroids(data, nlist, kmeansRounds, idCol, vecCol)
    }
    val asg = assign(data, cents, idCol, vecCol)
    val a = asg.select(col("cid"), col(idCol).as("ida"), col(vecCol).as("va"))
    val b = asg.select(col("cid"), col(idCol).as("idb"), col(vecCol).as("vb"))
    a.join(b, Seq("cid")).filter(col("ida") < col("idb"))
      .filter(cosine(col("va"), col("vb")) >= threshold)
      .select(col("ida"), col("idb"))
  }

  def cosinePairs(data: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    requireExactScale("cosinePairs", "data" -> data)
    val a = data.select(col(idCol).as("ida"), col(vecCol).as("va"))
    val b = data.select(col(idCol).as("idb"), col(vecCol).as("vb"))
    a.crossJoin(b).filter(col("ida") < col("idb"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("ida"), col("idb"), col("cos"))
  }

  /** LSH EMPIRICAL quality sheet — the measured complement of
    * [[graft.pipeline.Dedup.lshTuningTable]]'s theoretical S-curve: run the
    * banded join AND the exact pair join at the same threshold, count
    * agreement, and report (n_exact, n_lsh, missed, recall ×10⁶) as one
    * row. Verified LSH output is a SUBSET of the exact pairs (candidates
    * are cosine-checked), so precision is 1 by construction and the number
    * that matters — the pairs the banding never surfaced — is `missed`.
    * Run it on a sample before trusting a banding at full scale.
    *
    * Scale: the exact side is the quadratic brute-force join — that is the
    * point of a quality sheet (ground truth); sample the corpus first. All
    * counts are exact integers (the semi-join guards against a
    * hypothetical banding bug ever ADDING pairs). */
  def lshQualityReport(data: DataFrame, threshold: Double, dim: Int,
      bits: Int = 64, bandBits: Int = 16, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val exact = cosinePairs(data, threshold, idCol, vecCol)
      .select(col("ida"), col("idb"))
    val lsh = lshCosinePairs(data, threshold, dim, bits, bandBits, seed,
      idCol, vecCol, maxBucketSize = Long.MaxValue)
      .select(col("ida"), col("idb"))
    val ne = exact.agg(count(lit(1)).as("n_exact"))
    val nl = lsh.join(exact, Seq("ida", "idb"), "left_semi")
      .agg(count(lit(1)).as("n_lsh"))
    ne.crossJoin(nl).select(col("n_exact"), col("n_lsh"),
      (col("n_exact") - col("n_lsh")).as("missed"),
      when(col("n_exact") > 0L,
        expr("n_lsh * 1000000L DIV n_exact")).as("recall_x1e6"))
  }

  /** LSH-bucketed cosine pair join — the scale path for cosinePairs: band the
    * random-hyperplane signature, join on (band, 16-bit bucket), verify the
    * true cosine on candidates only. Near-duplicate vectors (cosine → 1)
    * collide in some band with high probability; recall depends on threshold
    * (angle θ: per-bit collision prob = 1-θ/π). bruteForce is the exactness
    * oracle in tests. */
  def lshCosinePairs(data: DataFrame, threshold: Double, dim: Int,
      bits: Int = 64, bandBits: Int = 16, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBucketSize: Long = 100000L): DataFrame = {
    require(bits % bandBits == 0)
    val bands = bits / bandBits
    val sig = data.select(col(idCol).as("id"),
      lshSignature(col(vecCol), dim, bits, seed).as("s"))
    // cached: heavy-bucket stats + both self-join sides would otherwise
    // re-run the `bits` projection aggregates per branch (bounded LRU —
    // repeated calls reuse, no per-call leak). (id, band, bucket) ONLY:
    // vectors never enter the banded frame, the bucket join, or the
    // candidate dedup — every exchange on the explosion path is 3 longs wide
    val banded = graft.core.PlanCache.cached(data.sparkSession,
      graft.core.PlanCache.key("lsh-banded", data, dim, bits, bandBits, seed, idCol, vecCol)) {
      sig.select(col("id"),
        posexplode(array((0 until bands).map(b =>
          pmod(shiftrightunsigned(col("s"), b * bandBits), lit(1L << bandBits))): _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    }
    val heavyBuckets = banded.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("bsz")).filter(col("bsz") > maxBucketSize)
      .select(col("band"), col("bucket"))
    // unbounded heavy-bucket set: AQE-decided join, no forced broadcast
    val capped = banded.join(heavyBuckets, Seq("band", "bucket"), "left_anti")
    val a = capped.select(col("band"), col("bucket"), col("id").as("ida"))
    val b = capped.select(col("band"), col("bucket"), col("id").as("idb"))
    // candidates collapse to DISTINCT id pairs before any vector touches the
    // plan (a pair colliding in many bands is verified once); vectors join
    // back per distinct candidate for the true-cosine check
    val candidates = a.join(b, Seq("band", "bucket")).filter(col("ida") < col("idb"))
      .select(col("ida"), col("idb")).dropDuplicates("ida", "idb")
    val va = data.select(col(idCol).as("ida"), col(vecCol).as("va"))
    val vb = data.select(col(idCol).as("idb"), col(vecCol).as("vb"))
    candidates.join(va, Seq("ida")).join(vb, Seq("idb"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("ida"), col("idb"), col("cos"))
  }

  /** Seed-derived ±1 (Rademacher) hyperplane directions, precomputed ON THE
    * DRIVER: deterministic, broadcast as plan literals, and inlinable into a
    * cross-engine oracle query. Precomputing removes the dim×bits per-row
    * hash evaluations the previous formulation paid at execution time. */
  def lshDirections(dim: Int, bits: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits, dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** Random-hyperplane LSH signature: `bits` sign bits of projections onto
    * the seed-derived ±1 directions, computed by the single-pass
    * LshSignature codegen expression (one element read updates all `bits`
    * accumulators — bit-identical to summing per-direction ArrayDots
    * left-to-right, which is what the cross-engine oracle mirrors, but
    * ~`bits`× fewer array traversals per row). */
  def lshSignature(vec: Column, dim: Int, bits: Int = 16, seed: Long = 42L): Column =
    graft.functions.LshSignature(vec, lshDirections(dim, bits, seed))

  /** Binary (sign) quantization — 128 random-hyperplane sign bits per
    * vector packed as two 64-bit words (sig_hi = directions 64–127, sig_lo =
    * 0–63): Charikar's SimHash family applied to embeddings, the coarsest
    * rung of the quantization ladder (float32 → int8 [[quantizeInt8]] → PQ
    * codes → 16 BYTES here, dim-independent). Hamming distance between
    * signatures estimates angular distance; compose with
    * [[graft.pipeline.Multimodal.hammingNearDupPairs]] for the banded
    * near-dup join (recall 1 at Hamming ≤ 7 below the bucket cap) or use as
    * a pre-filter before exact cosine rerank.
    *
    * Cross-engine exact: each bit is the sign of a left-to-right double dot
    * product against the seed-derived ±1 directions ([[lshDirections]] rows,
    * lo word first) — the same fold order as DuckDB's list_dot_product, so
    * an oracle inlines the matrix and matches bit-for-bit (the proven
    * lshCosinePairs recipe). Computed by the single-pass LshSignature
    * codegen expression: one element read updates all 128 accumulators.
    * Scale: pure projection, zero shuffle; 10¹⁰ vectors → 160 GB of
    * signatures, small enough to self-join through the byte-band buckets. */
  def binaryQuantize(data: DataFrame, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dim = vecDim(data, vecCol)
    val dirs = lshDirections(dim, 128, seed)
    data.select(col(idCol),
      graft.functions.LshSignature(col(vecCol), dirs.slice(64, 128)).as("sig_hi"),
      graft.functions.LshSignature(col(vecCol), dirs.take(64)).as("sig_lo"))
  }

  /** L2-normalize a vector column (unit sphere; zero vectors stay zero).
    * Normalizing once at ingest turns every downstream cosine into a plain
    * dot product — at 100 TB that halves the flops of the verification
    * stage of every similarity join. */
  def l2Normalize(vec: Column): Column = {
    // expression-level LET (see Dedup.shingles): the norm is bound once as
    // a lambda variable — captured directly it would re-evaluate the O(dim)
    // dot product per element, O(dim²) per row
    element_at(transform(array(norm(vec)), n =>
      when(n === 0.0, vec).otherwise(transform(vec, x => x / n))), 1)
  }

  /** Symmetric int8 quantization of a vector column: per-vector scale
    * s = max|x|, codes = floor(x·127/s + 0.5) ∈ [-127, 127] (floor(x+0.5)
    * instead of round() — identical halfway behavior in every engine, so the
    * codes are oracle-mirrorable). Zero vectors stay zero with scale 0. At
    * corpus scale this is the 4× storage/bandwidth cut before ANN serving;
    * dequantization is codes·s/127. Pure higher-order expressions. */
  def quantizeInt8(vec: Column): Column = {
    // expression-level LET (see Dedup.shingles): the scale is bound once as
    // a lambda variable — captured directly it would re-evaluate the O(dim)
    // max-abs aggregate per element, O(dim²) per row
    val s = aggregate(transform(vec, x => abs(x)), lit(0.0d), (a, x) => greatest(a, x))
    element_at(transform(array(s), sv =>
      struct(
        sv.as("scale"),
        when(sv === 0.0, transform(vec, _ => lit(0).cast("int")))
          .otherwise(transform(vec, x => floor(x * 127.0 / sv + 0.5).cast("int")))
          .as("codes"))), 1)
  }

  /** Mean-pooled centroid per group as (group, dim, centroid) rows — the
    * chunk→document (or document→cluster) pooling step of an embedding
    * pipeline. One posexplode + one map-side-combinable aggregate keyed
    * (group, dim); row form (not re-collected arrays) so downstream joins
    * stay narrow. Accumulation is DECIMAL — each float rounds to 10 decimal
    * places the same way everywhere, and the decimal sum is exact and
    * order-insensitive — with one final double division, so the result is
    * bit-deterministic across partitionings and engines. */
  def meanPool(emb: DataFrame, groupCol: String = "label",
      vecCol: String = "embedding"): DataFrame =
    emb.select(col(groupCol), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy(col(groupCol), col("dim"))
      .agg((sum(col("v").cast(DecimalType(27, 10))).cast(DoubleType) /
        count(lit(1))).as("centroid"))

  /** Per-dimension embedding statistics — the feature-health report before
    * training or indexing on a vector column: for every dimension, n /
    * min / max / mean / std. Dead dimensions (std ≈ 0), clipped ones
    * (suspicious min/max), and scale imbalance (per-dim std spread) are the
    * standard failure modes this surfaces. Values pin to 6 dp; moments
    * accumulate in DECIMAL(17,6)/(35,12) (square exact inside 38 digits)
    * and the mean/std chain is pure IEEE — the [[graft.stream.ChangeStream
    * .valueZScores]] recipe, hash-exact cross-engine.
    *
    * Scale: one explode + one map-side-combinable aggregate; output is
    * `dims` rows regardless of corpus size. */
  /** Per-dimension embedding STANDARDIZATION (diagonal whitening) — the
    * preprocessing step before cosine/PQ indexing when dimensions carry
    * wildly different scales: every cell becomes (v − μ_dim)/σ_dim, so all
    * dimensions contribute comparably to distances. Returns one row per
    * (id, dim) with the standardized value `z` (NULL on zero-variance dims
    * — a dead dimension has no meaningful z and downstream should drop it).
    *
    * Scale + determinism: the [[embeddingDimStats]] moment pass (one
    * explode, one map-side-combinable DECIMAL aggregate, `dims` rows out)
    * broadcast back onto the exploded cells — corpus-sized data crosses the
    * wire once, the μ/σ table never exceeds the dimensionality. Values pin
    * to 6 dp before the moments and the (v−μ)/σ chain is pure IEEE
    * (subtract/divide/sqrt correctly rounded), hash-exact cross-engine. */
  def standardizeDims(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val ex = emb.select(col(idCol), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .select(col(idCol), col("dim"), round(col("v").cast(DoubleType), 6).as("vd"))
    val dec = ex.select(col("dim"), col("vd").cast(DecimalType(17, 6)).as("dv"))
    val m = col("s").cast(DoubleType) / col("n").cast(DoubleType)
    val variance = col("s2").cast(DoubleType) / col("n").cast(DoubleType) - m * m
    val stats = dec.groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("dv")).as("s"),
        sum(col("dv") * col("dv")).as("s2"))
      .select(col("dim"), m.as("mu"),
        when(variance > 0.0, sqrt(variance)).as("sigma"))
    ex.join(broadcast(stats), Seq("dim"))
      .select(col(idCol), col("dim"),
        ((col("vd") - col("mu")) / col("sigma")).as("z"))
  }

  def embeddingDimStats(emb: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val ex = emb.select(posexplode(col(vecCol)).as(Seq("dim", "v")))
      .select(col("dim"), round(col("v").cast(DoubleType), 6).as("vd"))
      .select(col("dim"), col("vd"), col("vd").cast(DecimalType(17, 6)).as("dv"))
    val m = col("s").cast(DoubleType) / col("n").cast(DoubleType)
    val variance = col("s2").cast(DoubleType) / col("n").cast(DoubleType) - m * m
    ex.groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), min(col("vd")).as("vmin"),
        max(col("vd")).as("vmax"), sum(col("dv")).as("s"),
        sum(col("dv") * col("dv")).as("s2"))
      .select(col("dim"), col("n"), col("vmin"), col("vmax"), m.as("mean"),
        when(variance > 0.0, sqrt(variance)).otherwise(lit(0.0)).as("std"))
  }
}
