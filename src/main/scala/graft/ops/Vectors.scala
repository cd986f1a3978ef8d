package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Hashes._

/** Similarity search over embedding columns (`ARRAY<FLOAT>`).
  *
  * Numeric discipline: floats are scaled to integers (`floor(x·10^6)`),
  * so dot products and norms are *exact int64 arithmetic* —
  * order-independent, overflow-safe for dim ≤ ~1000, and bit-identical
  * in any engine. Only the final divide runs in IEEE doubles (and both
  * operands are < 2^53, hence exactly representable). Per-pair dot
  * products run in the native [[graft.functions.IDot]] codegen kernel;
  * the remaining vector math is Catalyst higher-order functions
  * (`transform`/`zip_with`/`aggregate`) — no UDFs, fully codegen'd.
  *
  * Scale paths: brute-force top-k is the correctness baseline (O(Q·N));
  * [[annLshBuckets]] is the 100 TB path — random-hyperplane LSH bucketing
  * so each query probes one bucket instead of the full corpus.
  */
object Vectors {

  /** float array → exact int64 array (floor(x·10^6)). */
  def intScale(v: Column): Column =
    transform(v, x => floor(x.cast("double") * lit(1000000.0)).cast("long"))

  /** Exact integer dot product of two int64 arrays — the native
    * [[graft.functions.IDot]] codegen kernel (one fused loop, no
    * per-pair intermediate array). Null semantics match
    * [[idotDeclarative]] exactly; parity is swept in
    * KernelRandomParitySpec. */
  def idot(a: Column, b: Column): Column = {
    // Idempotent: every Column is built driver-side under an active
    // session; registering here keeps every Vectors entry point (and
    // any future one) covered without per-method boilerplate.
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.plans.GraftExtensions.register)
    call_function("graft_idot", a, b)
  }

  /** The pure-Catalyst fold [[idot]]'s kernel replaced — kept as the
    * parity reference (and what the DuckDB oracles mirror). */
  def idotDeclarative(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Cosine similarity from pre-scaled int vectors + pre-computed
    * squared norms. */
  def cosineFromInts(dot: Column, n2a: Column, n2b: Column): Column =
    dot.cast("double") / (sqrt(n2a.cast("double")) * sqrt(n2b.cast("double")))

  /** Per-vector preprocessed table: (id, iv, n2). */
  def prepared(df: DataFrame, id: Column, emb: Column): DataFrame =
    df.select(id.as("vid"), intScale(emb).as("iv"))
      .withColumn("n2", idot(col("iv"), col("iv")))

  /** All pairs with cosine ≥ threshold — embedding-space near-dup
    * detection. Exact, fully distributed, and NOTHING ever reaches the
    * driver (no collect, no broadcast): the corpus is grouped into
    * blocks of ≤ `rowsPerBlock` vectors executor-side, block pairs are
    * formed with a shuffle-replicate nested-loop cross join (no
    * driver-mediated broadcast), and each task runs a tight `while`
    * loop over primitive long arrays for its block pair — the same
    * exact int64 dot / IEEE double divide as before, ~100× faster than
    * a row-expression cross join.
    *
    * Scale shape: work is inherently O(n²) dot products (exact all-pairs
    * at a low threshold cannot be LSH-pruned — at cos 0.45 random
    * hyperplanes collide for random pairs nearly as often as for
    * qualifying ones). The block form distributes that work over
    * (n/rowsPerBlock)²/2 tasks with bounded task memory (two blocks ≈
    * 2·rowsPerBlock·dims·8 bytes). Tune `rowsPerBlock` upward for huge
    * corpora to keep the task count sane; for high thresholds where
    * pruning IS possible, use [[annLshTopK]] instead. */
  def nearDupPairs(df: DataFrame, id: Column, emb: Column,
      threshold: Double, rowsPerBlock: Int = 512): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val p = prepared(df, id, emb)
    val n = p.count()
    val nBlocks = math.max(1L, (n + rowsPerBlock - 1) / rowsPerBlock)
    // Block by HASH of the id, not id modulo: a structured id set (all
    // even, strided, offset) must not collapse into few blocks, or one
    // task inherits the whole O(n²) and the block memory bound is gone.
    val blocks = p
      .withColumn("blk", pmod(xxhash64(col("vid")), lit(nBlocks)))
      .groupBy(col("blk"))
      .agg(collect_list(struct(col("vid"), col("iv"), col("n2"))).as("rows"))
    val lhs = blocks.select(col("blk").as("ba"), col("rows").as("ra"))
    val rhs = blocks.select(col("blk").as("bb"), col("rows").as("rb"))
    lhs.hint("shuffle_replicate_nl").crossJoin(rhs)
      .filter(col("ba") <= col("bb"))
      .as[(Long, Array[(Long, Array[Long], Long)],
           Long, Array[(Long, Array[Long], Long)])]
      .flatMap { case (ba, ra, bb, rb) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        val self = ba == bb
        var i = 0
        while (i < ra.length) {
          val (v1, iv1, n21) = ra(i)
          val sq1 = math.sqrt(n21.toDouble)
          var j = if (self) i + 1 else 0
          while (j < rb.length) {
            val (v2, iv2, n22) = rb(j)
            var dot = 0L
            var d = 0
            while (d < iv1.length) { dot += iv1(d) * iv2(d); d += 1 }
            val cos = dot.toDouble / (sq1 * math.sqrt(n22.toDouble))
            if (cos >= threshold) {
              if (v1 < v2) out += ((v1, v2, cos))
              else if (v2 < v1) out += ((v2, v1, cos))
            }
            j += 1
          }
          i += 1
        }
        out
      }.toDF("va", "vb", "cos")
  }

  /** LSH-bucketed near-dup pairs — the pruned path next to
    * [[nearDupPairs]]'s exact all-pairs: vectors are bucketed by
    * deterministic random-hyperplane LSH ([[annLshBuckets]]) and cosine
    * is verified exactly only WITHIN buckets — one equi-join shuffle on
    * the bucket id, O(Σ bucket²) dot products instead of O(n²).
    * Approximate by contract: a qualifying pair split across buckets is
    * missed; `nPlanes` is the recall/cost dial (fewer planes → bigger
    * buckets → higher recall; multi-probe à la [[annLshTopK]] is the
    * other lever). Bucketing AND verification are bit-deterministic
    * (md5 hyperplanes, int64 dots), so even the approximation is
    * oracle-checkable. */
  def nearDupPairsLsh(df: DataFrame, id: Column, emb: Column,
      threshold: Double, nPlanes: Int = 2, dims: Int = -1): DataFrame = {
    val p = annLshBuckets(df, id, emb, nPlanes, dims)
      .select(col("vid"), col("bucket"), intScale(col("embedding")).as("iv"))
      .withColumn("n2", idot(col("iv"), col("iv")))
    val a = p.as("a")
    val b = p.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") &&
        col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("va"), col("b.vid").as("vb"),
        cosineFromInts(idot(col("a.iv"), col("b.iv")),
          col("a.n2"), col("b.n2")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Brute-force cosine top-k for a set of query vectors: exact ANN
    * baseline. Deterministic tie-break on neighbor id. */
  def annTopK(corpus: DataFrame, queries: DataFrame, id: Column,
      emb: Column, k: Int): DataFrame = {
    val c = prepared(corpus, id, emb).as("c")
    // the query set is the small side by contract — broadcast it
    // explicitly so the corpus streams regardless of stats
    val q = broadcast(prepared(queries, id, emb)).as("q")
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    q.join(c, col("q.vid") =!= col("c.vid"))
      .select(col("q.vid").as("qid"), col("c.vid").as("nid"),
        cosineFromInts(idot(col("q.iv"), col("c.iv")), col("q.n2"), col("c.n2"))
          .as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** s42: MAXIMAL MARGINAL RELEVANCE re-ranking (Carbonell &
    * Goldstein 1998) — the diversity pass every RAG serving stack
    * runs between retrieval and the prompt: from each query's top
    * `kCand` candidates, greedily select `kOut` maximizing
    * λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s), so near-duplicate hits
    * (which embedding corpora are full of — that is what the d/s
    * dedup suite measures) don't crowd out coverage.
    *
    * The greedy loop is inherently sequential in k, so it is
    * UNROLLED: `kOut` rounds, each one candidate-sized join + one
    * per-query argmax — never a driver loop over rows, and every
    * frame is (queries × kCand)-bounded, which at serving scale is
    * the index's output, not the corpus. Candidate relevance and all
    * pairwise candidate sims are exact int64-dot cosines
    * (precomputed once, `kCand²` per query); ties break (score,
    * −nid) like the whole s-suite. λ is built from the two decimal
    * literals 0.7/0.3 on BOTH engines — never 1−λ at runtime — so
    * the scores are bit-identical. */
  def mmrRerank(df: DataFrame, id: Column, emb: Column,
      nQueries: Int = 5, kCand: Int = 10, kOut: Int = 5): DataFrame = {
    val q = df.filter(id < nQueries)
    val cand = annTopK(df, q, id, emb, kCand)
      .select(col("qid"), col("nid"), col("cos").as("rel"))
      .localCheckpoint()
    val p = prepared(df, id, emb)
    val pair = cand.as("a")
      .join(cand.select(col("qid"), col("nid").as("cb")), Seq("qid"))
      .filter(col("nid") =!= col("cb"))
      .select(col("qid"), col("nid").as("ca"), col("cb"))
      .join(p.select(col("vid").as("ca"), col("iv").as("iva"),
        col("n2").as("n2a")), Seq("ca"))
      .join(p.select(col("vid").as("cb"), col("iv").as("ivb"),
        col("n2").as("n2b")), Seq("cb"))
      .select(col("qid"), col("ca"), col("cb"),
        cosineFromInts(idot(col("iva"), col("ivb")),
          col("n2a"), col("n2b")).as("sim"))
      .localCheckpoint()
    var selected = cand
      .groupBy(col("qid"))
      .agg(max_by(col("nid"), struct(col("rel"), -col("nid"))).as("nid"))
      .withColumn("pick", lit(1))
      .localCheckpoint()
    for (r <- 2 to kOut) {
      val selSet = selected.select(col("qid"), col("nid"))
      val remaining = cand.join(selSet, Seq("qid", "nid"), "left_anti")
      val ms = pair.join(selSet.withColumnRenamed("nid", "cb"),
          Seq("qid", "cb"))
        .groupBy(col("qid"), col("ca")).agg(max(col("sim")).as("msim"))
        .withColumnRenamed("ca", "nid")
      val pick = remaining.join(ms, Seq("qid", "nid"))
        .withColumn("score",
          lit(0.7d) * col("rel") - lit(0.3d) * col("msim"))
        .groupBy(col("qid"))
        .agg(max_by(col("nid"), struct(col("score"), -col("nid")))
          .as("nid"))
        .withColumn("pick", lit(r))
      selected = selected.unionByName(pick).localCheckpoint()
    }
    selected.join(cand, Seq("qid", "nid"))
      .select(col("qid"), col("nid"), col("pick"), col("rel"))
  }

  /** Attribute-filtered exact kNN: top-k cosine neighbors restricted
    * to corpus vectors sharing the query's `label` — the metadata-
    * filtered search mode of every serving stack (FAISS `IDSelector`,
    * vector-DB metadata filters; here: same-language / same-shard
    * retrieval). The filter is applied as PRE-filtering, not post-:
    * the label is the JOIN KEY, so the physical plan is a hash
    * equi-join on `lbl` — each query only ever meets its own label's
    * partition of the corpus — where [[annTopK]] is necessarily a
    * nested-loop over everything. Post-filtering (top-k first, discard
    * non-matching) would return < k results whenever the unfiltered
    * top-k is dominated by other labels; pre-filtering is exact for
    * any k by construction.
    *
    * At 100 TB: selectivity is the whole game — a label filter that
    * keeps 1% of the corpus cuts the probe work 100×, and because the
    * filter is an equi-key the shuffle co-locates each label's corpus
    * shard with its queries (skew in label popularity is the one
    * hazard; a hot label degrades to [[annTopK]] within that label and
    * can be salted like any skewed join). Composes with the IVF path:
    * cells are built per label by keying [[annIvfTopK]]'s training on
    * the filtered subset. */
  def annTopKFiltered(corpus: DataFrame, queries: DataFrame, id: Column,
      emb: Column, label: Column, k: Int): DataFrame = {
    def prep(df: DataFrame) =
      df.select(id.as("vid"), label.as("lbl"), intScale(emb).as("iv"))
        .withColumn("n2", idot(col("iv"), col("iv")))
    val c = prep(corpus).as("c")
    val q = prep(queries).as("q")
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    q.join(c, col("q.lbl") === col("c.lbl") && col("q.vid") =!= col("c.vid"))
      .select(col("q.vid").as("qid"), col("q.lbl").as("lbl"),
        col("c.vid").as("nid"),
        cosineFromInts(idot(col("q.iv"), col("c.iv")), col("q.n2"), col("c.n2"))
          .as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Late-interaction (ColBERT-style) MaxSim retrieval: documents are
    * BAGS of vectors (`group` = the bag id), the query is a small bag
    * of vectors, and a document's score is
    * `Σ_{q ∈ query} max_{v ∈ doc} ⟨q, v⟩` — each query token is matched
    * against the document's best token, then contributions add. The
    * mode single-vector search (s01-s21) cannot express: a document
    * ranks high by covering ALL query aspects with different vectors.
    *
    * Scoring is integer MaxSim (int64 inner products on the scaled
    * vectors, as MIPS s11): max and sum are then exact and
    * order-independent, so the ranking is bit-reproducible in any
    * engine — no float-summation-order hazard.
    *
    * Scale shape: the query bag is broadcast (a ColBERT query is ≤ 32
    * vectors); the corpus is scanned ONCE with per-partition partial
    * max into (doc, qvec) cells — the only shuffle carries |docs|·|Q|
    * aggregated cells, never corpus vectors. The per-doc scores are
    * localCheckpoint-pinned (one corpus scan total) and the top-k
    * rides the bucketed [[graft.ops.Ranks]] pass, so no stage ranks an
    * unbounded frame through one task even at web-corpus doc counts. */
  def maxSimTopK(corpus: DataFrame, queries: DataFrame, id: Column,
      emb: Column, group: Column, k: Int): DataFrame = {
    val scores = maxSimScores(corpus, queries, id, emb, group)
      .localCheckpoint()
    graft.ops.Ranks.rankedCumsum(scores, -col("score"), col("lbl"),
        lit(1L), rankCol = "__ms_rank", cumCol = "__ms_cum")
      .filter(col("__ms_rank") <= k)
      .select(col("lbl"), col("score"),
        col("__ms_rank").cast("int").as("rank"))
  }

  /** The scoring stage of [[maxSimTopK]], exposed unpinned: per-doc
    * integer MaxSim scores (`lbl`, `score`). The query bag broadcasts;
    * the per-(doc, qvec) max folds map-side. */
  def maxSimScores(corpus: DataFrame, queries: DataFrame, id: Column,
      emb: Column, group: Column): DataFrame = {
    val c = corpus.select(group.as("lbl"), intScale(emb).as("civ"))
    val q = queries.select(id.as("qid"), intScale(emb).as("qiv"))
    c.join(broadcast(q))
      .select(col("lbl"), col("qid"), idot(col("qiv"), col("civ")).as("dot"))
      .groupBy(col("lbl"), col("qid")).agg(max(col("dot")).as("best"))
      .groupBy(col("lbl")).agg(sum(col("best")).as("score"))
  }

  /** md5-derived integer hyperplane coefficient for (plane, dim):
    * first 8 hex chars of md5("p_d") minus 2^31 — centered, exact.
    * Engine-portable: `('0x'||substr(md5(p||'_'||d),1,8))::BIGINT -
    * 2147483648` in the oracle. */
  def planeCoef(p: Int, d: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${p}_$d".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16) - 2147483648L
  }

  /** Random-hyperplane LSH bucket id per vector: `nPlanes` deterministic
    * md5-derived *integer* hyperplanes against the int-scaled vector, so
    * the sign test is exact int64 arithmetic — order-independent and
    * bit-identical in any engine (a float dot near zero would make the
    * bucket bit nondeterministic across engines). Vectors in the same
    * bucket are ANN candidates; probe cost drops from O(N) to
    * O(N / 2^nPlanes) per query. Recall tunable via nPlanes/multi-probe.
    * Overflow headroom: |coef| < 2^31, |iv| ≤ 2^20ish, dims ≤ ~1000 →
    * |dot| < 2^62. */
  def annLshBuckets(df: DataFrame, id: Column, emb: Column,
      nPlanes: Int = 8, dims: Int = -1): DataFrame = {
    // dims is a schema-level constant in any real pipeline; the head()
    // probe is only the convenience fallback.
    val d0 = if (dims > 0) dims else df.select(size(emb)).head().getInt(0)
    val iv = intScale(emb)
    val bucketBits = (0 until nPlanes).map { p =>
      val coef = typedLit((0 until d0).map(d => planeCoef(p, d)))
      val dotP = idot(iv, coef)
      when(dotP >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.select(id.as("vid"), emb.as("embedding"))
      .withColumn("bucket", bucketBits)
  }

  /** IVF-flat ANN: a coarse quantizer of `nCells` centroids partitions
    * the corpus into cells; each query probes only its own cell and
    * reranks exactly inside — probe cost O(N/nCells) per query, the
    * other classic ANN scale path next to LSH ([[annLshTopK]]).
    *
    * Centroids here are the `nCells` lowest-id vectors — a
    * deterministic sample standing in for k-means means (production
    * plugs trained centroids into the same plan; the assignment,
    * probing and rerank machinery is identical and the determinism
    * makes the whole operator oracle-checkable). Assignment is an exact
    * argmax of int64-cosine against broadcast centroids via ONE
    * `max_by` aggregation — map-side partials, no N×K window sort; ties
    * resolve to the smaller centroid id. */
  def annIvfTopK(corpus: DataFrame, queries: DataFrame, id: Column,
      emb: Column, k: Int, nCells: Int = 16): DataFrame = {
    val p = prepared(corpus, id, emb)
    // The nCells lowest ids, NOT `vid < nCells`: a corpus whose id space
    // is sparse (or 1-based) would silently yield too few centroids and
    // partial results; orderBy+limit always produces nCells centroids
    // (or the whole corpus, when it is smaller).
    val cents = p.orderBy(col("vid")).limit(nCells)
      .select(col("vid").as("cid"), col("iv").as("civ"), col("n2").as("cn2"))
    annIvfTopKWith(corpus, queries, id, emb, k, cents)
  }

  /** [[annIvfTopK]] with a CALLER-SUPPLIED centroid model `(cid, civ,
    * cn2)` — e.g. [[kmeansFit]]'s trained output. The assignment,
    * probing and rerank machinery is byte-identical to the sampled
    * path; only the model changes. */
  def annIvfTopKWith(corpus: DataFrame, queries: DataFrame, id: Column,
      emb: Column, k: Int, cents: DataFrame): DataFrame =
    ivfServeTopK(ivfInvertedLists(corpus, id, emb, cents), cents,
      queries, id, emb, k)

  /** Nearest-cell assignment of a prepared `(vid, iv, n2)` side against
    * a broadcast centroid model — ONE `max_by` aggregation (map-side
    * partials, no N×K window sort); ties resolve to the smaller cid. */
  private def assignCells(side: DataFrame, cents: DataFrame): DataFrame =
    side.crossJoin(broadcast(cents))
      .withColumn("ccos", cosineFromInts(idot(col("iv"), col("civ")),
        col("n2"), col("cn2")))
      .groupBy(col("vid"))
      .agg(max_by(col("cid"), struct(col("ccos"), -col("cid"))).as("cid"),
        first(col("iv")).as("iv"), first(col("n2")).as("n2"))

  /** The servable IVF index — the INVERTED LISTS: every corpus vector
    * with its nearest-cell assignment, int-scaled vector and squared
    * norm. This table plus the centroids IS the index (FAISS's IVF
    * layout expressed relationally), and both are plain parquet
    * writes, so train-once/serve-many (s25) and streaming serving
    * (st24) start from artifact scans with NO training or
    * corpus-assignment stage in the serving plan. */
  def ivfInvertedLists(corpus: DataFrame, id: Column, emb: Column,
      cents: DataFrame): DataFrame =
    assignCells(prepared(corpus, id, emb), cents)

  /** Serve exact-reranked top-k from a prebuilt index: queries assign
    * to cells against the broadcast centroids, candidates come from the
    * cell's inverted list by equi-join, int64-cosine reranks them.
    * Per-query cost is O(|cell|) — the index does not need re-reading
    * or re-assignment between calls, which is what makes per-micro-batch
    * serving viable. */
  def ivfServeTopK(lists: DataFrame, cents: DataFrame, queries: DataFrame,
      id: Column, emb: Column, k: Int): DataFrame = {
    val cellC = lists.as("c")
    val cellQ = assignCells(prepared(queries, id, emb), cents).as("q")
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    cellQ.join(cellC, col("q.cid") === col("c.cid") &&
        col("q.vid") =!= col("c.vid"))
      .select(col("q.vid").as("qid"), col("c.vid").as("nid"),
        cosineFromInts(idot(col("q.iv"), col("c.iv")), col("q.n2"), col("c.n2"))
          .as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF with MULTI-PROBE (FAISS's `nprobe`): the corpus stays in its
    * ONE nearest cell, but each query probes its `nProbe` nearest cells
    * — the standard IVF recall lever. A query near a cell boundary has
    * its true neighbors split across adjacent cells; probing the
    * runner-up cells recovers them at nProbe× probe cost with NO index
    * change (same cells, same assignment). Complements [[annLshTopK]]'s
    * hamming-1 multi-probe on the LSH side; s09's recall audit is the
    * dial this knob turns.
    *
    * Scale shape: centroids broadcast (model-sized); the query-side
    * top-nProbe is a window partitioned BY QUERY over the Q×K scored
    * rows (parallelism = #queries, never the t14 stratum collapse);
    * candidates come from the same cell-id equi-join as single-probe —
    * the fan-out is nProbe rows per query, and cells are disjoint so no
    * candidate dedup is ever needed. Exact int64-cosine rerank inside
    * the probed set. */
  def annIvfTopKProbed(corpus: DataFrame, queries: DataFrame, id: Column,
      emb: Column, k: Int, cents: DataFrame, nProbe: Int = 2): DataFrame = {
    val p = prepared(corpus, id, emb)
    def scored(side: DataFrame): DataFrame =
      side.crossJoin(broadcast(cents))
        .withColumn("ccos", cosineFromInts(idot(col("iv"), col("civ")),
          col("n2"), col("cn2")))
    val cellC = scored(p)
      .groupBy(col("vid"))
      .agg(max_by(col("cid"), struct(col("ccos"), -col("cid"))).as("cid"),
        first(col("iv")).as("iv"), first(col("n2")).as("n2")).as("c")
    val wq = Window.partitionBy(col("vid")).orderBy(col("ccos").desc, col("cid"))
    val cellQ = scored(prepared(queries, id, emb))
      .withColumn("pr", row_number().over(wq))
      .filter(col("pr") <= nProbe)
      .select(col("vid"), col("cid"), col("iv"), col("n2")).as("q")
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    cellQ.join(cellC, col("q.cid") === col("c.cid") &&
        col("q.vid") =!= col("c.vid"))
      .select(col("q.vid").as("qid"), col("c.vid").as("nid"),
        cosineFromInts(idot(col("q.iv"), col("c.iv")), col("q.n2"), col("c.n2"))
          .as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Radius (range) search: ALL corpus vectors within squared L2
    * distance ≤ `r2` of each query — the ANN query type top-k cannot
    * emulate (dedup wants "everything this close", not "the 10
    * closest"). EXACT result set, yet never brute-force: corpus
    * vectors live in IVF cells, each cell carries its exact int64
    * radius r²max = max member distance² to its centroid, and a
    * (query, cell) pair survives only if the triangle-inequality lower
    * bound allows a member within range:
    *
    *   d(q,x) ≥ d(q,c) − d(c,x)  ⇒  prune cell when
    *   d²(q,c) > r²max + r² + 2·√(r²max·r²)
    *
    * The cross term is irrational, so it is overestimated with
    * ceil(double-sqrt)+1 — double rounding error is ≪ 1 at int64
    * magnitudes, so the bound only ever widens and pruning is LOSSLESS
    * by construction (the brute-force oracle checks exactly that: one
    * wrongly pruned pair is a missing row). Distances inside surviving
    * cells are the exact [[sqDist]] kernel.
    *
    * Scale shape: centroids and per-cell radii are model-sized
    * (broadcast); the corpus is scanned once into its cells; the
    * candidate join is a cid equi-join whose fan-in is only the
    * surviving cells — at 100 TB the radius bound prunes the far
    * cells and the plan never forms the Q×N product. */
  def rangeSearch(corpus: DataFrame, queries: DataFrame, id: Column,
      emb: Column, r2: Long, nCells: Int = 16): DataFrame = {
    val p = prepared(corpus, id, emb)
    val cents = p.orderBy(col("vid")).limit(nCells)
      .select(col("vid").as("cid"), col("iv").as("civ"))
    val assigned = p.crossJoin(broadcast(cents))
      .withColumn("d2c", sqDist(col("iv"), col("civ")))
      .groupBy(col("vid"))
      .agg(min_by(col("cid"), struct(col("d2c"), col("cid"))).as("cid"),
        min(col("d2c")).as("d2c"), first(col("iv")).as("iv"))
    val radii = assigned.groupBy(col("cid"))
      .agg(max(col("d2c")).as("r2max"))
      .join(cents, Seq("cid"))
    // conservative integer upper bound on the irrational cross term
    val cross = (ceil(lit(2.0) * sqrt(col("r2max").cast("double") *
      lit(r2.toDouble))).cast("long") + lit(1L))
    val probed = prepared(queries, id, emb)
      .select(col("vid").as("qid"), col("iv").as("qiv"))
      .crossJoin(broadcast(radii))
      .withColumn("d2qc", sqDist(col("qiv"), col("civ")))
      .filter(col("d2qc") <= col("r2max") + lit(r2) + cross)
      .select(col("qid"), col("qiv"), col("cid"))
    probed.join(assigned, Seq("cid"))
      .filter(col("qid") =!= col("vid"))
      .withColumn("d2", sqDist(col("qiv"), col("iv")))
      .filter(col("d2") <= r2)
      .select(col("qid"), col("vid").as("nid"), col("d2"))
  }

  /** LSH-accelerated top-k with MULTI-PROBE: each query probes its own
    * bucket plus every bucket within hamming distance `probeHamming` of
    * it (a near-miss on one hyperplane is the dominant recall-loss mode,
    * so probing 1-bit neighbors recovers most of it at (nPlanes+1)×
    * probe cost instead of 2× planes). The probe set is generated by
    * exploding the query's bucket into its flipped variants, keeping the
    * corpus-side join a plain equi-join on bucket — shuffle-friendly,
    * no bucket-pair enumeration. Exact rerank inside the probed set.
    * Returns (qid, rank, nid, cos). */
  def annLshTopK(corpus: DataFrame, queries: DataFrame, id: Column,
      emb: Column, k: Int, nPlanes: Int = 8, dims: Int = -1,
      probeHamming: Int = 1): DataFrame = {
    require(probeHamming <= 1, "probe set generation covers hamming <= 1")
    val cb = annLshBuckets(corpus, id, emb, nPlanes, dims)
    val qb = annLshBuckets(queries, id, emb, nPlanes, dims)
    val c = cb.select(col("vid"), col("bucket"),
      intScale(col("embedding")).as("iv"))
      .withColumn("n2", idot(col("iv"), col("iv"))).as("c")
    val probes =
      if (probeHamming == 0) array(col("bucket"))
      else array(col("bucket") +:
        (0 until nPlanes).map(p => col("bucket").bitwiseXOR(lit(1L << p))): _*)
    val q = qb.select(col("vid"), col("bucket"),
      intScale(col("embedding")).as("iv"))
      .withColumn("n2", idot(col("iv"), col("iv")))
      .withColumn("probe", explode(probes)).as("q")
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    q.join(c, col("q.probe") === col("c.bucket") &&
        col("q.vid") =!= col("c.vid"))
      .select(col("q.vid").as("qid"), col("c.vid").as("nid"),
        cosineFromInts(idot(col("q.iv"), col("c.iv")), col("q.n2"), col("c.n2"))
          .as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Brute-force exact maximum-inner-product top-k (MIPS) — the
    * recommendation-scoring variant of ANN: rank by the raw dot
    * product, NOT cosine (a long vector with the right direction beats
    * a unit vector; no normalization). Exact int64 dots via the native
    * [[graft.functions.IDot]] kernel; deterministic tie-break on
    * neighbor id. O(Q·N) correctness baseline — [[mipsLshTopK]] is the
    * scale path. */
  def mipsTopK(corpus: DataFrame, queries: DataFrame, id: Column,
      emb: Column, k: Int): DataFrame = {
    val c = prepared(corpus, id, emb).as("c")
    // broadcast the small-by-contract query frame (annTopK discipline)
    val q = broadcast(prepared(queries, id, emb)).as("q")
    val w = Window.partitionBy(col("qid")).orderBy(col("dot").desc, col("nid"))
    q.join(c, col("q.vid") =!= col("c.vid"))
      .select(col("q.vid").as("qid"), col("c.vid").as("nid"),
        idot(col("q.iv"), col("c.iv")).as("dot"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** s40: EXACT MIPS with Cauchy–Schwarz norm-bound pruning — the
    * TA/Fagin-style "bound then verify" serving path (branch-and-bound
    * MIPS, Ram & Gray KDD'12 canon) that returns the EXACT top-k while
    * opening only a norm-qualified slice of the corpus:
    *   1. seed: the `seedM` highest-norm vectors (one TakeOrdered —
    *      per-partition top-m fold, never a full sort) score exactly
    *      against every query; the per-query k-th seed dot `dk` is a
    *      LOWER bound on the true k-th best (seed ⊆ corpus);
    *   2. prune: dot(q,x) ≤ ‖q‖·‖x‖, so any x with ‖q‖²·‖x‖² < dk²
    *      (dk ≥ 0) provably cannot enter the top-k — the filter is an
    *      exact DECIMAL(38,0) compare of integer squares, no sqrt, no
    *      float; a negative dk prunes nothing (the bound is ≥ 0);
    *   3. verify: exact int64 dots on survivors only, one global
    *      per-query top-k.
    * Lossless by construction — the oracle is the BRUTE-FORCE MIPS,
    * and the hash match is the proof. At 100 TB the corpus pass in
    * step 2 reads only (vid, n2) — two columns — and step 3's dot
    * kernel touches the pruned slice; the query set rides broadcast
    * (request-bounded), the corpus never moves. Pruning power scales
    * with norm spread (documented: unit-normalized corpora degrade to
    * brute force, which is why the report spec measures the survivor
    * fraction on real fixtures). */
  def mipsNormPruneTopK(corpus: DataFrame, queries: DataFrame,
      id: Column, emb: Column, k: Int, seedM: Int = 64): DataFrame = {
    val d38 = (c: Column) =>
      c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val c = prepared(corpus, id, emb)
    val q = prepared(queries, id, emb)
      .select(col("vid").as("qid"), col("iv").as("qiv"),
        col("n2").as("qn2"))
    val seed = c.orderBy(col("n2").desc, col("vid")).limit(seedM)
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("dot").desc, col("nid"))
    val bounds = q.crossJoin(broadcast(seed))
      .filter(col("vid") =!= col("qid"))
      .select(col("qid"), col("vid").as("nid"),
        idot(col("qiv"), col("iv")).as("dot"))
      .withColumn("r", row_number().over(wq))
      .filter(col("r") === k)
      .select(col("qid"), col("dot").as("dk"))
    // A query with < k seed dots (tiny corpus) gets dk = -1: prune
    // nothing for it rather than dropping it from the result.
    val qb = broadcast(q.join(bounds, Seq("qid"), "left")
      .withColumn("dk", coalesce(col("dk"), lit(-1L))))
    c.join(qb, col("vid") =!= col("qid"))
      .filter(col("dk") < 0L ||
        d38(col("qn2")) * col("n2") >= d38(col("dk")) * col("dk"))
      .select(col("qid"), col("vid").as("nid"),
        idot(col("qiv"), col("iv")).as("dot"))
      .withColumn("rank", row_number().over(wq))
      .filter(col("rank") <= k)
  }

  /** MIPS at scale via the Neyshabur–Srebro reduction (Neyshabur &
    * Srebro, "On Symmetric and Asymmetric LSHs for Inner Product
    * Search", ICML 2015 — public): append one coordinate
    * `sqrt(M² − ‖x‖²)` to every corpus vector (M = corpus max norm)
    * and `0` to every query; inner-product order under the augmented
    * COSINE then matches inner-product order, so the existing
    * random-hyperplane bucketing applies unchanged. Candidates come
    * from one equi-join on the augmented bucket (multi-probe hamming
    * ≤ 1, as [[annLshTopK]]); rerank is the EXACT original int64 dot —
    * approximation lives only in candidate generation.
    *
    * Determinism: the augmented coordinate is `floor(sqrt(M²−‖x‖²))`
    * in int64 — M²−n2 < 2^53 (dims ≤ ~1000 at 10^6 scaling), so the
    * double conversion is exact, IEEE sqrt is correctly rounded in any
    * engine, and the whole operator stays oracle-checkable. The corpus
    * max M² is one scalar aggregate broadcast to the scan — no second
    * corpus pass at scale (AQE folds it into the same stage chain). */
  def mipsLshTopK(corpus: DataFrame, queries: DataFrame, id: Column,
      emb: Column, k: Int, nPlanes: Int = 8, dims: Int = -1): DataFrame = {
    val d0 = if (dims > 0) dims else corpus.select(size(emb)).head().getInt(0)
    val p = prepared(corpus, id, emb)
    val m2 = p.agg(max(col("n2")).as("m2"))
    val caug = p.crossJoin(broadcast(m2))
      .withColumn("av", concat(col("iv"), array(
        floor(sqrt((col("m2") - col("n2")).cast("double"))).cast("long"))))
    val qaug = prepared(queries, id, emb)
      .withColumn("av", concat(col("iv"), array(lit(0L))))
    def bucketBits(df: DataFrame): DataFrame = df.withColumn("bucket",
      (0 until nPlanes).map { pl =>
        val coef = typedLit((0 to d0).map(d => planeCoef(pl, d)))
        when(idot(col("av"), coef) >= 0, lit(1L << pl)).otherwise(lit(0L))
      }.reduce(_ + _))
    val c = bucketBits(caug)
      .select(col("vid"), col("bucket"), col("iv")).as("c")
    val probes = array(col("bucket") +:
      (0 until nPlanes).map(pl => col("bucket").bitwiseXOR(lit(1L << pl))): _*)
    val q = bucketBits(qaug)
      .withColumn("probe", explode(probes))
      .select(col("vid"), col("probe"), col("iv")).as("q")
    val w = Window.partitionBy(col("qid")).orderBy(col("dot").desc, col("nid"))
    q.join(c, col("q.probe") === col("c.bucket") &&
        col("q.vid") =!= col("c.vid"))
      .select(col("q.vid").as("qid"), col("c.vid").as("nid"),
        idot(col("q.iv"), col("c.iv")).as("dot"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Per-vector symmetric int8 quantization — the compression step of a
    * large-scale ANN index (127/amax scale per vector, the FAISS
    * `SQ8`-style layout). Stays inside the exact-integer discipline:
    * quantization runs on the int64-scaled vector, `q_i =
    * floor((iv_i·127)/amax)` with ONE exact int64 product and one IEEE
    * divide+floor, so the oracle reproduces every code bit-for-bit.
    * Emitted per vector: the scale (`amax`), integer digests of the code
    * vector (sum / squared norm — any code mismatch shifts these), the
    * exact integer squared quantization error in the 127·amax-scaled
    * space, and the float-vs-code cosine (how much geometry the codes
    * preserve — the number an index designer actually tunes against).
    * Map-only: no shuffle, each vector quantizes inside its task. */
  def quantizeInt8(df: DataFrame, id: Column, emb: Column): DataFrame = {
    val base = df.select(id.as("vec_id"), intScale(emb).as("iv"))
      .withColumn("n2", idot(col("iv"), col("iv")))
      .withColumn("amax",
        aggregate(col("iv"), lit(0L), (a, x) => greatest(a, abs(x))))
      .withColumn("q", when(col("amax") > 0,
        transform(col("iv"), x =>
          floor((x * lit(127L)).cast("double") / col("amax").cast("double"))
            .cast("long")))
        .otherwise(transform(col("iv"), _ => lit(0L))))
      .withColumn("qnorm2", idot(col("q"), col("q")))
    base.select(
      col("vec_id"), col("amax"),
      aggregate(col("q"), lit(0L), (a, x) => a + x).as("qsum"),
      col("qnorm2"),
      aggregate(zip_with(col("iv"), col("q"), (x, y) =>
        (x * lit(127L) - y * col("amax")) * (x * lit(127L) - y * col("amax"))),
        lit(0L), (a, e) => a + e).as("err2"),
      when(col("qnorm2") > 0 && col("n2") > 0,
        cosineFromInts(idot(col("q"), col("iv")), col("qnorm2"), col("n2")))
        .as("cos_qf"))
  }

  /** SQ8 ANN: brute-force top-k over the int8 codes of
    * [[quantizeInt8]]'s construction (q_i = floor(iv_i·127 / amax)) —
    * the memory-bandwidth play of FAISS's `IndexScalarQuantizer`. The
    * per-vector scale amax/127 cancels in the cosine of the
    * reconstructed vectors, so the score is exactly
    * idot(q_a,q_b) / (√qn2_a·√qn2_b): an int64 fold over 8-bit values
    * (|dot| ≤ 127²·d — no overflow at any realistic dim) + one IEEE
    * divide. Same plan shape as [[annTopK]] — queries broadcast, one
    * corpus scan, per-query window top-k — but the corpus side carries
    * ~4× less than the 10^6-scaled vectors, which at 100 TB is the
    * difference between spilling and not. */
  def annSq8TopK(corpus: DataFrame, queries: DataFrame, id: Column,
      emb: Column, k: Int): DataFrame = {
    def coded(df: DataFrame): DataFrame =
      df.select(id.as("vid"), intScale(emb).as("iv"))
        .withColumn("amax",
          aggregate(col("iv"), lit(0L), (a, x) => greatest(a, abs(x))))
        .withColumn("q", when(col("amax") > 0,
          transform(col("iv"), x =>
            floor((x * lit(127L)).cast("double") / col("amax").cast("double"))
              .cast("long")))
          .otherwise(transform(col("iv"), _ => lit(0L))))
        .select(col("vid"), col("q"), idot(col("q"), col("q")).as("qn2"))
    val c = coded(corpus).as("c")
    // the query set is the small side by contract — broadcast it
    // explicitly so the corpus streams regardless of stats
    val q = broadcast(coded(queries)).as("q")
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    q.join(c, col("q.vid") =!= col("c.vid"))
      .select(col("q.vid").as("qid"), col("c.vid").as("nid"),
        cosineFromInts(idot(col("q.q"), col("c.q")), col("q.qn2"), col("c.qn2"))
          .as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Binary-signature ANN: each vector compressed to ONE long of
    * [[annLshBuckets]]' md5-derived hyperplane sign bits, searched by
    * Hamming distance (`bit_count(xor)`) — the 1-bit end of the
    * quantized-search ladder (float [[annTopK]] → int8 [[annSq8TopK]]
    * → this), per Charikar 2002: E[hamming] ∝ angle. All-integer and
    * engine-portable, so the oracle reproduces the exact signatures.
    * Scale: the corpus side is 8 BYTES per vector — a billion vectors
    * fit in 8 GB of scan — and the distance is one xor+popcount;
    * queries broadcast, per-partition top-k prunes before the merge,
    * ties break (dist, nid) ascending. */
  def annHammingTopK(corpus: DataFrame, queries: DataFrame, id: Column,
      emb: Column, k: Int, nBits: Int = 48, dims: Int = -1): DataFrame = {
    val c = annLshBuckets(corpus, id, emb, nBits, dims)
      .select(col("vid"), col("bucket").as("sig")).as("c")
    val q = broadcast(annLshBuckets(queries, id, emb, nBits, dims)
      .select(col("vid"), col("bucket").as("sig"))).as("q")
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("nid"))
    q.join(c, col("q.vid") =!= col("c.vid"))
      .select(col("q.vid").as("qid"), col("c.vid").as("nid"),
        bit_count(col("q.sig").bitwiseXOR(col("c.sig"))).as("dist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** The m per-subspace slices of an int-scaled vector, as an array of
    * (sub, sv) structs ready to explode. slice() is 1-based. */
  private def subspaces(iv: Column, m: Int, subDim: Int): Column =
    array((0 until m).map(s =>
      struct(lit(s).as("sub"), slice(iv, s * subDim + 1, subDim).as("sv"))): _*)

  /** Exact int64 squared L2 distance between two int-scaled arrays —
    * the native [[graft.functions.ISqDist]] kernel (same fused-loop
    * rationale as [[idot]]). */
  def sqDist(a: Column, b: Column): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.plans.GraftExtensions.register)
    call_function("graft_isqdist", a, b)
  }

  /** The pure-Catalyst fold [[sqDist]]'s kernel replaced — kept as the
    * parity reference (and what the DuckDB oracles mirror). */
  def sqDistDeclarative(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  /** Per-subspace PQ codebook: the `k` lowest-id vectors' subvector
    * slices (deterministic stand-in for k-means centroids, same contract
    * as [[annIvfTopK]]'s coarse quantizer — production plugs trained
    * codebooks into the identical plan). (sub, cid, civ), cid = the
    * source vector's id. */
  def pqCodebook(p: DataFrame, m: Int, k: Int, subDim: Int): DataFrame =
    p.orderBy(col("vid")).limit(k)
      .select(col("vid").as("cid"),
        explode(subspaces(col("iv"), m, subDim)).as("cs"))
      .select(col("cs.sub").as("sub"), col("cid"), col("cs.sv").as("civ"))

  /** Product-quantization encode — the index-compression step of
    * billion-scale ANN (Jégou et al. 2011): the vector is cut into `m`
    * subspaces and each subvector is replaced by the id of its nearest
    * codebook centroid, storing m small codes instead of `dims` floats
    * (here 4 codes for 64 dims — a 64× compression at float32).
    *
    * All distances are exact int64 squared L2 on the 10^6-scaled vector
    * ([[intScale]] discipline): argmin is an integer compare with ties
    * to the smaller centroid id, so every code — and the residual `err2`
    * (sum of the m chosen distances, the quantization-error number an
    * index designer tunes m/k against) — is bit-identical in any engine.
    *
    * Scale shape: the codebook (m·k subvectors) is broadcast; encoding
    * is ONE map-side join of the m-exploded corpus against it plus two
    * keyed aggregations on (vid) — no shuffle ever carries more than
    * m rows per vector, and nothing is corpus-quadratic. */
  def pqEncode(df: DataFrame, id: Column, emb: Column,
      m: Int = 4, k: Int = 16, dims: Int = 64): DataFrame = {
    require(dims % m == 0, s"dims=$dims must divide into m=$m subspaces")
    val subDim = dims / m
    val p = df.select(id.as("vid"), intScale(emb).as("iv"))
    val cents = pqCodebook(p, m, k, subDim)
    val assigned = p
      .select(col("vid"), explode(subspaces(col("iv"), m, subDim)).as("vs"))
      .select(col("vid"), col("vs.sub").as("sub"), col("vs.sv").as("sv"))
      .join(broadcast(cents), Seq("sub"))
      .withColumn("dist", sqDist(col("sv"), col("civ")))
      .groupBy(col("vid"), col("sub"))
      .agg(min_by(col("cid"), struct(col("dist"), col("cid"))).as("code"),
        min(col("dist")).as("dist"))
    assigned.groupBy(col("vid"))
      .agg(max(when(col("sub") === 0, col("code"))).as("code0"),
        ((1 until m).map(s =>
          max(when(col("sub") === s, col("code"))).as(s"code$s"))
          :+ sum(col("dist")).as("err2")): _*)
      .withColumnRenamed("vid", "vec_id")
  }

  /** PQ asymmetric-distance (ADC) top-k search — the query path over a
    * [[pqEncode]]d index: each query computes its exact distance to
    * every codebook centroid ONCE (the m·k-entry lookup table), and a
    * document's approximate distance is the sum of m table lookups
    * addressed by its codes — never touching the document's floats.
    * This is why PQ scales: the corpus side of the join carries only
    * (vid, sub, code), bytes per document, and the LUT side is
    * queries × m · k rows, broadcast.
    *
    * Exactness discipline: LUT entries are exact int64 squared L2, the
    * per-doc sum is m integer adds (order-independent), ranking is an
    * integer sort with ties to the smaller neighbor id — the whole
    * search result is oracle-checkable despite being an approximation
    * of the true distance. Returns (qid, nid, adc, rank), self-matches
    * excluded. */
  def pqAdcTopK(corpus: DataFrame, queries: DataFrame, id: Column,
      emb: Column, kNeighbors: Int = 10,
      m: Int = 4, k: Int = 16, dims: Int = 64): DataFrame = {
    val subDim = dims / m
    val codes = pqEncode(corpus, id, emb, m, k, dims)
    val docCodes = codes.select(col("vec_id").as("nid"), explode(array(
      (0 until m).map(s =>
        struct(lit(s).as("sub"), col(s"code$s").as("code"))): _*)).as("sc"))
      .select(col("nid"), col("sc.sub").as("sub"), col("sc.code").as("code"))
    val p = corpus.select(id.as("vid"), intScale(emb).as("iv"))
    val cents = pqCodebook(p, m, k, subDim)
    val lut = queries.select(id.as("qid"), intScale(emb).as("iv"))
      .select(col("qid"), explode(subspaces(col("iv"), m, subDim)).as("qs"))
      .select(col("qid"), col("qs.sub").as("sub"), col("qs.sv").as("sv"))
      .join(broadcast(cents), Seq("sub"))
      .select(col("qid"), col("sub"), col("cid"),
        sqDist(col("sv"), col("civ")).as("qdist"))
    val w = Window.partitionBy(col("qid")).orderBy(col("adc"), col("nid"))
    docCodes
      .join(broadcast(lut),
        docCodes("sub") === lut("sub") && docCodes("code") === lut("cid"))
      .groupBy(col("qid"), col("nid"))
      .agg(sum(col("qdist")).as("adc"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kNeighbors)
  }

  /** IVFADC — the full billion-scale arrangement of Jégou et al. 2011
    * (FAISS's `IndexIVFPQ`): a coarse quantizer of `nCells` centroids
    * partitions the corpus (the IVF of [[annIvfTopK]], but with the
    * paper's squared-L2 assignment), each vector stores only its cell
    * id plus the PQ codes of its RESIDUAL (vector − cell centroid —
    * residuals concentrate near 0, which is why PQ on residuals beats
    * PQ on raw vectors), and a query scans ONLY its own cell with the
    * ADC lookup table built from its own residual.
    *
    * Everything stays exact int64: the residual is an integer subtract
    * of 10^6-scaled vectors, all distances are integer squared L2
    * ([[sqDist]] kernel), ranking is an integer sort with ties to the
    * smaller id — oracle-checkable end to end. Both quantizers use the
    * deterministic lowest-id sample ([[pqCodebook]]'s contract);
    * production plugs [[kmeansFit]] output into the identical plan.
    *
    * Scale shape: ONE checkpointed assignment pass produces (vid, cell,
    * residual); the residual codebook (m·k subvectors) and the query
    * LUT (queries × m·k rows) broadcast; the corpus side of the ADC
    * join carries only (nid, cell, sub, code) — bytes per doc; the
    * cell-id equality in the join is what makes this IVF: candidates
    * are O(N/nCells) per query, not N. */
  def ivfAdcTopK(corpus: DataFrame, queries: DataFrame, id: Column,
      emb: Column, kNeighbors: Int = 10, nCells: Int = 8,
      m: Int = 4, k: Int = 16, dims: Int = 64): DataFrame = {
    require(dims % m == 0, s"dims=$dims must divide into m=$m subspaces")
    val subDim = dims / m
    val p = corpus.select(id.as("vid"), intScale(emb).as("iv"))
    val coarse = p.orderBy(col("vid")).limit(nCells)
      .select(col("vid").as("ccid"), col("iv").as("cciv"))
    def assignResidual(side: DataFrame): DataFrame =
      side.crossJoin(broadcast(coarse))
        .withColumn("cdist", sqDist(col("iv"), col("cciv")))
        .groupBy(col("vid"))
        .agg(min_by(struct(col("ccid"), col("cciv")),
          struct(col("cdist"), col("ccid"))).as("cc"),
          first(col("iv")).as("iv"))
        .select(col("vid"), col("cc.ccid").as("cell"),
          zip_with(col("iv"), col("cc.cciv"), (a, b) => a - b).as("rv"))
    val res = assignResidual(p).localCheckpoint()
    val rcb = res.orderBy(col("vid")).limit(k)
      .select(col("vid").as("cid"),
        explode(subspaces(col("rv"), m, subDim)).as("cs"))
      .select(col("cs.sub").as("sub"), col("cid"), col("cs.sv").as("civ"))
    val codes = res
      .select(col("vid").as("nid"), col("cell"),
        explode(subspaces(col("rv"), m, subDim)).as("vs"))
      .select(col("nid"), col("cell"), col("vs.sub").as("sub"),
        col("vs.sv").as("sv"))
      .join(broadcast(rcb), Seq("sub"))
      .withColumn("dist", sqDist(col("sv"), col("civ")))
      .groupBy(col("nid"), col("cell"), col("sub"))
      .agg(min_by(col("cid"), struct(col("dist"), col("cid"))).as("code"))
    val lut = assignResidual(
      queries.select(id.as("vid"), intScale(emb).as("iv")))
      .select(col("vid").as("qid"), col("cell").as("qcell"),
        explode(subspaces(col("rv"), m, subDim)).as("qs"))
      .select(col("qid"), col("qcell"), col("qs.sub").as("sub"),
        col("qs.sv").as("sv"))
      .join(broadcast(rcb), Seq("sub"))
      .select(col("qid"), col("qcell"), col("sub"), col("cid"),
        sqDist(col("sv"), col("civ")).as("qdist"))
    val w = Window.partitionBy(col("qid")).orderBy(col("adc"), col("nid"))
    codes
      .join(broadcast(lut),
        codes("sub") === lut("sub") && codes("code") === lut("cid") &&
          codes("cell") === lut("qcell"))
      .groupBy(col("qid"), col("nid"))
      .agg(sum(col("qdist")).as("adc"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kNeighbors)
      .select(col("qid"), col("nid"), col("adc"), col("rank"))
  }

  /** Two-stage compressed search: IVFADC shortlist + exact rerank —
    * the arrangement a production PQ index actually serves with
    * (Jégou et al. 2011 §V: compressed-domain scan to a candidate
    * list, re-ranking with the original vectors). [[ivfAdcTopK]]'s
    * cell-local ADC scan ranks bytes-per-doc compressed distances to
    * a `shortlist`-sized candidate set per query; ONLY those
    * candidates then fetch their full vectors for the exact
    * int64-cosine rerank. At 100 TB the full-precision side is
    * touched `shortlist`·|queries| times total — never a corpus scan
    * — so the rerank costs two equi-joins on id regardless of corpus
    * size, and the recall lever is the shortlist width instead of the
    * code budget. */
  def ivfAdcRerankTopK(corpus: DataFrame, queries: DataFrame, id: Column,
      emb: Column, kNeighbors: Int = 10, shortlist: Int = 50,
      nCells: Int = 8, m: Int = 4, k: Int = 16, dims: Int = 64)
      : DataFrame = {
    val short = ivfAdcTopK(corpus, queries, id, emb,
        kNeighbors = shortlist, nCells, m, k, dims)
      .select(col("qid"), col("nid"))
    val p = prepared(corpus, id, emb)
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    short
      .join(p.select(col("vid").as("qid"), col("iv").as("qiv"),
        col("n2").as("qn2")), Seq("qid"))
      .join(p.select(col("vid").as("nid"), col("iv").as("niv"),
        col("n2").as("nn2")), Seq("nid"))
      .select(col("qid"), col("nid"),
        cosineFromInts(idot(col("qiv"), col("niv")),
          col("qn2"), col("nn2")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kNeighbors)
  }

  /** Exact-integer k-means (Lloyd) over the embedding corpus — the
    * centroid TRAINER that [[annIvfTopK]] / [[pqEncode]] document as
    * "production plugs trained centroids in": `iters` rounds of
    * assign-to-argmax-cosine + recompute-centroid-as-mean, entirely in
    * the int64 [[intScale]] discipline so every round — and therefore
    * the final model — is bit-identical in any engine:
    *
    *  - seeding: the `k` lowest-id vectors (k-means++ would trade
    *    determinism for convergence speed; seeding strategy is
    *    orthogonal to the iteration machinery);
    *  - assignment: argmax int64-cosine against the broadcast centroid
    *    set via one `max_by` aggregation (ties → smaller centroid id),
    *    exactly the [[annIvfTopK]] shape;
    *  - update: per-dimension `floor(sum/count)` — the sum is exact
    *    int64, < 2^53 so the IEEE divide's operands are exactly
    *    representable, and floor pins the result back to an integer
    *    grid. Cells that lose every member drop out (k shrinks).
    *
    * Scale shape: each round is one corpus pass — a map-side broadcast
    * cross join + two keyed aggregations (vid, then (cid,dim) where the
    * shuffle carries dims × cells pre-aggregated rows, never the
    * corpus). The model (k·dims longs) is `localCheckpoint`ed between
    * rounds to truncate lineage; the corpus-sized assignment is
    * checkpointed once per round for reuse by the update AND the final
    * stats pass — at 100 TB that is the same per-iteration
    * materialization every distributed k-means (e.g. MLlib's) pays.
    *
    * Output, one row per surviving cell: `cell_id` (seed vid), member
    * count, centroid digests (`csum`, `cnorm2` — any coordinate
    * mismatch shifts these), and `dotsum` = Σ members idot(iv, civ), an
    * exact-integer cohesion signal (the inertia analogue that needs no
    * float fold). */
  def kmeansCells(df: DataFrame, id: Column, emb: Column,
      k: Int = 16, iters: Int = 2): DataFrame = {
    val (cents, members) = kmeansFit(df, id, emb, k, iters)
    members.join(broadcast(cents), Seq("cid"))
      .withColumn("dot", idot(col("iv"), col("civ")))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"), sum(col("dot")).as("dotsum"),
        first(col("civ")).as("civ"))
      .select(col("cid").as("cell_id"), col("n_members"),
        aggregate(col("civ"), lit(0L), (a, x) => a + x).as("csum"),
        idot(col("civ"), col("civ")).as("cnorm2"), col("dotsum"))
  }

  /** The Lloyd loop behind [[kmeansCells]], returning the raw model:
    * (final centroids (cid, civ, cn2), final assignment (vid, cid,
    * iv)). Exposed so downstream quantizers ([[annIvfTopKWith]]) can
    * consume TRAINED centroids through the identical machinery the
    * sampled ones use. Both sides are checkpointed. */
  def kmeansFit(df: DataFrame, id: Column, emb: Column,
      k: Int, iters: Int): (DataFrame, DataFrame) = {
    val p = prepared(df, id, emb)
    var cents = p.orderBy(col("vid")).limit(k)
      .select(col("vid").as("cid"), col("iv").as("civ"), col("n2").as("cn2"))
      .localCheckpoint()
    var members: DataFrame = null
    for (_ <- 1 to iters) {
      members = p.crossJoin(broadcast(cents))
        .withColumn("ccos", cosineFromInts(idot(col("iv"), col("civ")),
          col("n2"), col("cn2")))
        .groupBy(col("vid"))
        .agg(max_by(col("cid"), struct(col("ccos"), -col("cid"))).as("cid"),
          first(col("iv")).as("iv"))
        .localCheckpoint()
      cents = members
        .select(col("cid"), posexplode(col("iv")).as(Seq("d", "x")))
        .groupBy(col("cid"), col("d"))
        .agg(floor(sum(col("x")).cast("double") / count(lit(1)))
          .cast("long").as("cv"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("d"), col("cv")))),
          s => s.getField("cv")).as("civ"))
        .withColumn("cn2", idot(col("civ"), col("civ")))
        .localCheckpoint()
    }
    (cents, members)
  }

  /** Sampled-centroid cell assignment — the coarse quantizer shared by
    * [[annIvfTopK]] and [[semDedup]]: centroids are the `nCells`
    * lowest-id vectors, each corpus vector goes to its argmax
    * int64-cosine cell via ONE `max_by` aggregation over the broadcast
    * model (ties → smaller centroid id). Returns (vid, cid, iv, n2). */
  def assignSampledCells(df: DataFrame, id: Column, emb: Column,
      nCells: Int): DataFrame = {
    val p = prepared(df, id, emb)
    val cents = p.orderBy(col("vid")).limit(nCells)
      .select(col("vid").as("cid"), col("iv").as("civ"), col("n2").as("cn2"))
    assignCellsWith(p, cents)
  }

  /** Argmax-cosine cell assignment of a prepared table against an
    * arbitrary centroid model (cid, civ, cn2) — sampled or trained. */
  private def assignCellsWith(p: DataFrame, cents: DataFrame): DataFrame =
    p.crossJoin(broadcast(cents))
      .withColumn("ccos", cosineFromInts(idot(col("iv"), col("civ")),
        col("n2"), col("cn2")))
      .groupBy(col("vid"))
      .agg(max_by(col("cid"), struct(col("ccos"), -col("cid"))).as("cid"),
        first(col("iv")).as("iv"), first(col("n2")).as("n2"))

  /** SemDeDup-style semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus, then drop documents that
    * sit within cosine `threshold` of an earlier-id document IN THE
    * SAME CLUSTER — the cluster partition turns O(n²) semantic pairing
    * into O(Σ cell²), the whole point of the method at 100 TB.
    *
    * Clustering here is the deterministic sampled-centroid assignment
    * ([[annIvfTopK]]'s coarse quantizer; swap in [[kmeansCells]]
    * centroids for trained cells — the verdict machinery is identical).
    * Verdicts are deterministic: `dup_of` = the SMALLEST earlier vid
    * within threshold (first-writer-keeps, same tie-break as every
    * dedup op here), exact int64 dots, one IEEE divide.
    *
    * Output, one row per vector: (vec_id, cell, dup_of NULL-able,
    * dropped). Survivors = `NOT dropped` — the keep-set a curation
    * pipeline semi-joins against.
    *
    * `nCells` MUST grow with the corpus: the within-cell self-join is
    * O(Σ cell²), so a FIXED cell count degenerates back toward all-pairs
    * as n grows (SemDeDup itself uses tens of thousands of clusters at
    * web scale). Default `nCells = 0` means auto-size to
    * `max(16, ⌊√n⌋)` — expected cell size √n, total pair work O(n·√n) —
    * at the cost of one corpus count job; pass an explicit value (the
    * fixtures pin 16) to skip the count and fix the model size. */
  def semDedup(df: DataFrame, id: Column, emb: Column,
      threshold: Double = 0.3, nCells: Int = 0): DataFrame = {
    val cells =
      if (nCells > 0) nCells
      else math.max(16L, math.sqrt(df.count().toDouble).toLong).toInt
    semDedupAssigned(assignSampledCells(df, id, emb, cells), threshold)
  }

  /** [[semDedup]] with a CALLER-SUPPLIED centroid model — e.g.
    * [[kmeansFit]]'s trained output; the verdict machinery is
    * byte-identical to the sampled path. The same O(Σ cell²) scaling
    * contract applies: train the model with k ≈ √n or larger (SemDeDup's
    * own web-scale regime), not a fixed small k. */
  def semDedupWith(df: DataFrame, id: Column, emb: Column,
      threshold: Double, cents: DataFrame): DataFrame =
    semDedupAssigned(assignCellsWith(prepared(df, id, emb), cents),
      threshold)

  private def semDedupAssigned(assignment: DataFrame,
      threshold: Double): DataFrame = {
    // The assignment feeds BOTH pair-join sides and the output spine;
    // checkpoint it once instead of paying the broadcast-assign corpus
    // pass three times (the d12 PlanSpec pins the assignment subplan's
    // broadcast shape separately).
    val assigned = assignment.localCheckpoint()
    val a = assigned.as("a")
    val b = assigned.as("b")
    val dups = a.join(b, col("a.cid") === col("b.cid") &&
        col("b.vid") < col("a.vid"))
      .withColumn("cos", cosineFromInts(idot(col("a.iv"), col("b.iv")),
        col("a.n2"), col("b.n2")))
      .filter(col("cos") >= threshold)
      .groupBy(col("a.vid").as("vid"))
      .agg(min(col("b.vid")).as("dup_of"))
    assigned.select(col("vid"), col("cid"))
      .join(dups, Seq("vid"), "left")
      .select(col("vid").as("vec_id"), col("cid").as("cell"),
        col("dup_of"), col("dup_of").isNotNull.as("dropped"))
  }

  /** ANN recall audit — recall@k of the two approximate paths
    * ([[annLshTopK]] multi-probe, [[annIvfTopK]]) against the exact
    * [[annTopK]] baseline, per query: the number an ANN deployment
    * actually tunes nPlanes / nCells / probe width against, measured
    * instead of assumed. Everything reuses the three searches' own
    * plans; the audit adds two (qid, nid) equi-joins and one
    * aggregation — output cardinality = |queries|.
    *
    * Exactness: hit counts are integers, recalls one IEEE divide by k
    * — the whole audit is oracle-checkable like every other op here. */
  def annRecallAudit(corpus: DataFrame, queries: DataFrame, id: Column,
      emb: Column, k: Int = 10, nPlanes: Int = 8, dims: Int = -1,
      nCells: Int = 16): DataFrame = {
    val exact = annTopK(corpus, queries, id, emb, k)
      .select(col("qid"), col("nid"))
    val lsh = annLshTopK(corpus, queries, id, emb, k, nPlanes, dims)
      .select(col("qid"), col("nid"), lit(1L).as("in_lsh"))
    val ivf = annIvfTopK(corpus, queries, id, emb, k, nCells)
      .select(col("qid"), col("nid"), lit(1L).as("in_ivf"))
    exact
      .join(lsh, Seq("qid", "nid"), "left")
      .join(ivf, Seq("qid", "nid"), "left")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("in_lsh"), lit(0L))).as("lsh_hits"),
        sum(coalesce(col("in_ivf"), lit(0L))).as("ivf_hits"))
      .select(col("qid"), col("n_exact"), col("lsh_hits"), col("ivf_hits"),
        (col("lsh_hits").cast("double") / lit(k.toDouble)).as("lsh_recall"),
        (col("ivf_hits").cast("double") / lit(k.toDouble)).as("ivf_recall"))
  }

  /** s38: IVF cell-IMBALANCE report — the index-health metric next to
    * s37's recall curve: per-cell list sizes rolled into FAISS's
    * imbalance factor λ = k·Σs²/(Σs)² (λ = 1 ⇔ perfectly balanced;
    * probing a cell costs ∝ its size, so expected probe work scales
    * with λ — at 100 TB a hot cell IS the straggler task). Emitted as
    * exact integer numerator/denominator plus the double ratio;
    * min/max cell sizes identify the offenders. One assignment pass
    * ([[ivfInvertedLists]]) + a k-sized aggregation. Occupied-cell
    * count rides along (empty cells have no list rows); λ uses the
    * TOTAL k, FAISS's convention. */
  def cellImbalance(corpus: DataFrame, id: Column, emb: Column,
      cents: DataFrame): DataFrame = {
    val k = cents.count()
    val sz = ivfInvertedLists(corpus, id, emb, cents)
      .groupBy(col("cid")).agg(count(lit(1)).as("sz"))
    sz.agg(count(lit(1)).as("n_cells_occupied"),
        sum(col("sz")).as("n_vectors"),
        min(col("sz")).as("min_cell"), max(col("sz")).as("max_cell"),
        sum(col("sz") * col("sz")).as("sq_sum"))
      .select(col("n_cells_occupied"), lit(k).as("n_cells_total"),
        col("n_vectors"), col("min_cell"), col("max_cell"),
        (lit(k) * col("sq_sum")).as("imb_num"),
        (col("n_vectors") * col("n_vectors")).as("imb_den"),
        ((lit(k) * col("sq_sum")).cast("double") /
          (col("n_vectors") * col("n_vectors")).cast("double"))
          .as("imbalance"))
  }

  /** s37: the IVF serving dial MEASURED — recall@k as a function of
    * nProbe. Every IVF deployment tunes exactly this curve (probe 1
    * cell: fastest, lossiest; probe all: exact but pointless), and the
    * operational artifact is the table this emits: one row per probe
    * width with exact integer hit counts against the brute-force
    * baseline. The exact top-k computes ONCE (`localCheckpoint`, the
    * probe branches re-join it); each branch is the veteran
    * [[annIvfTopKProbed]] plan — candidates via cell equi-join, exact
    * int64 rerank — so the curve measures the serving path as
    * deployed, not a simplified copy. Queries are a broadcast-sized
    * set; corpus cost is one assignment pass per branch over the
    * shared `cents`. */
  def probeRecallCurve(corpus: DataFrame, queries: DataFrame, id: Column,
      emb: Column, k: Int, cents: DataFrame, probes: Seq[Int])
      : DataFrame = {
    val exact = annTopK(corpus, queries, id, emb, k)
      .select(col("qid"), col("nid")).localCheckpoint()
    probes.map { p =>
      val pr = annIvfTopKProbed(corpus, queries, id, emb, k, cents, p)
        .select(col("qid"), col("nid"), lit(1L).as("hit"))
      exact.join(pr, Seq("qid", "nid"), "left")
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(lit(p.toLong).as("n_probe"), col("n_exact"), col("n_hits"),
          (col("n_hits").cast("double") / col("n_exact").cast("double"))
            .as("recall"))
    }.reduce(_ unionByName _)
  }

  /** s43: the Johnson–Lindenstrauss DIMENSION dial measured — recall@k
    * of exact search run in an m-dim random-sign projection of the
    * corpus, one row per m. This is the remaining cell of the
    * compression matrix the s-suite audits: SQ (s18/s39) shrinks bits
    * PER dimension, Hamming (s16) keeps one bit per plane, JL drops
    * DIMENSIONS while preserving pairwise geometry (Achlioptas 2003:
    * ±1 signs suffice — no Gaussians needed). The table answers the
    * deployment question directly: how few dimensions can the first-
    * pass index hold before recall pays.
    *
    * The ladder exploits the sketch's PREFIX property: coefficient
    * signs depend on (plane, dim) only, so the m-dim projection is the
    * first m coordinates of the widest one — ONE map-only projection
    * pass serves every rung (the sketch a serving stack would actually
    * store). All projected coordinates are exact int64 (±1 · int-scaled
    * values; |pj| ≤ 64·maxscale ≈ 2²⁵ here, dots ≤ 2^54 — inside
    * int64), so ranks are bit-identical cross-engine; signs come from
    * the same md5 scheme as [[planeCoef]]. Queries are a tiny fixed
    * set; the corpus side is one narrow projection + the per-query
    * top-k window, never an all-pairs beyond the query×corpus rank
    * every exact-search rung costs by definition. */
  def jlRecallLadder(corpus: DataFrame, queries: DataFrame, id: Column,
      emb: Column, k: Int = 10, ms: Seq[Int] = Seq(4, 8, 16, 32),
      dims: Int = -1): DataFrame = {
    val d0 = if (dims > 0) dims else corpus.select(size(emb)).head().getInt(0)
    val mMax = ms.max
    val exact = annTopK(corpus, queries, id, emb, k)
      .select(col("qid"), col("nid")).localCheckpoint()
    def projected(df: DataFrame): DataFrame = {
      val iv = intScale(emb)
      val proj = array((0 until mMax).map { j =>
        idot(iv, typedLit((0 until d0).map(d =>
          if (planeCoef(j, d) >= 0) 1L else -1L)))
      }: _*)
      df.select(id.as("vid"), proj.as("pv"))
    }
    val c0 = projected(corpus).localCheckpoint()
    val q0 = projected(queries)
    ms.map { m =>
      def sliced(df: DataFrame): DataFrame = df
        .withColumn("sv", slice(col("pv"), 1, m))
        .withColumn("sn2", idot(col("sv"), col("sv")))
        .select(col("vid"), col("sv"), col("sn2"))
      val c = sliced(c0).as("c")
      // small-by-contract query frame: broadcast (annTopK discipline)
      val q = broadcast(sliced(q0)).as("q")
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("nid"))
      val pk = q.join(c, col("q.vid") =!= col("c.vid"))
        .select(col("q.vid").as("qid"), col("c.vid").as("nid"),
          cosineFromInts(idot(col("q.sv"), col("c.sv")),
            col("q.sn2"), col("c.sn2")).as("cos"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("qid"), col("nid"), lit(1L).as("hit"))
      exact.join(pk, Seq("qid", "nid"), "left")
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(lit(m.toLong).as("m_dims"), col("n_exact"),
          col("n_hits"),
          (col("n_hits").cast("double") / col("n_exact").cast("double"))
            .as("recall"))
    }.reduce(_ unionByName _)
  }

  /** s45: METRIC AGREEMENT TABLE — do cosine, raw dot (MIPS) and L2
    * rank the same neighbors? The metric choice is the first design
    * decision of any vector deployment, usually made by folklore
    * ("normalize and they're the same" — only true for unit norms);
    * this measures it: per metric pair, the mean top-k overlap across
    * the query set. All three rankings are exact-int64 scores
    * (cosine's int dot, raw [[idot]], [[sqDist]]) with (score, id)
    * ties, so every ranking — and therefore the table — is
    * bit-deterministic. Overlaps are integer sums; the mean is one
    * division. */
  def metricAgreement(corpus: DataFrame, queries: DataFrame, id: Column,
      emb: Column, k: Int = 10): DataFrame = {
    val c = prepared(corpus, id, emb).localCheckpoint()
    // small-by-contract query frame: broadcast (annTopK discipline)
    val q = broadcast(prepared(queries, id, emb))
    def topBy(score: Column, asc: Boolean): DataFrame = {
      val w = Window.partitionBy(col("qid")).orderBy(
        (if (asc) score.asc else score.desc), col("nid"))
      q.as("q").join(c.as("c"), col("q.vid") =!= col("c.vid"))
        .select(col("q.vid").as("qid"), col("c.vid").as("nid"),
          idot(col("q.iv"), col("c.iv")).as("dot"),
          sqDist(col("q.iv"), col("c.iv")).as("d2"),
          col("q.n2").as("qn2"), col("c.n2").as("cn2"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("qid"), col("nid"))
    }
    val cosTop = topBy(
      cosineFromInts(col("dot"), col("qn2"), col("cn2")), asc = false)
      .localCheckpoint()
    val dotTop = topBy(col("dot"), asc = false).localCheckpoint()
    val l2Top = topBy(col("d2"), asc = true).localCheckpoint()
    val nQ = queries.count()
    def overlap(name: String, a: DataFrame, b: DataFrame): DataFrame =
      a.join(b, Seq("qid", "nid"))
        .agg(count(lit(1)).as("overlap_sum"))
        .select(lit(name).as("metric_pair"),
          lit(nQ).as("n_queries"), lit(k.toLong).as("k"),
          col("overlap_sum"),
          (col("overlap_sum").cast("double") /
            lit((nQ * k).toDouble)).as("mean_overlap"))
    overlap("cos_vs_dot", cosTop, dotTop)
      .unionByName(overlap("cos_vs_l2", cosTop, l2Top))
      .unionByName(overlap("dot_vs_l2", dotTop, l2Top))
  }

  /** Recall@k audit of the QUANTIZED search paths — [[annSq8TopK]]
    * (8-bit codes) and [[annHammingTopK]] (1-bit signatures) measured
    * against the exact [[annTopK]] baseline, per query. The
    * compression ladder's governing question is "how much recall does
    * each bit cost"; this makes the answer a first-class, oracle-
    * checked table (same pattern as [[annRecallAudit]] for the
    * bucketed paths). All three searches keep their own plan shapes;
    * the audit itself is two tiny left joins on the k·queries result
    * sets. */
  def quantRecallAudit(corpus: DataFrame, queries: DataFrame, id: Column,
      emb: Column, k: Int = 10, nBits: Int = 48, dims: Int = -1)
      : DataFrame = {
    val exact = annTopK(corpus, queries, id, emb, k)
      .select(col("qid"), col("nid"))
    val sq8 = annSq8TopK(corpus, queries, id, emb, k)
      .select(col("qid"), col("nid"), lit(1L).as("in_sq8"))
    val ham = annHammingTopK(corpus, queries, id, emb, k, nBits, dims)
      .select(col("qid"), col("nid"), lit(1L).as("in_ham"))
    exact
      .join(sq8, Seq("qid", "nid"), "left")
      .join(ham, Seq("qid", "nid"), "left")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("in_sq8"), lit(0L))).as("sq8_hits"),
        sum(coalesce(col("in_ham"), lit(0L))).as("ham_hits"))
      .select(col("qid"), col("n_exact"), col("sq8_hits"), col("ham_hits"),
        (col("sq8_hits").cast("double") / lit(k.toDouble)).as("sq8_recall"),
        (col("ham_hits").cast("double") / lit(k.toDouble)).as("ham_recall"))
  }

  /** s39: the scalar-quantization BIT-WIDTH ladder measured — one row
    * per width (2/4/6/8 bits ↔ levels 1/7/31/127), each with its
    * corpus-wide quantization error AND its recall@k against the
    * exact baseline. This is the serving-memory dial (FAISS
    * `SQ4`/`SQ8`, int4 weight quant): halving bits halves scan bytes,
    * and this table says what it costs in geometry and in recall —
    * measured, not assumed (s18's discipline, widened to the whole
    * ladder). Exactness: codes q_i = floor(iv_i·L / amax) as in
    * [[quantizeInt8]]; per-vector squared error Σ(iv·L − q·amax)² is
    * an exact long, pre-scaled by integer division (÷10³ for the
    * numerator, ÷10⁶ for the L²·‖iv‖² denominator) so the corpus
    * SUMS stay < 2⁵³ and the relative-error ratio divides exactly
    * representable doubles — bit-identical in any engine. The exact
    * baseline and the per-width codes are each computed once
    * (localCheckpoint) and reused across the ladder. */
  def sqLadderAudit(corpus: DataFrame, queries: DataFrame, id: Column,
      emb: Column, k: Int = 10,
      widths: Seq[(Int, Long)] = Seq((2, 1L), (4, 7L), (6, 31L), (8, 127L)))
      : DataFrame = {
    val exact = annTopK(corpus, queries, id, emb, k)
      .select(col("qid"), col("nid")).localCheckpoint()
    val prepC = prepared(corpus, id, emb).localCheckpoint()
    val prepQ = prepared(queries, id, emb)
    widths.map { case (bits, level) =>
      def coded(p: DataFrame): DataFrame = p
        .withColumn("amax",
          aggregate(col("iv"), lit(0L), (a, x) => greatest(a, abs(x))))
        .withColumn("q", when(col("amax") > 0,
          transform(col("iv"), x =>
            floor((x * lit(level)).cast("double") /
              col("amax").cast("double")).cast("long")))
          .otherwise(transform(col("iv"), _ => lit(0L))))
        .withColumn("qn2", idot(col("q"), col("q")))
      val cc = coded(prepC)
      val errs = cc
        .withColumn("e2", aggregate(zip_with(col("iv"), col("q"),
          (x, y) => (x * lit(level) - y * col("amax")) *
            (x * lit(level) - y * col("amax"))),
          lit(0L), (a, v) => a + v))
        .agg(count(lit(1)).as("n_vectors"),
          sum(expr("e2 div 1000")).as("err_num_k"),
          sum(expr(s"($level * $level * n2) div 1000000"))
            .as("err_den_m"))
      val cq = broadcast(coded(prepQ)).as("q")
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("nid"))
      val topk = cq.join(cc.as("c"), col("q.vid") =!= col("c.vid"))
        .select(col("q.vid").as("qid"), col("c.vid").as("nid"),
          cosineFromInts(idot(col("q.q"), col("c.q")),
            col("q.qn2"), col("c.qn2")).as("cos"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
      val recall = exact
        .join(topk.select(col("qid"), col("nid"), lit(1L).as("hit")),
          Seq("qid", "nid"), "left")
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("hit"), lit(0L))).as("hits"))
      errs.crossJoin(recall)
        .select(lit(bits.toLong).as("bits"), lit(level).as("level"),
          col("n_vectors"), col("err_num_k"), col("err_den_m"),
          ((col("err_num_k").cast("double") /
            col("err_den_m").cast("double")) / lit(1000.0))
            .as("rel_err"),
          col("n_exact"), col("hits"),
          (col("hits").cast("double") / col("n_exact").cast("double"))
            .as("recall"))
    }.reduce(_ unionByName _)
  }

  /** One NN-descent refinement round (Dong et al. 2011, "Efficient
    * k-nearest neighbor graph construction for generic similarity
    * measures"): each node's candidate set is its current neighbors
    * plus neighbors-of-neighbors over the SYMMETRIZED graph (in- and
    * out-edges — Dong's forward + reverse lists), exact-int64-reranked
    * to top-k. This is the standard refinement that turns a cheap LSH
    * seed graph into a usable ANN graph; iterate to converge, one
    * round is what s19's audit measures.
    *
    * Scale shape: bounded BY CONSTRUCTION, never corpus-quadratic —
    * ≤ k out-edges per node → ≤ 2k symmetric edges → ≤ (2k)² expansion
    * candidates per node, independent of corpus size. All joins are
    * equi-joins on node id (shuffle-sharded); the rerank reuses the
    * [[prepared]] int vectors and the native [[idot]] kernel. */
  def nnDescentRound(corpus: DataFrame, id: Column, emb: Column,
      graph: DataFrame, k: Int): DataFrame = {
    val edges = graph.select(col("qid"), col("nid"))
    val sym = edges.unionByName(
      edges.select(col("nid").as("qid"), col("qid").as("nid"))).distinct()
    val expansion = sym.toDF("qid", "mid").as("a")
      .join(sym.toDF("mid", "nid").as("b"), Seq("mid"))
      .select(col("qid"), col("nid"))
      .filter(col("qid") =!= col("nid"))
    val cands = sym.unionByName(expansion).distinct()
    val p = prepared(corpus, id, emb)
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    cands
      .join(p.select(col("vid").as("qid"), col("iv").as("qiv"),
        col("n2").as("qn2")), Seq("qid"))
      .join(p.select(col("vid").as("nid"), col("iv").as("niv"),
        col("n2").as("nn2")), Seq("nid"))
      .select(col("qid"), col("nid"),
        cosineFromInts(idot(col("qiv"), col("niv")),
          col("qn2"), col("nn2")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Exact kNN graph as an edge list `(src, dst)` — the BUILD stage of
    * graph-traversal ANN (the HNSW/NSG family's layer-0 structure). The
    * fixture build is the exact all-pairs top-`degree`; at corpus scale
    * the same edge shape comes from [[annLshTopK]] seeding +
    * [[nnDescentRound]] refinement (the s17→s19 path) — the SEARCH
    * below only ever sees `(src, dst)` and is agnostic to how the graph
    * was built, which is exactly the build/serve split of s25's
    * stored-index lifecycle applied to a graph index. */
  def knnGraphEdges(corpus: DataFrame, id: Column, emb: Column,
      degree: Int): DataFrame =
    annTopK(corpus, corpus, id, emb, degree)
      .select(col("qid").as("src"), col("nid").as("dst"))

  /** [[knnGraphEdges]] in the blocked primitive-array form
    * ([[nearDupPairs]]'s execution shape): the corpus is hash-grouped
    * into ≤ `rowsPerBlock` blocks, block pairs meet in a
    * shuffle-replicate nested-loop cross join, and each task runs the
    * tight int64-dot `while` loop over its pair, maintaining a
    * per-source top-`degree` selection under the global
    * (cos desc, nid asc) order — so the union of per-block-pair local
    * winners provably contains the global top-`degree`, and the final
    * window ranks only n·√-ish candidate rows, never n² scored rows
    * through Catalyst expression eval. Bit-identical to
    * [[knnGraphEdges]] (same IEEE op order as the expression path —
    * spec-pinned) at ~10× less build wall-clock; the same
    * bounded-task-memory scaling contract as [[nearDupPairs]]. */
  def knnGraphEdgesBlocked(corpus: DataFrame, id: Column, emb: Column,
      degree: Int, rowsPerBlock: Int = 512): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val p = prepared(corpus, id, emb)
    val n = p.count()
    val nBlocks = math.max(1L, (n + rowsPerBlock - 1) / rowsPerBlock)
    val blocks = p
      .withColumn("blk", pmod(xxhash64(col("vid")), lit(nBlocks)))
      .groupBy(col("blk"))
      .agg(collect_list(struct(col("vid"), col("iv"), col("n2"))).as("rows"))
    val lhs = blocks.select(col("blk").as("ba"), col("rows").as("ra"))
    val rhs = blocks.select(col("blk").as("bb"), col("rows").as("rb"))
    val local = lhs.hint("shuffle_replicate_nl").crossJoin(rhs)
      .filter(col("ba") <= col("bb"))
      .as[(Long, Array[(Long, Array[Long], Long)],
           Long, Array[(Long, Array[Long], Long)])]
      .flatMap { case (ba, ra, bb, rb) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        // per-source top-`degree` under (cos desc, nid asc), insertion
        // into parallel arrays — degree is small, the loop is the cost
        def beats(c1: Double, n1: Long, c2: Double, n2: Long): Boolean =
          c1 > c2 || (c1 == c2 && n1 < n2)
        def topInto(src: Array[(Long, Array[Long], Long)],
            dst: Array[(Long, Array[Long], Long)], self: Boolean): Unit = {
          var i = 0
          while (i < src.length) {
            val (v1, iv1, n21) = src(i)
            val sq1 = math.sqrt(n21.toDouble)
            val kc = new Array[Double](degree)
            val kn = new Array[Long](degree)
            var used = 0
            var j = 0
            while (j < dst.length) {
              if (!(self && j == i)) {
                val (v2, iv2, n22) = dst(j)
                if (v2 != v1) {
                  var dot = 0L
                  var d = 0
                  while (d < iv1.length) { dot += iv1(d) * iv2(d); d += 1 }
                  val cos = dot.toDouble / (sq1 * math.sqrt(n22.toDouble))
                  if (used < degree || beats(cos, v2, kc(used - 1), kn(used - 1))) {
                    var pos = if (used < degree) used else degree - 1
                    while (pos > 0 && beats(cos, v2, kc(pos - 1), kn(pos - 1))) {
                      kc(pos) = kc(pos - 1); kn(pos) = kn(pos - 1); pos -= 1
                    }
                    kc(pos) = cos; kn(pos) = v2
                    if (used < degree) used += 1
                  }
                }
              }
              j += 1
            }
            var r = 0
            while (r < used) { out += ((v1, kn(r), kc(r))); r += 1 }
            i += 1
          }
        }
        if (ba == bb) topInto(ra, rb, self = true)
        else { topInto(ra, rb, self = false); topInto(rb, ra, self = false) }
        out
      }.toDF("src", "dst", "cos")
    val w = Window.partitionBy(col("src")).orderBy(col("cos").desc, col("dst"))
    local.withColumn("r", row_number().over(w))
      .filter(col("r") <= degree)
      .select(col("src"), col("dst"))
  }

  /** Graph-traversal ANN serving — a fixed-depth beam search over a
    * stored kNN graph (the greedy-routing idea of HNSW/NSG, Malkov &
    * Yashunin 2018, made deterministic and fixed-step so the whole
    * search is relational algebra): start at a deterministic entry
    * point (min corpus id — production graphs store a medoid), take the
    * entry's adjacency list as hop 1, keep the `beam` best hop-1 nodes
    * by exact cosine to the query (int64 dots, ties by node id), expand
    * their adjacency as hop 2, then exact-rerank every visited node and
    * return the top `k`. Two hops with beam pruning = the b-bounded
    * best-first frontier of graph ANN, unrolled to a fixed depth so
    * both engines (and the DuckDB oracle) compute the identical visit
    * set with no iteration-order nondeterminism.
    *
    * Why this exists next to IVF (s03/s10) and PQ (s07/s14): per-query
    * serving cost is `1 + degree + beam·degree` score evaluations —
    * INDEPENDENT of corpus size and of any cell-size skew, the
    * economics that made graph indexes the default serving structure.
    * The trade is build cost (the graph) and recall bounded by graph
    * connectivity — both measured on the fixture by the s09-pattern
    * audit in the spec.
    *
    * Scale shape: each hop is an equi-join of the (query-count × beam)
    * frontier against the graph on `src` — frontier-sized shuffles,
    * never corpus-sized; the graph artifact is hash-sharded by `src`
    * exactly like the s25 inverted lists; rerank touches only the
    * ≤ `1 + degree + beam·degree` visited rows per query. */
  def graphSearchTopK(corpus: DataFrame, queries: DataFrame, id: Column,
      emb: Column, graph: DataFrame, beam: Int, k: Int): DataFrame = {
    val c = prepared(corpus, id, emb)
    val q = prepared(queries, id, emb).select(col("vid").as("qid"),
      col("iv").as("qiv"), col("n2").as("qn2"))
    // Exact query→node cosine for a (qid, nid) candidate set; self
    // pairs are dropped (a query is never its own neighbor), matching
    // the all-pairs sims relation the oracle ranks over.
    def scored(cand: DataFrame): DataFrame = cand
      .join(c.select(col("vid").as("nid"), col("iv"), col("n2")), Seq("nid"))
      .join(q, Seq("qid"))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        cosineFromInts(idot(col("qiv"), col("iv")), col("qn2"), col("n2"))
          .as("cos"))
    val entry = broadcast(c.agg(min(col("vid")).as("entry_id")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    val hop1 = q.select(col("qid")).crossJoin(entry)
      .join(graph, col("entry_id") === col("src"))
      .select(col("qid"), col("dst").as("nid"))
    val beam1 = scored(hop1)
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= beam)
      .select(col("qid"), col("nid"))
    val hop2 = beam1.join(graph, beam1("nid") === graph("src"))
      .select(col("qid"), col("dst").as("nid"))
    val visited = q.select(col("qid")).crossJoin(entry)
      .select(col("qid"), col("entry_id").as("nid"))
      .unionByName(hop1).unionByName(hop2)
      .distinct()
    scored(visited)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** d22: medoid selection per trained cell — the SEMANTIC
    * cluster-representative policy (SemDeDup/SemDeDup-style pipelines
    * keep the member closest to the cluster's center of mass; d18's
    * keep-best is the TEXT-side length policy): per k-means cell, keep
    * the member minimizing the total squared distance to every other
    * member (the classic medoid), ties to the smaller id. The metric
    * is the INTEGER Σ‖a−b‖² on the µ-scaled vectors ([[sqDist]]'s
    * native kernel) — integer sums are order-independent, so unlike a
    * float cosine-sum medoid the selection is bit-deterministic and
    * oracle-checkable.
    *
    * Scale shape: the pair stage is the same O(Σ cell²) within-cell
    * self-join SemDeDup already pays ([[semDedupWith]]) — cells from
    * the trained model keep it O(n·√n) with √n cells; the argmin is a
    * cell-partitioned window over member-count-sized rows. Singleton
    * cells keep their only member with total 0. */
  def medoidPerCell(corpus: DataFrame, id: Column, emb: Column,
      cents: DataFrame): DataFrame = {
    val asg = assignCellsWith(prepared(corpus, id, emb), cents)
    val a = asg.select(col("cid"), col("vid").as("avid"),
      col("iv").as("aiv"))
    val b = asg.select(col("cid"), col("vid").as("bvid"),
      col("iv").as("biv"))
    val sums = a.join(b, Seq("cid"))
      .filter(col("avid") =!= col("bvid"))
      .select(col("cid"), col("avid"),
        sqDist(col("aiv"), col("biv")).as("d2"))
      .groupBy(col("cid"), col("avid"))
      .agg(sum(col("d2")).as("total_d2"))
    val members = asg.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"))
    val w = Window.partitionBy(col("cid"))
      .orderBy(col("total_d2").asc, col("avid").asc)
    asg.select(col("cid"), col("vid").as("avid"))
      .join(sums, Seq("cid", "avid"), "left")
      .withColumn("total_d2", coalesce(col("total_d2"), lit(0L)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(members, Seq("cid"))
      .select(col("cid").as("cell"), col("avid").as("medoid_id"),
        col("n_members"), col("total_d2"))
  }

  /** Per-dimension corpus statistics — the feature-normalization /
    * scaler-fitting pass (min-max bounds + coverage count per embedding
    * position) run before quantization or whitening. min/max involve no
    * arithmetic, so float results are exact and order-independent.
    *
    * Scale shape: posexplode fans each vector into `dims` rows, but the
    * aggregation combines partially map-side — the shuffle carries at
    * most dims × partitions pre-aggregated rows, never the corpus.
    * Output cardinality = dims (64 here), independent of corpus size. */
  def dimStats(df: DataFrame, emb: Column): DataFrame =
    df.select(posexplode(emb).as(Seq("dim", "x")))
      .groupBy(col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("cnt"),
        min(col("x")).as("mn"), max(col("x")).as("mx"))

  /** kNN classifier evaluation — the supervised quality gate on an
    * embedding space (Fix & Hodges' k-nearest-neighbor rule; in
    * pipelines: "do these embeddings separate my labels?" asked before
    * anyone trains on them). Each query vector is classified by the
    * MAJORITY LABEL of its k exact cosine neighbors (self excluded;
    * ties broken (votes desc, label asc) so the verdict is
    * deterministic), then scored against its own label. Output per
    * query: (vec_id, label, pred, correct).
    *
    * Scale shape: scoring reuses [[annTopK]]'s exact baseline (at
    * corpus scale the IVF/LSH ladder drops in — the vote stage only
    * sees the k-sized neighbor lists either way); the label attach is
    * a plain equi-join on neighbor id; voting aggregates k rows per
    * query. */
  /** PageRank over the kNN similarity graph — graph-centrality data
    * selection (the "most representative documents" signal used to
    * weight or subset corpora; Page et al. 1999, public). The rank is
    * FIXED-POINT INTEGER: scores scale at 10^6, each round is
    * r'(v) = 150000 + 85·(Σ_{u→v} r(u) div 8) div 100 — the 0.85
    * damping as integer arithmetic, out-degree exactly `degree` by
    * construction of the kNN graph — so the result is bit-identical
    * in any engine and insensitive to summation order (integer sums
    * commute; float PageRank is neither).
    *
    * Scale shape: the graph build is the one expensive stage (the s27
    * blocked kernel at fixture scale; the s17→s19 LSH + NN-descent
    * path at corpus scale); each of the `iters` rounds is one
    * edges⋈ranks equi-join + a group sum with map-side partials —
    * the standard distributed PageRank round, lineage truncated per
    * round like the connected-components loop. */
  def graphPageRank(corpus: DataFrame, id: Column, emb: Column,
      degree: Int = 8, iters: Int = 5): DataFrame = {
    val edges = knnGraphEdgesBlocked(corpus, id, emb, degree)
      .localCheckpoint()
    val nodes = corpus.select(id.cast("long").as("v")).localCheckpoint()
    var ranks = nodes.select(col("v"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      val contrib = edges.join(ranks, col("src") === col("v"))
        .select(col("dst"), expr(s"r div $degree").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inr"))
      ranks = nodes.join(contrib, col("v") === col("dst"), "left")
        .select(col("v"),
          (lit(150000L) +
            expr("85 * coalesce(inr, CAST(0 AS BIGINT)) div 100"))
            .as("r"))
        .localCheckpoint()
    }
    ranks.select(col("v").as("vec_id"), col("r").as("rank"))
  }

  /** Ranked-retrieval evaluation by mean reciprocal rank — the IR
    * metric every retrieval stack reports (Voorhees' MRR, public):
    * for each query, the rank of its FIRST relevant corpus item
    * (relevant = same label, self excluded) under the (cosine desc,
    * id asc) ranking, and rr = 1/rank. Every arithmetic step is
    * exact: cosines are the int64-dot doubles, the rank is a COUNT,
    * and 1/rank is one IEEE division — no log-discounted gain (NDCG's
    * transcendentals) needed for a deterministic oracle.
    *
    * Computed WITHOUT materializing a global ranking: pass 1 finds
    * the best relevant neighbor through a label equi-join (s22's
    * pre-filter shape — each query only meets its own label's corpus
    * partition); pass 2 counts how many corpus items outrank it
    * (cos >, or cos == with smaller id). rank = count + 1. Both
    * passes are join+aggregate — no sort of the corpus anywhere. */
  def retrievalMrr(corpus: DataFrame, id: Column, emb: Column,
      label: Column, nQueries: Int = 50): DataFrame = {
    val lab = corpus.select(id.as("lid"), label.cast("long").as("lbl"))
    val c = prepared(corpus, id, emb).join(lab, col("vid") === col("lid"))
      .select(col("vid"), col("iv"), col("n2"), col("lbl"))
    val q = c.filter(col("vid") < nQueries)
      .select(col("vid").as("qid"), col("iv").as("qiv"),
        col("n2").as("qn2"), col("lbl").as("qlbl"))
    val best = q.join(c,
        col("lbl") === col("qlbl") && col("vid") =!= col("qid"))
      .select(col("qid"), col("qlbl"), col("vid").as("nid"),
        cosineFromInts(idot(col("qiv"), col("iv")), col("qn2"), col("n2"))
          .as("cos"))
      .groupBy(col("qid"), col("qlbl"))
      .agg(max(struct(col("cos"), (-col("nid")).as("negid"))).as("b"))
      .select(col("qid"), col("qlbl"), col("b.cos").as("bcos"),
        (-col("b.negid")).as("bnid"))
    // pass 2's left side is nQueries rows (one per query) — broadcast
    // it so the corpus streams through the outrank count map-side
    broadcast(best
      .join(q.select(col("qid"), col("qiv"), col("qn2")), Seq("qid")))
      .join(c, col("vid") =!= col("qid"))
      .select(col("qid"), col("qlbl"), col("bcos"), col("bnid"),
        col("vid").as("nid"),
        cosineFromInts(idot(col("qiv"), col("iv")), col("qn2"), col("n2"))
          .as("cos"))
      .groupBy(col("qid"), col("qlbl"), col("bcos"), col("bnid"))
      .agg((count(when(col("cos") > col("bcos") ||
        (col("cos") === col("bcos") && col("nid") < col("bnid")), 1)) + 1L)
        .as("first_rel_rank"))
      .select(col("qid").as("vec_id"), col("qlbl").as("label"),
        col("first_rel_rank"),
        (lit(1.0) / col("first_rel_rank").cast("double")).as("rr"))
  }

  /** s33: per-cell quantization error under a FROZEN model — the
    * drift measurement behind the "when to retrain" decision the s26
    * add-path defers: every corpus vector's exact int64 squared
    * distance to its assigned centroid, rolled up per (cell, scope)
    * where `scope` separates the training-time members from
    * post-training arrivals. Rising arrival error relative to base
    * error IS quantizer drift; the numbers are exact integers, so the
    * gate is reproducible on any engine. Cost: one assignment pass +
    * one broadcast join — the same shape as serving. */
  def quantizationError(corpus: DataFrame, id: Column, emb: Column,
      cents: DataFrame, scope: Column): DataFrame = {
    graft.plans.GraftExtensions.register(corpus.sparkSession)
    ivfInvertedLists(corpus, id, emb, cents)
      .join(broadcast(cents), Seq("cid"))
      .select(col("cid").as("cell"), scope.as("scope"),
        call_function("graft_isqdist", col("iv"), col("civ")).as("d2"))
      .groupBy(col("cell"), col("scope"))
      .agg(count(lit(1)).as("n_vectors"), sum(col("d2")).as("sum_sqd"))
  }

  /** s35: matryoshka (dimension-truncation) recall audit — the MRL
    * serving dial measured, not assumed: for each prefix length kd,
    * brute-force top-k over vectors truncated to their first kd dims
    * is intersected with the full-dimension top-k, per query. The
    * cost/recall curve this emits is what decides how many dims the
    * serving tier stores (truncating 64→16 quarters memory and
    * bandwidth; this table says what it costs in recall). Same
    * integer-exact arithmetic as s01; every per-dim pass is the
    * brute oracle tier — at corpus scale each becomes an ANN-ladder
    * pass over the truncated vectors, with this as its audit. */
  def truncationRecall(corpus: DataFrame, id: Column, emb: Column,
      dims: Seq[Int] = Seq(8, 16, 32), nQueries: Int = 10,
      k: Int = 10): DataFrame = {
    def topk(pr: DataFrame): DataFrame = {
      val c = pr.as("c")
      // small-by-contract query frame: broadcast (annTopK discipline)
      val q = broadcast(pr.filter(col("vid") < nQueries)).as("q")
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("nid"))
      q.join(c, col("q.vid") =!= col("c.vid"))
        .select(col("q.vid").as("qid"), col("c.vid").as("nid"),
          cosineFromInts(idot(col("q.iv"), col("c.iv")),
            col("q.n2"), col("c.n2")).as("cos"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("qid"), col("nid"))
    }
    val full = prepared(corpus, id, emb).localCheckpoint()
    val exact = topk(full).localCheckpoint()
    val qids = full.filter(col("vid") < nQueries)
      .select(col("vid").as("qid"))
    dims.map { kd =>
      val trunc = full.select(col("vid"),
          slice(col("iv"), 1, kd).as("iv"))
        .withColumn("n2", idot(col("iv"), col("iv")))
      val hits = topk(trunc).join(exact, Seq("qid", "nid"))
        .groupBy(col("qid")).agg(count(lit(1)).as("nh"))
      qids.join(hits, Seq("qid"), "left_outer")
        .select(lit(kd.toLong).as("dim"), col("qid"),
          coalesce(col("nh"), lit(0L)).as("n_hits"))
    }.reduce(_ unionByName _)
  }

  /** s32: contrastive-pair mining — the training-data construction for
    * embedding models (triplet/InfoNCE): per anchor, the HARD NEGATIVE
    * is the highest-cosine neighbor with a DIFFERENT label (the
    * near-miss that teaches the margin) and the HARD POSITIVE is the
    * lowest-cosine neighbor with the SAME label (the far-apart pair
    * that must be pulled together); margin = pos_cos − neg_cos, the
    * quantity a triplet loss drives positive. One scored pass feeds
    * both argmax windows — no second join. Exact by the s01 brute
    * pass here (the mining ORACLE tier); at corpus scale the candidate
    * set comes from the ANN ladder (s02+) exactly as FAISS-mined
    * negatives do, with this as the per-candidate rerank. */
  def contrastivePairs(corpus: DataFrame, id: Column, emb: Column,
      label: Column, nQueries: Int = 50): DataFrame = {
    def prep(df: DataFrame) =
      df.select(id.as("vid"), label.cast("long").as("lbl"),
          intScale(emb).as("iv"))
        .withColumn("n2", idot(col("iv"), col("iv")))
    val c = prep(corpus).as("c")
    // anchors are the small-by-contract side: broadcast them so the
    // corpus streams once through the scoring pass
    val q = broadcast(prep(corpus.filter(id < nQueries))).as("q")
    val sims = q.join(c, col("q.vid") =!= col("c.vid"))
      .select(col("q.vid").as("qid"), col("q.lbl").as("lbl"),
        col("c.vid").as("nid"), col("c.lbl").as("nlbl"),
        cosineFromInts(idot(col("q.iv"), col("c.iv")),
          col("q.n2"), col("c.n2")).as("cos"))
    val negW = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    val posW = Window.partitionBy(col("qid"))
      .orderBy(col("cos").asc, col("nid"))
    val neg = sims.filter(col("nlbl") =!= col("lbl"))
      .withColumn("r", row_number().over(negW)).filter(col("r") === 1)
      .select(col("qid"), col("nid").as("hard_neg"),
        col("cos").as("neg_cos"))
    val pos = sims.filter(col("nlbl") === col("lbl"))
      .withColumn("r", row_number().over(posW)).filter(col("r") === 1)
      .select(col("qid"), col("nid").as("hard_pos"),
        col("cos").as("pos_cos"))
    neg.join(pos, Seq("qid"))
      .select(col("qid"), col("hard_neg"), col("neg_cos"),
        col("hard_pos"), col("pos_cos"),
        (col("pos_cos") - col("neg_cos")).as("margin"))
  }

  def knnClassify(corpus: DataFrame, id: Column, emb: Column,
      label: Column, nQueries: Int = 50, k: Int = 10): DataFrame = {
    val labels = corpus.select(id.as("lid"), label.cast("long").as("lbl"))
    val queries = corpus.filter(id < nQueries)
    val topk = annTopK(corpus, queries, id, emb, k)
    val votes = topk.join(labels, col("nid") === col("lid"))
      .groupBy(col("qid"), col("lbl"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("votes").desc, col("lbl"))
    val pred = votes.withColumn("r", row_number().over(w))
      .filter(col("r") === 1)
      .select(col("qid"), col("lbl").as("pred"))
    pred
      .join(labels.select(col("lid").as("qid"), col("lbl").as("label")),
        Seq("qid"))
      .select(col("qid").as("vec_id"), col("label"), col("pred"),
        (col("label") === col("pred")).as("correct"))
  }
}
