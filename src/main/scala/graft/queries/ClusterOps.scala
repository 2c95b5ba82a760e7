package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** First-class distributed clustering. s04/s06/s08 each train centroids
  * internally (seeded or sampled) as a means to an index; s12 exposes the
  * primitive itself: Lloyd's k-means over the full corpus, the MLlib
  * shape — per iteration ONE pass over the data computing per-cluster
  * integer sums/counts via `treeAggregate` against broadcast centroids,
  * then a driver-side update of the K×Dim table (metadata-sized at any
  * corpus scale; the per-iteration collect is K centroids, never rows).
  *
  * Cross-engine determinism (the s08 contract): quantized integer
  * vectors; assignment = argmin of EXACT integer squared L2, ties to the
  * lowest cell id; update = componentwise integer mean with truncation
  * toward zero (Scala `/`, Spark `div`, and DuckDB `//` all truncate —
  * verified on negatives); empty clusters keep their previous centroid.
  * Init = the K lowest-id vectors (k-means‖ seeding would add a
  * nondeterministic sample; the fixed seed is the oracle-replayable
  * choice, and the production upgrade path is seeding by s03's LSH
  * buckets). The DuckDB oracle replays the SAME [[KmIters]] iterations
  * as unrolled CTEs (the s08/t17 generated-SQL pattern), so both engines
  * derive identical centroids and assignments.
  *
  * Scale shape: the quantized frame is checkpointed once (corpus read
  * ONCE from parquet); each iteration is a map-side-combined aggregation
  * tree (treeAggregate) shipping K×Dim longs per partition — no shuffle
  * of data rows at all, the textbook "broadcast model / aggregate
  * statistics" iteration. The final labeling is one more scan emitting
  * (vec_id, cell, d2). At 1000 executors the per-iteration reduce is
  * depth-2 over 64 KiB payloads — centroid count, not corpus size, bounds
  * driver memory.
  */
object ClusterOps {
  import Tables._

  /** Cluster count. Deliberately small so the sf0.001 oracle's K×n
    * cross-join replay stays cheap; the kernel takes k as a parameter. */
  val KmK = 8

  /** Lloyd iterations (fixed — the oracle unrolls exactly this many). */
  val KmIters = 3

  /** s12: k-means over the embeddings corpus. Output: one row per vector
    * (vec_id, cell, d2) — its final cluster and exact integer squared L2
    * distance to that centroid. */
  def s12Kmeans(s: SparkSession, d: String): DataFrame =
    s12AssignOf(s, d).orderBy("vec_id")

  /** The quantize-and-cluster assignment derivation SHARED by s12 and
    * s14 (the Spark-side twin of [[kmeansSqlCtes]]'s sharing — if the
    * quantization or seeding ever changes, both queries move together). */
  private[graft] def s12AssignOf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    kmeansOf(s, embeddings(s, d)
      .select(col("vec_id"), expr(SimilarityOps.quantize("embedding")).as("q"))
      .as[(Long, Array[Long])].toDF("vec_id", "q"), KmK, KmIters)
  }

  /** The s12 kernel over any (vec_id, q: array<long>) frame
    * (graft.ops.Vectors API). Returns the final assignment frame. */
  private[graft] def kmeansOf(s: SparkSession, emb: DataFrame, k: Int,
                              iters: Int): DataFrame = {
    import s.implicits._
    require(k >= 1, s"kmeans: k must be >= 1, got $k")
    require(iters >= 0, s"kmeans: iters must be >= 0, got $iters")
    // corpus read once; every iteration and the final labeling scan the
    // materialized rows, never the parquet again
    val data = emb.select("vec_id", "q").as[(Long, Array[Long])]
      .localCheckpoint(true)
    val init = data.filter(_._1 < k).collect().sortBy(_._1)
    require(init.length == k,
      s"kmeans: need the $k seed vectors vec_id < $k, found ${init.length} — " +
        "ids must be dense from 0 (re-key the frame first)")
    val dim = init.head._2.length
    init.find(_._2.length != dim).foreach { case (id, v) =>
      throw new IllegalArgumentException(
        s"kmeans: seed vector $id has ${v.length} components, first has $dim")
    }
    var cents: Array[Array[Long]] = init.map(_._2.clone())
    var it = 0
    while (it < iters) {
      val bc = s.sparkContext.broadcast(cents)
      val (sums, counts) = data.rdd.treeAggregate(
        (Array.fill(k, dim)(0L), Array.fill(k)(0L)))(
        seqOp = { case ((sm, ct), (id, v)) =>
          if (v.length != dim) throw new IllegalArgumentException(
            s"kmeans: vector $id has ${v.length} components, centroids have $dim")
          val cell = assignCell(v, bc.value)
          ct(cell) += 1L
          var j = 0
          while (j < dim) { sm(cell)(j) += v(j); j += 1 }
          (sm, ct)
        },
        combOp = { case ((sa, ca), (sb, cb)) =>
          var c = 0
          while (c < k) {
            ca(c) += cb(c)
            var j = 0
            while (j < dim) { sa(c)(j) += sb(c)(j); j += 1 }
            c += 1
          }
          (sa, ca)
        })
      bc.destroy()
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0L) cents(c) // empty cluster keeps its centroid
        else Array.tabulate(dim)(j => sums(c)(j) / counts(c)) // trunc toward 0
      }
      it += 1
    }
    val bcF = s.sparkContext.broadcast(cents)
    data.mapPartitions { rows =>
      val cs = bcF.value
      rows.map { case (id, v) =>
        if (v.length != dim) throw new IllegalArgumentException(
          s"kmeans: vector $id has ${v.length} components, centroids have $dim")
        val cell = assignCell(v, cs)
        var d2 = 0L; var j = 0
        while (j < dim) { val df = v(j) - cs(cell)(j); d2 += df * df; j += 1 }
        (id, cell.toLong, d2)
      }
    }.toDF("vec_id", "cell", "d2")
  }

  /** argmin integer squared L2, strict `<` so ties go to the lowest cell
    * (matches the oracle's ORDER BY d2, cell). */
  private def assignCell(v: Array[Long], cents: Array[Array[Long]]): Int = {
    var best = 0; var bestD = Long.MaxValue
    var c = 0
    while (c < cents.length) {
      var d2 = 0L; var j = 0
      val ct = cents(c)
      while (j < v.length) { val df = v(j) - ct(j); d2 += df * df; j += 1 }
      if (d2 < bestD) { bestD = d2; best = c }
      c += 1
    }
    best
  }

  /** The identical training replayed as unrolled per-iteration CTEs,
    * ending in `<p>assign` = (vec_id, cell, d2) — SHARED by s12Sql and
    * s14Sql (the dsirSqlCtes anti-drift lesson): the coreset oracle
    * samples from EXACTLY the s12 clustering. */
  private[graft] def kmeansSqlCtes(p: String): String = {
    val iters = (1 to KmIters).map { i =>
      s"""${p}kd$i AS (
         |  SELECT e.vec_id, c.cell, SUM((e.x - c.x) * (e.x - c.x)) AS d2
         |  FROM ${p}kelems e JOIN ${p}kc${i - 1} c USING (j) GROUP BY 1, 2
         |), ${p}ka$i AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rk
         |    FROM ${p}kd$i) WHERE rk = 1
         |), ${p}ku$i AS (
         |  SELECT a.cell, e.j, CAST(SUM(e.x) // COUNT(*) AS BIGINT) AS x
         |  FROM ${p}ka$i a JOIN ${p}kelems e USING (vec_id) GROUP BY 1, 2
         |), ${p}kc$i AS (
         |  SELECT c.cell, c.j, COALESCE(u.x, c.x) AS x
         |  FROM ${p}kc${i - 1} c
         |  LEFT JOIN ${p}ku$i u ON c.cell = u.cell AND c.j = u.j
         |)""".stripMargin
    }.mkString(", ")
    val cN = s"${p}kc$KmIters"
    s"""${p}kq AS (
       |  SELECT vec_id, ${SimilarityOps.qEmbDuck} AS qv FROM embeddings
       |), ${p}kelems AS (
       |  SELECT vec_id, generate_subscripts(qv, 1) AS j, unnest(qv) AS x FROM ${p}kq
       |), ${p}kc0 AS (
       |  SELECT vec_id AS cell, j, x FROM ${p}kelems WHERE vec_id < $KmK
       |), $iters, ${p}kdf AS (
       |  SELECT e.vec_id, c.cell, SUM((e.x - c.x) * (e.x - c.x)) AS d2
       |  FROM ${p}kelems e JOIN $cN c USING (j) GROUP BY 1, 2
       |), ${p}assign AS (
       |  SELECT vec_id, cell, d2 FROM (
       |    SELECT vec_id, cell, d2,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rk
       |    FROM ${p}kdf) WHERE rk = 1
       |)""".stripMargin
  }

  val s12Sql: String =
    s"""WITH ${kmeansSqlCtes("")}
       |SELECT vec_id, CAST(cell AS BIGINT) AS cell, CAST(d2 AS BIGINT) AS d2
       |FROM assign ORDER BY vec_id""".stripMargin

  /** s14's keep rule: per cluster, the ceil(size / this) most CENTRAL
    * vectors survive — integerized as `rank ≤ (size + den−1) div den`. */
  val CoresetKeepDen = 4L

  /** s14: cluster-balanced coreset sampling — the D4-style (Tirumala et
    * al. 2023, arXiv:2308.12284) diversity-preserving selection built ON
    * the s12 clustering: rank every vector within its cluster by distance
    * to the centroid and keep the most central ceil(size/4) per cluster.
    * Uniform sampling over-represents the corpus's dense modes; per-
    * cluster quotas guarantee every mode keeps representation, and the
    * most-central rule keeps each mode's prototypes (flip the ordering
    * for outlier mining — the facade exposes it). Output: one verdict row
    * per vector (cell, d2, cell_rank, cell_size, kept).
    *
    * Scale shape: the s12 assignment plan (corpus read once, broadcast-
    * model sweeps) plus ONE per-cell window — cell partitions are corpus/k
    * sized, a keyed shuffle, no global sort. The oracle samples from
    * EXACTLY the s12 clustering via the shared [[kmeansSqlCtes]]. */
  def s14CoresetSample(s: SparkSession, d: String): DataFrame =
    coresetOf(s12AssignOf(s, d), CoresetKeepDen).orderBy("vec_id")

  /** s14's kernel over any (vec_id, cell, d2) assignment frame
    * (graft.ops.Vectors API). `central = false` keeps the FARTHEST
    * per cluster instead (outlier mining). */
  private[graft] def coresetOf(assign: DataFrame, keepDen: Long,
                               central: Boolean = true): DataFrame = {
    require(keepDen >= 1, s"coreset: keepDen must be >= 1, got $keepDen")
    val ord = if (central) Seq(col("d2").asc, col("vec_id").asc)
    else Seq(col("d2").desc, col("vec_id").asc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cell").orderBy(ord: _*)
    val wc = org.apache.spark.sql.expressions.Window.partitionBy("cell")
    assign
      .withColumn("cell_rank", row_number().over(w).cast("long"))
      .withColumn("cell_size", count(lit(1)).over(wc).cast("long"))
      .withColumn("kept",
        col("cell_rank") <= expr(s"(cell_size + ${keepDen - 1}) div $keepDen"))
      .select("vec_id", "cell", "d2", "cell_rank", "cell_size", "kept")
  }

  val s14Sql: String =
    s"""WITH ${kmeansSqlCtes("c")}
       |SELECT vec_id, CAST(cell AS BIGINT) AS cell, CAST(d2 AS BIGINT) AS d2,
       |  CAST(rk AS BIGINT) AS cell_rank, CAST(cnt AS BIGINT) AS cell_size,
       |  rk <= (cnt + ${CoresetKeepDen - 1}) // $CoresetKeepDen AS kept
       |FROM (SELECT vec_id, cell, d2,
       |        ROW_NUMBER() OVER (PARTITION BY cell ORDER BY d2, vec_id) AS rk,
       |        COUNT(*) OVER (PARTITION BY cell) AS cnt
       |      FROM cassign)
       |ORDER BY vec_id""".stripMargin

  /** PageRank iterations (fixed — the oracle unrolls exactly this many). */
  val PrIters = 3

  /** s13: PageRank centrality over the s11 approximate kNN graph — the
    * graph-analytics step after neighborhood construction: a vector many
    * similarity edges point at with high weight is a HUB of its
    * neighborhood (the D4/SemDeDup curation families prune around such
    * hubs; conversely low-centrality isolates are the diversity tail).
    * Demonstrates the iterative-propagation family (d07's min-label
    * connected components is the other member) on top of a reused edge
    * builder.
    *
    * Deterministic integer PageRank in milli units, damping 0.85:
    * pr⁰ = 1000 per node; per iteration each node sends pr div outdeg
    * along every out-edge and pr' = 150 + (850 · Σ received) div 1000.
    * All floors are identical in both engines (nonnegative operands);
    * dangling nodes (no banded-LSH candidates at all) send nothing —
    * their mass leaks, the standard simplification, documented rather
    * than patched. The DuckDB oracle re-derives the SAME s11 edge list
    * (shared knnSqlCtes) and unrolls the same [[PrIters]] iterations.
    *
    * Scale shape: the edge list (≤ k·n rows) is built once by the s11
    * plan and checkpointed; each iteration is two hash-partitioned
    * equi-joins (edges ⋈ scores on the sender key, nodes ⋈ contributions
    * on the receiver key) and one hash agg — the unrolled-Pregel shape,
    * no global sort, no cross product, the corpus parquet never re-read. */
  def s13Pagerank(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val emb = SimilarityOps.withQuantized(embeddings(s, d), "embedding")
    val edges = SimilarityOps.knnGraphOf(emb, SimilarityOps.KnnK)
      .select("vec_id", "neighbor_id").localCheckpoint(true)
    val nodes = emb.select("vec_id").localCheckpoint(true)
    pagerankOf(nodes, edges, PrIters).orderBy("vec_id")
  }

  /** The s13 kernel over any (vec_id) node frame + (vec_id, neighbor_id)
    * edge frame (graft.ops.Vectors API). Callers must pass frames that do
    * not re-plan expensive lineage per iteration (checkpoint them). */
  private[graft] def pagerankOf(nodes: DataFrame, edges: DataFrame,
                                iters: Int): DataFrame = {
    require(iters >= 0, s"pagerank: iters must be >= 0, got $iters")
    val outdeg = edges.groupBy("vec_id").agg(count(lit(1)).as("deg"))
    // r15 (guide §2.4): attach the sender's out-degree to the edge list
    // ONCE before the loop — the old shape re-joined `outdeg` (itself an
    // aggregation over the edges) inside every iteration, re-running that
    // aggregate + join iters times; each unrolled iteration now joins the
    // degree-annotated edges against the scores only. Same arithmetic:
    // `pr div deg` per out-edge, deg constant across iterations.
    val edgesDeg = edges.join(outdeg, "vec_id")
      .select(col("vec_id"), col("neighbor_id"), col("deg"))
      .localCheckpoint(true)
    var pr = nodes.select(col("vec_id"), lit(1000L).as("pr"))
    var it = 0
    while (it < iters) {
      val contrib = edgesDeg
        .join(pr, "vec_id")
        .select(col("neighbor_id").as("vec_id"),
          expr("pr div deg").as("share"))
        .groupBy("vec_id").agg(sum("share").as("c"))
      pr = nodes.join(contrib, Seq("vec_id"), "left")
        .select(col("vec_id"),
          (lit(150L) + expr("(850 * coalesce(c, 0L)) div 1000")).as("pr"))
      it += 1
    }
    pr.join(outdeg, Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("deg"), lit(0L)).as("deg"),
        col("pr").as("pr_milli"))
  }

  val s13Sql: String = {
    val iters = (1 to PrIters).map { i =>
      s"""pc$i AS (
         |  SELECT e.neighbor_id AS vec_id, SUM(p.pr // d.deg) AS c
         |  FROM pedges e JOIN poutdeg d ON e.vec_id = d.vec_id
         |  JOIN pr${i - 1} p ON e.vec_id = p.vec_id
         |  GROUP BY 1
         |), pr$i AS (
         |  SELECT n.vec_id,
         |    150 + (850 * COALESCE(c.c, 0)) // 1000 AS pr
         |  FROM pnodes n LEFT JOIN pc$i c ON n.vec_id = c.vec_id
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH ${SimilarityOps.knnSqlCtes("g")},
       |pedges AS (
       |  SELECT vec_id, neighbor_id FROM granked
       |  WHERE rk <= ${SimilarityOps.KnnK}
       |), pnodes AS (
       |  SELECT vec_id FROM gq
       |), poutdeg AS (
       |  SELECT vec_id, COUNT(*) AS deg FROM pedges GROUP BY 1
       |), pr0 AS (
       |  SELECT vec_id, 1000 AS pr FROM pnodes
       |), $iters
       |SELECT n.vec_id, CAST(COALESCE(d.deg, 0) AS BIGINT) AS deg,
       |  CAST(p.pr AS BIGINT) AS pr_milli
       |FROM pnodes n
       |LEFT JOIN poutdeg d ON n.vec_id = d.vec_id
       |JOIN pr$PrIters p ON n.vec_id = p.vec_id
       |ORDER BY n.vec_id""".stripMargin
  }

  // ---------------------------------------------------------------- t23

  /** Terms emitted per cluster label list. */
  val LabelTopK = 5

  /** Minimum per-cell occurrences for a term to be a label candidate —
    * the standard support floor that keeps one-off tokens from claiming
    * huge lifts. */
  val LabelMinTf = 5L

  /** t23: cluster topic labeling — the curation step that makes an
    * embedding clustering HUMAN-AUDITABLE (and machine-routable): for
    * each s12 k-means cell, the most OVER-REPRESENTED corpus terms by
    * integer lift (the PMI-style statistic topic labelers like BERTopic's
    * c-TF-IDF approximate): `score_milli = (1000 · tf · T) div
    * (T_cell · ctf)` — the cell's term rate over the corpus term rate in
    * milli units. Terms at or below corpus rate (≤ 1000) and below the
    * [[LabelMinTf]] support floor are suppressed; top-[[LabelTopK]] per
    * cell by (score desc, term). A presence-based cluster-count idf would
    * be vacuous on ubiquitous-vocabulary corpora (every term in every
    * cell — exactly this synthetic corpus); rate lift discriminates
    * whenever cluster composition skews term RATES, which is what
    * "distinctive term" means. Cross-modal: the VECTOR arm (s12
    * assignment over embeddings) joins the TEXT arm (documents) on the
    * shared id space (the p07 convention).
    *
    * Scale shape: ONE corpus text scan (explode → hash agg per
    * (cell, term)) equi-joined on the THIN assignment frame (id, cell —
    * co-partitioned on the id at 100 TB); corpus totals, cell totals and
    * term totals all derive from the (k × vocab)-sized tf table
    * (checkpointed — never a second corpus scan); the top-k window
    * partitions by cell. The s12 model sweeps are the clustering's own
    * cost, shared via [[s12AssignOf]] exactly like s14. The exact-integer
    * range is guarded by a named error on the actual worst-case products
    * (`1000·max(tf)·T` and `max(cell_toks)·max(ctf)` vs Long.MaxValue,
    * metadata-sized aggs) — past that, label per corpus shard (labels
    * are a per-shard diagnostic anyway). */
  def t23ClusterLabels(s: SparkSession, d: String): DataFrame =
    clusterLabelsOf(s12AssignOf(s, d), documents(s, d), LabelTopK,
      LabelMinTf)
      .orderBy("cell", "rk")

  /** True iff every milli-lift row computes exactly in Long arithmetic:
    * worst numerator `1000·max(tf)·toks` and worst denominator
    * `max(cell_toks)·max(ctf)` both fit. A total-token ceiling alone is
    * wrong in both directions — a degenerate one-term corpus overflows
    * the numerator at ~10^8 tokens, while a flat vocabulary is exact far
    * past 3·10^9. */
  private[graft] def milliLiftRangeOk(toks: Long, maxTf: Long,
                                      maxCellToks: Long, maxCtf: Long): Boolean = {
    val lmax = BigInt(Long.MaxValue)
    BigInt(1000) * maxTf * toks <= lmax && BigInt(maxCellToks) * maxCtf <= lmax
  }

  /** t23's kernel over any (vec_id, cell, ...) assignment and
    * (doc_id, text) corpus sharing an id space (graft.ops.Vectors API). */
  private[graft] def clusterLabelsOf(assign: DataFrame, docs: DataFrame,
                                     topK: Int, minTf: Long): DataFrame = {
    require(topK >= 1, s"clusterLabels: topK must be >= 1, got $topK")
    require(minTf >= 1, s"clusterLabels: minTf must be >= 1, got $minTf")
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .join(assign.select(col("vec_id").as("doc_id"), col("cell")), "doc_id")
      .groupBy("cell", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    // corpus/cell totals stay LAZY (r16): each is a metadata-sized agg
    // over the checkpointed k×vocab tf table, consumed once in the guard
    // job and once in the final join — re-deriving them there is cheaper
    // than the two eager-checkpoint jobs the old shape scheduled
    val corpusTf = tf.groupBy("term").agg(sum("tf").as("ctf"))
    val cellTot = tf.groupBy("cell").agg(sum("tf").as("cell_toks"))
    val tot = tf.agg(sum("tf").as("toks"))
    // Exact-integer range guard on the ACTUAL worst-case per-row products
    // (all metadata-sized aggs over the checkpointed k×vocab tf table):
    // numerator 1000·tf·toks is worst at max(tf); denominator
    // cell_toks·ctf is worst at max(cell_toks)·max(ctf). A total-token
    // ceiling alone is wrong in both directions — a degenerate one-term
    // corpus overflows the numerator at ~10^8 tokens, while a flat
    // vocabulary is exact far past 3·10^9. All four scalars come back in
    // ONE job (r16 — the old shape scheduled four sequential .head()
    // round-trips over the same checkpointed table).
    val statsRow = tf.agg(sum("tf").as("toks"), max("tf").as("maxTf"))
      .crossJoin(corpusTf.agg(max("ctf").as("maxCtf")))
      .crossJoin(cellTot.agg(max("cell_toks").as("maxCell")))
      .head()
    if (!statsRow.isNullAt(0)) {
      val toks = statsRow.getLong(0)
      val maxTf = statsRow.getLong(1)
      val maxCtf = statsRow.getLong(2)
      val maxCell = statsRow.getLong(3)
      require(milliLiftRangeOk(toks, maxTf, maxCell, maxCtf),
        s"clusterLabels: corpus exceeds the exact milli-lift integer " +
          s"range (toks=$toks, max tf=$maxTf, max cell=$maxCell, max " +
          s"ctf=$maxCtf) — label per corpus shard instead")
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cell").orderBy(col("score_milli").desc, col("term"))
    tf.join(corpusTf, "term").join(broadcast(cellTot), "cell")
      .crossJoin(broadcast(tot))
      .withColumn("score_milli",
        expr("(1000 * tf * toks) div (cell_toks * ctf)"))
      .filter(col("tf") >= minTf && col("score_milli") > 1000)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= topK)
      .select("cell", "rk", "term", "tf", "score_milli")
  }

  /** Oracle: labels from EXACTLY the s12 clustering (shared
    * [[kmeansSqlCtes]] — the dsirSqlCtes anti-drift lesson). */
  val t23Sql: String =
    s"""WITH ${kmeansSqlCtes("")}, lw AS (
       |  SELECT a.cell, unnest(string_split(d.text, ' ')) AS term
       |  FROM documents d JOIN assign a ON d.doc_id = a.vec_id
       |), ltf AS (
       |  SELECT cell, term, COUNT(*) AS tf FROM lw GROUP BY 1, 2
       |), lct AS (
       |  SELECT term, CAST(SUM(tf) AS BIGINT) AS ctf FROM ltf GROUP BY 1
       |), lcl AS (
       |  SELECT cell, CAST(SUM(tf) AS BIGINT) AS cell_toks
       |  FROM ltf GROUP BY 1
       |), ltot AS (
       |  SELECT CAST(SUM(tf) AS BIGINT) AS toks FROM ltf
       |), lsc AS (
       |  SELECT t.cell, t.term, t.tf,
       |    CAST((1000 * t.tf * o.toks) // (c.cell_toks * g.ctf) AS BIGINT)
       |      AS score_milli
       |  FROM ltf t JOIN lct g USING (term) JOIN lcl c USING (cell)
       |  CROSS JOIN ltot o
       |  WHERE t.tf >= $LabelMinTf
       |), lr AS (
       |  SELECT cell, term, tf, score_milli,
       |    ROW_NUMBER() OVER (PARTITION BY cell
       |      ORDER BY score_milli DESC, term) AS rk
       |  FROM lsc WHERE score_milli > 1000)
       |SELECT CAST(cell AS BIGINT) AS cell, CAST(rk AS BIGINT) AS rk, term,
       |  CAST(tf AS BIGINT) AS tf, score_milli
       |FROM lr WHERE rk <= $LabelTopK ORDER BY cell, rk""".stripMargin

  // ---------------------------------------------------------------- s17

  /** s17: cluster-quality audit against reference labels — the QA stage
    * that closes the clustering loop: every corpus with a labeled slice
    * (here the embeddings table's `label` column) should VALIDATE its
    * clustering before curation decisions (s14 coresets, s06 SemDeDup
    * pruning, t23 routing) are built on it. Per s12 cell: size, distinct
    * label count, the majority label (ties to the lowest label id) and
    * integer purity `1000·top_n div n_vecs` — the standard external
    * clustering metric, exact in milli units. A cell whose purity sits
    * at chance level is noise, not structure; downstream per-cell quotas
    * should treat it as such.
    *
    * Scale shape: ONE equi-join of the thin s12 assignment frame onto
    * the (vec_id, label) columns (co-partitioned on vec_id at 100 TB),
    * hash-agg to the k×L contingency table — everything after is
    * metadata-sized (a window and a broadcast join over ≤ k·L rows).
    * The s12 model sweeps are the clustering's own cost, shared via
    * [[s12AssignOf]] exactly like s14/t23. Oracle: purity from EXACTLY
    * the s12 clustering (shared [[kmeansSqlCtes]]). */
  def s17ClusterPurity(s: SparkSession, d: String): DataFrame =
    clusterPurityOf(s12AssignOf(s, d),
      embeddings(s, d).select("vec_id", "label"))
      .orderBy("cell")

  /** s17's corpus pass — the one equi-join + hash agg producing the k×L
    * contingency table. Exposed lazily so PlanSpec can pin its physical
    * shape (one pruned label read, no cross product), which the eager
    * checkpoint in [[clusterPurityOf]] would otherwise hide (the
    * bm25PostingsLazy pattern). */
  private[graft] def purityContingencyLazy(assign: DataFrame,
                                           labels: DataFrame): DataFrame =
    assign.select("vec_id", "cell")
      .join(labels.select("vec_id", "label"), "vec_id")
      .groupBy("cell", "label").agg(count(lit(1)).as("n"))

  /** s17's kernel over any (vec_id, cell, ...) assignment and
    * (vec_id, label) frame sharing an id space (graft.ops.Vectors API). */
  private[graft] def clusterPurityOf(assign: DataFrame,
                                     labels: DataFrame): DataFrame = {
    // the window branch AND the totals branch both consume the
    // contingency table — checkpoint the k×L rows so the corpus join
    // runs once, not once per branch
    val cnt = purityContingencyLazy(assign, labels).localCheckpoint(true)
    // asc_nulls_last: Spark's plain asc sorts NULL labels FIRST, which
    // would let a null label win ties over any real one (and diverge
    // from DuckDB's nulls-last default)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cell").orderBy(col("n").desc, col("label").asc_nulls_last)
    val tot = cnt.groupBy("cell").agg(sum("n").as("n_vecs"),
      count(lit(1)).as("n_labels"))
    cnt.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .join(broadcast(tot), "cell")
      .withColumn("purity_milli", expr("(1000 * n) div n_vecs"))
      .select(col("cell"), col("n_vecs"), col("n_labels"),
        col("label").as("top_label"), col("n").as("top_n"),
        col("purity_milli"))
  }

  val s17Sql: String =
    s"""WITH ${kmeansSqlCtes("u")}, uj AS (
       |  SELECT a.cell, e.label FROM uassign a
       |  JOIN embeddings e USING (vec_id)
       |), uc AS (
       |  SELECT cell, label, COUNT(*) AS n FROM uj GROUP BY 1, 2
       |), ut AS (
       |  SELECT cell, label, n,
       |    ROW_NUMBER() OVER (PARTITION BY cell ORDER BY n DESC, label) AS rk
       |  FROM uc
       |), ua AS (
       |  SELECT cell, CAST(SUM(n) AS BIGINT) AS n_vecs,
       |    COUNT(*) AS n_labels
       |  FROM uc GROUP BY 1)
       |SELECT CAST(t.cell AS BIGINT) AS cell, a.n_vecs,
       |  CAST(a.n_labels AS BIGINT) AS n_labels, t.label AS top_label,
       |  CAST(t.n AS BIGINT) AS top_n,
       |  CAST((1000 * t.n) // a.n_vecs AS BIGINT) AS purity_milli
       |FROM ut t JOIN ua a USING (cell) WHERE t.rk = 1
       |ORDER BY t.cell""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s12_kmeans" -> s12Kmeans _,
    "s13_knn_pagerank" -> s13Pagerank _,
    "s14_coreset_sample" -> s14CoresetSample _,
    "s17_cluster_purity" -> s17ClusterPurity _,
    "t23_cluster_labels" -> t23ClusterLabels _,
  )

  val oracles: Map[String, String] = Map(
    "s12_kmeans" -> s12Sql,
    "s13_knn_pagerank" -> s13Sql,
    "s14_coreset_sample" -> s14Sql,
    "s17_cluster_purity" -> s17Sql,
    "t23_cluster_labels" -> t23Sql,
  )
}
