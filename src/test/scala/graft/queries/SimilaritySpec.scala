package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Recall probe for the LSH-based near-dup query (round-2 advisor item):
  * the DuckDB oracle replicates s02's hyperplanes, so the driver harness
  * only proves engine agreement on the shared candidate set — this spec
  * measures the stated `cosine >= 0.45` semantics against brute force.
  */
class SimilaritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-similarity")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // sf0.01 — the driver's own correctness scale; sf0.001 has only 7 true
  // pairs, where one unlucky boundary miss (4%/pair expected) fails any
  // meaningful recall bar
  private val d = "/root/testdata/sf0.01"

  /** Driver-side exact all-pairs with the same quantization + rounding as
    * the query (round(x*1000) per element; sim rounded HALF_UP to 6dp). */
  private def bruteForcePairs(): Set[(Long, Long)] = {
    val vecs: Array[(Long, Array[Long])] = spark.read
      .parquet(s"$d/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint)) as q")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)
    val norms = vecs.map { case (_, v) => v.map(x => x * x).sum }
    val out = Set.newBuilder[(Long, Long)]
    for (i <- vecs.indices; j <- (i + 1) until vecs.length) {
      val (ia, va) = vecs(i); val (ib, vb) = vecs(j)
      var dot = 0L; var k = 0
      while (k < va.length) { dot += va(k) * vb(k); k += 1 }
      val sim = BigDecimal(dot.toDouble / (math.sqrt(norms(i).toDouble) * math.sqrt(norms(j).toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (sim >= 0.45) out += ((ia, ib))
    }
    out.result()
  }

  test("s06 semantic dedup equals the driver-side recompute exactly") {
    // recompute the full rule with plain loops: sqrt(n) seed centroids,
    // nearest cell by exact integer L2 (ties -> lower cid), then within a
    // cell a vector is pruned iff a lower-id member has cosine >= 0.45
    val vecs: Array[(Long, Array[Long])] = spark.read
      .parquet(s"$d/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint)) as q")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)
    val numCells = math.ceil(math.sqrt(vecs.length.toDouble)).toLong
    val cents = vecs.filter(_._1 < numCells)
    def cellOf(v: Array[Long]): Long =
      cents.map { case (cid, c) =>
        var d2 = 0L; var k = 0
        while (k < v.length) { val df = v(k) - c(k); d2 += df * df; k += 1 }
        (d2, cid)
      }.min._2
    val cells = vecs.map { case (id, v) => id -> cellOf(v) }.toMap
    val norms = vecs.map { case (id, v) => id -> v.map(x => x * x).sum }.toMap
    val expected = vecs.map { case (id, v) =>
      val pruned = vecs.exists { case (oid, ov) =>
        oid < id && cells(oid) == cells(id) && {
          var dot = 0L; var k = 0
          while (k < v.length) { dot += v(k) * ov(k); k += 1 }
          BigDecimal(dot.toDouble /
            (math.sqrt(norms(id).toDouble) * math.sqrt(norms(oid).toDouble)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble >= 0.45
        }
      }
      (id, cells(id), !pruned)
    }.toSet
    val got = SimilarityOps.s06SemanticDedup(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == expected)
    val prunedCount = expected.count(!_._3)
    info(s"s06 pruned $prunedCount of ${vecs.length}")
    assert(prunedCount > 0, "fixture produced no pruning — probe is vacuous")
  }

  test("s02 precision is exact and recall vs brute force >= 0.85") {
    val truth = bruteForcePairs()
    assert(truth.nonEmpty, "fixture has no qualifying pairs — probe is vacuous")
    val got = SimilarityOps.s02EmbedNearDup(spark, d)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact rescore => every reported pair must be a true pair
    assert(got.subsetOf(truth), s"false positives: ${got.diff(truth)}")
    val recall = got.intersect(truth).size.toDouble / truth.size
    info(s"s02 recall = $recall (${got.size}/${truth.size} pairs)")
    assert(recall >= 0.85, s"recall $recall below 0.85: missed ${truth.diff(got)}")
  }
}
