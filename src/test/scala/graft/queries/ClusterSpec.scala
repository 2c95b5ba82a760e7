package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** s12 k-means: the distributed treeAggregate training must equal a
  * straightforward single-threaded Lloyd reference on the same data, and
  * the documented edge semantics (tie-break, empty clusters, dimension
  * mismatch) must hold by name. */
class ClusterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-cluster")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val d = "/root/testdata/sf0.001"

  /** Single-threaded reference Lloyd with the identical contract. */
  private def referenceKmeans(vecs: Array[(Long, Array[Long])], k: Int,
                              iters: Int): Map[Long, (Long, Long)] = {
    val dim = vecs.head._2.length
    var cents = vecs.filter(_._1 < k).sortBy(_._1).map(_._2.clone())
    def cellOf(v: Array[Long]): Int = {
      var best = 0; var bestD = Long.MaxValue
      for (c <- cents.indices) {
        var d2 = 0L
        for (j <- 0 until dim) { val df = v(j) - cents(c)(j); d2 += df * df }
        if (d2 < bestD) { bestD = d2; best = c }
      }
      best
    }
    for (_ <- 1 to iters) {
      val byCell = vecs.groupBy(x => cellOf(x._2))
      cents = Array.tabulate(k) { c =>
        byCell.get(c) match {
          case None => cents(c)
          case Some(members) =>
            Array.tabulate(dim)(j => members.map(_._2(j)).sum / members.length)
        }
      }
    }
    vecs.map { case (id, v) =>
      val c = cellOf(v)
      var d2 = 0L
      for (j <- 0 until dim) { val df = v(j) - cents(c)(j); d2 += df * df }
      id -> (c.toLong, d2)
    }.toMap
  }

  test("s12 equals the single-threaded Lloyd reference on the real corpus") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, d)
      .select(col("vec_id"), expr(SimilarityOps.quantize("embedding")).as("q"))
      .as[(Long, Array[Long])].collect()
    val want = referenceKmeans(vecs, ClusterOps.KmK, ClusterOps.KmIters)
    val got = ClusterOps.s12Kmeans(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.size == vecs.length)
    assert(got == want)
    // the clustering is non-trivial on this corpus: >1 populated cell
    assert(got.values.map(_._1).toSet.size > 1)
  }

  test("facade kmeans == s12 under renamed columns") {
    import spark.implicits._
    val renamed = Tables.embeddings(spark, d)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val a = graft.ops.Vectors.kmeans(spark, renamed,
      ClusterOps.KmK, ClusterOps.KmIters, "id", "vec").orderBy("vec_id")
    val b = ClusterOps.s12Kmeans(spark, d)
    assert(a.columns.sameElements(b.columns))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("ties go to the lowest cell; an emptied cluster keeps its centroid") {
    import spark.implicits._
    // all vectors identical: both seeds coincide, every assignment ties
    // -> cell 0; cell 1 is empty from iteration 1 and must not crash or
    // divide by zero
    val same = Seq.tabulate(4)(i => (i.toLong, Array(5L, 5L, 5L)))
      .toDF("vec_id", "q")
    val out = ClusterOps.kmeansOf(spark, same, k = 2, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 4)
    assert(out.forall { case (_, cell, d2) => cell == 0L && d2 == 0L }, out.toSeq)
  }

  test("iters = 0 labels directly against the seed centroids") {
    import spark.implicits._
    val data = Seq(
      (0L, Array(0L, 0L)), (1L, Array(100L, 100L)),
      (2L, Array(1L, 0L)), (3L, Array(99L, 100L))).toDF("vec_id", "q")
    val out = ClusterOps.kmeansOf(spark, data, k = 2, iters = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 0L, 1L -> 1L, 2L -> 0L, 3L -> 1L))
  }

  test("dimension mismatch and missing seeds fail by name") {
    import spark.implicits._
    val ragged = Seq((0L, Array(1L, 2L)), (1L, Array(1L, 2L, 3L)))
      .toDF("vec_id", "q")
    val e1 = intercept[Exception] {
      ClusterOps.kmeansOf(spark, ragged, k = 2, iters = 1).collect()
    }
    assert(e1.getMessage.contains("components"), e1.getMessage)
    val sparse = Seq((5L, Array(1L, 2L))).toDF("vec_id", "q")
    val e2 = intercept[IllegalArgumentException] {
      ClusterOps.kmeansOf(spark, sparse, k = 2, iters = 1).collect()
    }
    assert(e2.getMessage.contains("seed"), e2.getMessage)
  }
}
