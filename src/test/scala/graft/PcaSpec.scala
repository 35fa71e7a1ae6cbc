package graft

import graft.functions.CoMoments.coMoments
import graft.operators.{Ann, Dedup, Multimodal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the round-7 embedding-moment family (CoMoments /
  * covariance / power iteration / Jacobi PCA) plus the aHash and
  * MinHash-calibration operators. */
class PcaSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def bruteCov(vecs: Seq[Seq[Float]]): Map[(Int, Int), Long] = {
    val n = vecs.size
    val d = vecs.head.size
    val q = vecs.map(_.map(v => math.round(v.toDouble * 1000)))
    (for (i <- 0 until d; j <- i until d) yield {
      val sxy = q.map(v => BigInt(v(i)) * BigInt(v(j))).sum
      val sx = q.map(v => BigInt(v(i))).sum
      val sy = q.map(v => BigInt(v(j))).sum
      val covMicro = (BigInt(n) * sxy - sx * sy).toDouble / (n.toDouble * n)
      (i, j) -> BigDecimal(covMicro)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }).toMap
  }

  test("CoMoments covariance equals the brute-force moment computation") {
    val got = Ann.embeddingCovariance(spark, sf)
      .as[(Int, Int, Long)].collect()
      .map { case (i, j, c) => (i, j) -> c }.toMap
    val vecs = Tables(spark, sf).embeddings
      .select($"embedding").as[Seq[Float]].collect().toSeq
    val want = bruteCov(vecs)
    assert(got.size == want.size)
    want.foreach { case (k, w) =>
      assert(got(k) == w, s"cov$k: got ${got(k)} want $w")
    }
    // variances on the diagonal are non-negative
    got.collect { case ((i, j), c) if i == j => c }.foreach(v => assert(v >= 0))
  }

  test("CoMoments is partition-invariant (exact integer merges)") {
    val emb = Tables(spark, sf).embeddings
    def run(df: org.apache.spark.sql.DataFrame) =
      df.select(coMoments($"embedding").as("cm"))
        .select(explode($"cm").as("p"))
        .select($"p.i", $"p.j", $"p.cov_micro")
        .as[(Int, Int, Double)].collect().sortBy(t => (t._1, t._2)).toSeq
    assert(run(emb.repartition(1)) == run(emb.repartition(13)))
  }

  test("pcaPower: unit-ish vector, estimate inside the Jacobi spectrum") {
    val rows = Ann.pcaPower(spark, sf).as[(Int, Double, Double)].collect()
    assert(rows.length == 64)
    val v = rows.sortBy(_._1).map(_._2)
    val lambda = rows.head._3
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-3)
    // ‖Cv‖/‖v‖ for any near-unit v lies inside [λ_min, λ_max]
    val (vals, _) = Ann.pcaEigen(spark, sf)
    assert(lambda >= vals.last - 1e-4 && lambda <= vals.head + 1e-4,
      s"estimate $lambda outside [${vals.last}, ${vals.head}]")
  }

  test("powerLoop converges to the planted direction on a spiked matrix") {
    val d = 16
    // C = 5·uuᵀ + 0.1·I with u = e3 — gap λ2/λ1 = 0.02
    val m = Array.tabulate(d, d) { (i, j) =>
      val spike = if (i == 3 && j == 3) 5.0 else 0.0
      val diag = if (i == j) 0.1 else 0.0
      math.round((spike + diag) * 1e6)
    }
    val (vm, nrm) = Ann.powerLoop(m, iters = 8)
    val v = vm.map(_ / 1e6)
    assert(math.abs(math.abs(v(3)) - 1.0) < 1e-4)
    assert(v.zipWithIndex.filter(_._2 != 3).forall(x => math.abs(x._1) < 1e-4))
    assert(math.abs(nrm / 1e12 - 5.1) < 1e-3)
  }

  test("pcaEigen: orthonormal, descending, trace-preserving") {
    val (vals, vecs) = Ann.pcaEigen(spark, sf)
    val d = vals.length
    assert(d == 64)
    // descending eigenvalues
    vals.sliding(2).foreach(p => assert(p(0) >= p(1) - 1e-12))
    // orthonormal eigenvectors
    for (a <- 0 until d; b <- a until d) {
      val dot = (0 until d).map(i => vecs(a)(i) * vecs(b)(i)).sum
      if (a == b) assert(math.abs(dot - 1.0) < 1e-9)
      else assert(math.abs(dot) < 1e-9)
    }
    // trace = sum of eigenvalues
    val trace = Ann.embeddingCovariance(spark, sf)
      .filter($"i" === $"j").agg(sum($"cov_micro" / 1e6)).as[Double].head()
    assert(math.abs(vals.sum - trace) < 1e-3)
  }

  test("pcaProject: per-component variance equals the eigenvalue") {
    val (vals, _) = Ann.pcaEigen(spark, sf)
    val proj = Ann.pcaProject(spark, sf, k = 4)
    val n = proj.count().toDouble
    (1 to 4).foreach { c =>
      val stats = proj.agg(
        sum(col(s"pc$c")).as("s"),
        sum(col(s"pc$c") * col(s"pc$c")).as("ss"))
        .as[(Double, Double)].head()
      val variance = stats._2 / n - math.pow(stats._1 / n, 2)
      // 1e-3 input quantization + float embeddings: tolerance 1e-2 rel
      assert(math.abs(variance - vals(c - 1)) <
        1e-2 * math.max(1.0, vals(c - 1)),
        s"pc$c variance $variance vs eigenvalue ${vals(c - 1)}")
    }
  }

  test("pcaWhiten: unit variance per component, near-zero cross-covariance") {
    val w = Ann.pcaWhiten(spark, sf, k = 4)
    val n = w.count().toDouble
    val stats = w.agg(
      sum($"w1").as("s1"), sum($"w1" * $"w1").as("q1"),
      sum($"w2").as("s2"), sum($"w2" * $"w2").as("q2"),
      sum($"w3").as("s3"), sum($"w3" * $"w3").as("q3"),
      sum($"w1" * $"w2").as("c12"), sum($"w1" * $"w3").as("c13"),
      sum($"w2" * $"w3").as("c23")).head()
    def v(q: Double, s: Double) = q / n - math.pow(s / n, 2)
    def cv(c: Double, sa: Double, sb: Double) = c / n - (sa / n) * (sb / n)
    val (s1, q1) = (stats.getDouble(0), stats.getDouble(1))
    val (s2, q2) = (stats.getDouble(2), stats.getDouble(3))
    val (s3, q3) = (stats.getDouble(4), stats.getDouble(5))
    assert(math.abs(v(q1, s1) - 1.0) < 0.02, s"var w1 ${v(q1, s1)}")
    assert(math.abs(v(q2, s2) - 1.0) < 0.02, s"var w2 ${v(q2, s2)}")
    assert(math.abs(v(q3, s3) - 1.0) < 0.02, s"var w3 ${v(q3, s3)}")
    assert(math.abs(cv(stats.getDouble(6), s1, s2)) < 0.02)
    assert(math.abs(cv(stats.getDouble(7), s1, s3)) < 0.02)
    assert(math.abs(cv(stats.getDouble(8), s2, s3)) < 0.02)
  }

  test("avg-hash: known payloads, empty payload, ASCII text equivalence") {
    val df = Seq(
      ("low-high", ("a" * 32) + ("z" * 32)),  // low half then high half
      ("uniform", "m" * 64),                  // no bucket beats the mean
      ("empty", "")
    ).toDF("name", "text")
      .select($"name", encode($"text", "UTF-8").as("payload"))
      .select($"name",
        graft.functions.ByteColumns.avgHash64($"payload").as("h"))
      .as[(String, String)].collect().toMap
    assert(df("low-high") == "0" * 32 + "1" * 32)
    assert(df("uniform") == "0" * 64)
    assert(df("empty") == "0" * 64)
    // brute-force replay on sf docs
    val docs = Tables(spark, sf).documents
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val got = Multimodal.avgHashBuckets(spark, sf)
      .select($"doc_id", $"ahash").as[(Long, String)].collect().toMap
    docs.take(50).foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8").map(_ & 0xff)
      val l = bytes.length
      val s = new Array[Long](64); val c = new Array[Long](64)
      bytes.zipWithIndex.foreach { case (v, t) =>
        val b = (t.toLong * 64 / l).toInt; s(b) += v; c(b) += 1
      }
      val total = bytes.map(_.toLong).sum
      val want = (0 until 64).map(b =>
        if (s(b) * l > total * c(b)) '1' else '0').mkString
      assert(got(id) == want, s"doc $id")
    }
    // bucket sizes count hash multiplicity
    val sizes = Multimodal.avgHashBuckets(spark, sf)
      .select($"ahash", $"bucket_size").as[(String, Long)].collect()
    val byHash = sizes.groupBy(_._1)
    byHash.foreach { case (_, xs) =>
      assert(xs.forall(_._2 == xs.length))
    }
  }

  test("minhash calibration: est within band recall region, buckets ordered") {
    val r = Dedup.minhashEstError(spark, sf)
      .as[(Int, Long, Double, Double, Double)].collect()
    assert(r.nonEmpty)
    r.foreach { case (bucket, n, err, est, exact) =>
      assert(bucket >= 0 && bucket <= 9)
      assert(n > 0)
      assert(err >= 0 && err <= 1)
      // bucket mean of exact j must sit inside the bucket bounds
      assert(exact >= bucket / 10.0 - 1e-9)
      assert(bucket == 9 || exact <= (bucket + 1) / 10.0 + 1e-9)
      // candidates passed the 0.8 estimate threshold
      assert(est >= 0.8 - 1e-9)
    }
  }

  test("cluster entropy: bounds and consistency with assignment sizes") {
    val r = Ann.clusterEntropy(spark, sf)
      .as[(Long, Long, Double, Double, Double)].head()
    val (k, n, h, hn, share) = r
    assert(k > 1)
    assert(n == Tables(spark, sf).embeddings.count())
    assert(h >= 0 && h <= math.log(k.toDouble) / math.log(2.0) + 1e-9)
    assert(hn >= 0 && hn <= 1.0 + 1e-9)
    assert(share > 0 && share <= 1.0)
    assert(share >= 1.0 / k - 1e-9)
  }

  test("core sizes distribution sums to the vertex count") {
    val sizes = graft.graph.GraphQueries.coreSizes(spark, sf)
      .as[(Long, Long)].collect()
    val total = graft.graph.GraphQueries.coreNumbers(spark, sf).count()
    assert(sizes.map(_._2).sum == total)
    assert(sizes.map(_._1).distinct.length == sizes.length)
  }
}
