package graft

import org.apache.spark.sql.functions._

import graft.ext.{Ivf, Similarity}

class IvfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, sfDir, "embeddings")

  test("train produces k unit centroids and is deterministic") {
    val m1 = Ivf.train(emb, "vec_id", "embedding", k = 8, iters = 2)
    val m2 = Ivf.train(emb, "vec_id", "embedding", k = 8, iters = 2)
    assert(m1.k == 8)
    assert(m1.centroids == m2.centroids)
    m1.centroids.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9)
    }
  }

  test("cell assignment is total and within range") {
    val m = Ivf.train(emb, "vec_id", "embedding", k = 8, iters = 2)
    val cells = emb.select(Ivf.cellId(col("embedding"), m).as("c"))
      .groupBy("c").count().collect()
    assert(cells.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 8))
    assert(cells.map(_.getLong(1)).sum == emb.count())
  }

  test("planted duplicate is always found (same direction, same cell)") {
    val planted = emb.unionByName(emb
      .withColumn("vec_id", col("vec_id") + 1000L)
      .withColumn("embedding", transform(col("embedding"), x => x * lit(3.0f))))
    val m = Ivf.train(planted, "vec_id", "embedding", k = 8, iters = 2)
    val queries = planted.filter(col("vec_id") < 10)
    val top1 = Ivf.topK(planted, queries, m, "vec_id", "embedding",
      k = 1, nprobe = 1).collect()
    assert(top1.length == 10)
    assert(top1.forall(r =>
      r.getAs[Long]("neighbor_id") == r.getAs[Long]("query_id") + 1000L))
    assert(top1.forall(_.getAs[Double]("sim") == 1.0))
  }

  test("IVF recall vs brute force is reasonable at nprobe=4/16") {
    val m = Ivf.train(emb, "vec_id", "embedding", k = 16, iters = 3)
    val queries = emb.filter(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val brute = pairs(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5))
    val ivf = pairs(Ivf.topK(emb, queries, m, "vec_id", "embedding", 5, nprobe = 4))
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.25, s"recall $recall")
  }
}
