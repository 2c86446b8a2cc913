package graft

import org.apache.spark.sql.functions._

import graft.ext.QualityClassifier

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** Two-vocabulary corpus: "quality" docs draw from vocab A, "junk"
    * docs from vocab B, with a shared stopword overlap — linearly
    * separable in hashed-BoW space but not trivially (collisions at
    * dim=64 force the regularizer to matter). Deterministic LCG. */
  private def corpus(n: Int, seedOffset: Long) = {
    val vocabA = (0 until 40).map(i => s"alpha$i")
    val vocabB = (0 until 40).map(i => s"beta$i")
    val shared = Seq("the", "a", "of", "and")
    (0 until n).map { i =>
      val label = i % 2
      var st = i.toLong * 6364136223846793005L + seedOffset
      def nx(m: Int) = { st = st * 6364136223846793005L + 1442695040888963407L
        (math.abs(st) % m).toInt }
      val vocab = if (label == 1) vocabA else vocabB
      val words = (0 until 24).map { _ =>
        if (nx(4) == 0) shared(nx(shared.size)) else vocab(nx(vocab.size))
      }
      (i.toLong + seedOffset, words.mkString(" "), label)
    }
  }

  test("classifier separates planted vocabularies on held-out docs") {
    val train = corpus(400, 0L).toDF("doc_id", "text", "label")
    val test = corpus(200, 1000000L).toDF("doc_id", "text", "label")
    val model = QualityClassifier.train(train, "text", "label", dim = 64)
    val scored = test.select(col("label"),
      QualityClassifier.scoreColumn(col("text"), model).as("p"))
    val acc = scored
      .select(avg((((col("p") > 0.5).cast("int")) === col("label"))
        .cast("double")))
      .as[Double].head()
    assert(acc >= 0.95, s"held-out accuracy $acc")
  }

  test("Column scoring path reproduces the ml decision function") {
    val train = corpus(300, 0L).toDF("doc_id", "text", "label")
    val model = QualityClassifier.train(train, "text", "label", dim = 64)
    // recompute the ml-side probability from the SAME features the
    // trainer saw, and compare against the pure-Column fold
    val feats = train.select(col("doc_id"),
      QualityClassifier.meanHashFeatures(col("text"), 64).as("f"),
      QualityClassifier.scoreColumn(col("text"), model).as("p_col"))
    val w = model.weights
    val rows = feats.collect()
    rows.foreach { r =>
      val f = r.getSeq[Double](1)
      val margin = model.intercept +
        f.zip(w).map { case (a, b) => a * b }.sum
      val pMl = 1.0 / (1.0 + math.exp(-margin))
      assert(math.abs(pMl - r.getDouble(2)) < 1e-6,
        s"doc ${r.getLong(0)}: ml $pMl vs column ${r.getDouble(2)}")
    }
  }

  test("distill learns a heuristic's labels from token evidence") {
    // heuristic = "contains alpha-vocab": distilling it must generalize
    val seed = corpus(400, 0L).toDF("doc_id", "text", "label")
    val model = QualityClassifier.distill(seed, "text",
      col("label").cast("double"), threshold = 0.5, dim = 64)
    val heldOut = corpus(200, 2000000L).toDF("doc_id", "text", "label")
    val acc = heldOut.select(
      avg(((QualityClassifier.scoreColumn(col("text"), model) > 0.5)
        .cast("int") === col("label")).cast("double")))
      .as[Double].head()
    assert(acc >= 0.95, s"distilled accuracy $acc")
  }

  test("blank and null text score without error") {
    val model = QualityClassifier.train(
      corpus(100, 0L).toDF("doc_id", "text", "label"), "text", "label",
      dim = 32, maxIter = 20)
    val scored = Seq((1L, ""), (2L, "   "), (3L, "alpha1 alpha2"))
      .toDF("doc_id", "text")
      .select(QualityClassifier.scoreColumn(col("text"), model).as("p"))
      .collect()
    scored.foreach(r => assert(!r.isNullAt(0) &&
      r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0))
  }
}
