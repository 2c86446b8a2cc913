package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011) — the memory-side half of billion-scale
  * ANN: split a D-dim vector into M subvectors, k-means each subspace to
  * K centroids, store M small codes per vector (D×4 bytes → M bytes at
  * K ≤ 256; 64-dim float32 → 8 bytes = 32×). Search never decompresses:
  * asymmetric distance (ADC) precomputes the query's M×K partial-distance
  * table ONCE per query, then each candidate costs M table lookups.
  *
  * Spark shapes:
  *   - train: one Lloyd loop over (subspace, subvector) rows — ALL M
  *     subspaces train in the same shuffle (groupBy subspace×cell×pos),
  *     not M sequential jobs; codebooks collect driver-side (K×D doubles
  *     — driver-sized at any corpus scale, like [[Ivf]] centroids).
  *   - encode: narrow map, M×K codegen'd distance expressions per row;
  *     codes ride the scan. The encoded table is what you STORE — the
  *     raw embedding column is droppable after this pass.
  *   - topK: queries broadcast with their ADC tables; candidates are
  *     scored by code lookup — no vector arithmetic in the join.
  */
object Pq {

  /** codebooks(m)(k) = centroid k of subspace m (length D/M each). */
  final case class Model(codebooks: Seq[Seq[Seq[Double]]]) {
    def m: Int = codebooks.size
    def k: Int = codebooks.head.size
    def subDim: Int = codebooks.head.head.size
  }

  /** Subvector m (0-based) of a vector column, as array<double>. */
  private def subvec(vec: Column, m: Int, subDim: Int): Column =
    slice(vec.cast("array<double>"), m * subDim + 1, subDim)

  /** Squared L2 distance between a subvector column and one centroid
    * literal — the codegen'd [[graft.functions.VecL2Sq]] expression
    * (same left-to-right fold as the `aggregate(zip_with(...))` it
    * replaced: bit-identical codes, ~an order of magnitude less
    * per-element interpretation in the m×k-per-row encode loop). */
  private def distSq(sv: Column, c: Seq[Double]): Column =
    graft.functions.VectorFunctions.vec_l2sq(sv, typedlit(c))

  /** Train M codebooks of K centroids with `iters` Lloyd rounds over the
    * exploded (subspace, subvector) rows — one persist + one shuffle per
    * round covers every subspace. Deterministic init: per subspace, the K
    * subvectors with smallest xxhash64(id, m). `dim` must be divisible by
    * `m`. Null vectors are dropped. */
  def train(corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
      m: Int = 8, k: Int = 16, iters: Int = 3): Model = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    val spark = corpus.sparkSession
    import spark.implicits._
    // (id, sub, sv): every subspace's training set in ONE frame
    val subs = corpus
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(idCol).as("id"),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          i => slice(col(vecCol).cast("array<double>"),
            i * subDim + 1, lit(subDim)))).as(Seq("sub", "sv")))
      .persist()
    try {
      // deterministic per-subspace init: K smallest-hash rows per subspace
      // (one window over the exploded frame — k×m rows collect)
      val initW = Window.partitionBy(col("sub"))
        .orderBy(xxhash64(col("id"), col("sub")), col("id"))
      val init = subs
        .withColumn("__r", row_number().over(initW))
        .filter(col("__r") <= k)
        .select(col("sub"), col("__r"), col("sv"))
        .collect()
      var books: Seq[Seq[Seq[Double]]] = (0 until m).map { s =>
        init.filter(_.getInt(0) == s).sortBy(_.getInt(1))
          .map(_.getSeq[Double](2).toSeq).toSeq
      }

      for (_ <- 0 until iters) {
        val lit3 = typedlit(books)
        // nearest centroid per (sub, sv): argmin over the K distances to
        // THIS row's subspace book (element_at on the 3-level literal)
        val dists = array((0 until k).map { kk =>
          graft.functions.VectorFunctions.vec_l2sq(col("sv"),
            element_at(element_at(lit3, col("sub") + 1), kk + 1))
        }: _*)
        val cell = (element_at(transform(array(dists),
          d => array_position(d, array_min(d))), 1) - 1).cast(IntegerType)
        val means = subs
          .withColumn("cell", cell)
          .select(col("sub"), col("cell"),
            posexplode(col("sv")).as(Seq("pos", "x")))
          .groupBy(col("sub"), col("cell"), col("pos"))
          .agg(avg(col("x")).as("mu"))
          .collect()
        val bySubCell: Map[(Int, Int), Array[org.apache.spark.sql.Row]] =
          means.groupBy(r => (r.getInt(0), r.getInt(1)))
        books = books.zipWithIndex.map { case (book, s) =>
          book.zipWithIndex.map { case (old, c) =>
            bySubCell.get((s, c)) match {
              case Some(rows) =>
                rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq
              case None => old // empty cell keeps its centroid
            }
          }
        }
      }
      Model(books)
    } finally subs.unpersist(blocking = false)
  }

  /** PQ codes as a Column: array<int> of length M, code m = argmin
    * centroid of subspace m; first-min wins deterministically.
    *
    * Two equivalent plans, selected by codebook size: small books unroll
    * into M×K literal distance folds (stays inside whole-stage codegen);
    * past `unrollLimit` expressions the codebooks ship as ONE 3-level
    * literal array walked by nested lambdas — plan size (and task-binary
    * bytes) independent of M×K, which is what lets K go to 256 without a
    * megabyte of generated code per stage. Parity is pinned in PqSpec. */
  def encodeColumn(vec: Column, model: Model): Column = {
    val codes =
      if (model.m * model.k <= unrollLimit) encodeUnrolled(vec, model)
      else encodeDataDriven(vec, model)
    // dimension guard: a vector shorter than m×subDim must encode to
    // NULL, not to codes of truncated subvectors (VecL2Sq scores the
    // overlap, so without this a malformed row would silently enter the
    // index with a plausible-looking code)
    when(size(vec) === model.m * model.subDim, codes)
  }

  /** Above this many (subspace × centroid) pairs, switch from unrolled
    * literal expressions to the data-driven lambda plan. */
  val unrollLimit = 256

  private[graft] def encodeUnrolled(vec: Column, model: Model): Column = {
    val cols = (0 until model.m).map { mm =>
      val sv = subvec(vec, mm, model.subDim)
      // let-bind the subvector: K distance folds share one slice
      element_at(transform(array(sv), s => {
        val d = array(model.codebooks(mm).map(c => distSq(s, c)): _*)
        (array_position(d, array_min(d)) - 1).cast(IntegerType)
      }), 1)
    }
    array(cols: _*)
  }

  private[graft] def encodeDataDriven(vec: Column, model: Model): Column = {
    val books = typedlit(model.codebooks)
    transform(sequence(lit(0), lit(model.m - 1)), mm => {
      val sv = slice(vec.cast("array<double>"),
        mm * model.subDim + 1, lit(model.subDim))
      element_at(transform(array(sv), s => {
        val d = transform(element_at(books, mm + 1), cb =>
          graft.functions.VectorFunctions.vec_l2sq(s, cb))
        (array_position(d, array_min(d)) - 1).cast(IntegerType)
      }), 1)
    })
  }

  /** (idCol, codes) for a corpus — the stored representation. */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
      model: Model): DataFrame =
    corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol), encodeColumn(col(vecCol), model).as("codes"))

  /** Reconstruction (decode) of a codes column — centroid concatenation.
    * Audit-path only: search never calls this. */
  def decodeColumn(codes: Column, model: Model): Column =
    flatten(zip_with(codes,
      sequence(lit(0), lit(model.m - 1)),
      (c, mm) => element_at(
        element_at(typedlit(model.codebooks), mm + 1), c + 1)))

  /** Mean squared reconstruction error over the corpus — the codebook
    * quality audit (compare against [[Quantize.int8Error]]'s per-vector
    * scalar quantization). */
  def reconstructionError(corpus: DataFrame, idCol: String, vecCol: String,
      model: Model): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val rec = decodeColumn(encodeColumn(v, model), model)
    corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol),
        (graft.functions.VectorFunctions.vec_l2sq(v, rec) /
          greatest(size(v), lit(1)).cast(DoubleType)).as("mse"))
  }

  /** Approximate top-k by ADC: each query precomputes its M×K partial
    * squared-distance table (once — it rides the broadcast), candidates
    * score with M array lookups over their codes. Returns
    * (query_id, neighbor_id, adist, rnk) ranked by ascending approximate
    * distance (ties by id). `encoded` is [[encode]] output; pass the raw
    * corpus through [[encode]] first and REUSE it across query batches —
    * that's the point of the compressed index.
    *
    * QUERY-BATCH API: every code row scores against every query (that is
    * what flat ADC means), so the query side must be broadcast-sized —
    * each query row carries an M×K-double table. There is deliberately
    * no non-broadcast fallback: without a blocking key the join can only
    * degenerate to a Cartesian. For corpus-sized query frames (all-pairs
    * near-dup) use [[IvfPq.topK]] with `broadcastQueries = false` — its
    * cell key gives a true shuffle hash equi-join. */
  def topK(encoded: DataFrame, queries: DataFrame, model: Model,
      idCol: String, vecCol: String, k: Int,
      roundDigits: Int = 4): DataFrame = {
    // table[m][kk] = ||q_sub_m − c_mk||²: M×K folds per QUERY row only
    val table = array((0 until model.m).map { mm =>
      val sv = subvec(col(vecCol), mm, model.subDim)
      element_at(transform(array(sv), s =>
        array(model.codebooks(mm).map(c => distSq(s, c)): _*)), 1)
    }: _*)
    // dimension-gate the queries like [[encodeColumn]] gates the
    // corpus: a short query would build its ADC table from truncated
    // slices and score finite-but-WRONG distances with no error
    val q = queries.filter(col(vecCol).isNotNull &&
        size(col(vecCol)) === model.m * model.subDim)
      .select(col(idCol).as("query_id"), table.as("__tab"))
    // score = Σ_m tab[m][codes[m]]: pure lookups, no vector math — the
    // per-(candidate × query) inner loop, codegen'd ([[VecAdcSum]])
    val adist = graft.functions.VectorFunctions.vec_adc_sum(
      col("codes"), col("__tab"))
    // null-codes/null-adist guards (the IvfPq.topK discipline): encoded
    // is caller-supplied and keeps NULL codes for wrong-dimension rows;
    // a NULL adist sorts NULLS FIRST ascending and would occupy rank 1
    // of every query's top-k
    val scored = encoded.filter(col("codes").isNotNull)
      .join(broadcast(q), col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(adist, roundDigits).as("adist"))
      .filter(col("adist").isNotNull)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("adist"), col("rnk"))
  }

  /** ADC shortlist + exact rerank — the production PQ contract. Code
    * granularity collapses near-neighbours into adist ties (M nibbles
    * can't order vectors inside one Voronoi cell), so [[topK]] alone
    * under-ranks; fetching `shortlist` candidates by ADC and reranking
    * them with TRUE L2 restores exactness for every neighbour the
    * shortlist catches. Only the shortlist (|queries| × shortlist rows)
    * ever touches raw vectors — the corpus-wide scan stays on codes. */
  def topKRerank(encoded: DataFrame, corpus: DataFrame, queries: DataFrame,
      model: Model, idCol: String, vecCol: String, k: Int,
      shortlist: Int = 0, roundDigits: Int = 4): DataFrame = {
    val r = if (shortlist > 0) shortlist else 10 * k
    val cand = topK(encoded, queries, model, idCol, vecCol, r, roundDigits)
      .select(col("query_id"), col("neighbor_id"))
    val qv = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv"))
    val nv = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("__nv"))
    val exact = cand
      .join(broadcast(qv), Seq("query_id"))
      .join(nv, Seq("neighbor_id")) // shuffle sized by the shortlist, not the corpus
      .withColumn("dist", round(
        graft.functions.VectorFunctions.vec_l2sq(col("__qv"), col("__nv")),
        roundDigits))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist").asc, col("neighbor_id").asc)
    exact.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("dist"), col("rnk"))
  }
}
