package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{GramMixHashes, GramPosHashes, KllQuantiles, KllSketchAgg, MinHashAgg, MisraGriesAgg, SimHashAgg, VecDot, VecL2Sq, WinnowHashes}

/** SQL surface for the engine's native expressions — `spark.sql(...)`
  * callers get the same codegen'd/imperative kernels the Column API uses:
  *
  *  - `vec_dot(a, b)`            codegen'd double dot product
  *  - `vec_l2sq(a, b)`           codegen'd squared L2 distance
  *  - `gram_mix_hashes(text, n)` distinct word-n-gram hash set
  *  - `gram_pos_hashes(text, n)` position-aligned word-n-gram hashes
  *  - `winnow_hashes(text, n, window, exact)` winnowing fingerprint selection
  *  - `simhash_agg(hash)`        aggregate: 64-bit SimHash of a hash column
  *  - `minhash_agg(hash, k)`     aggregate: k-slot one-permutation MinHash
  *  - `misra_gries_agg(item[, weight], capacity)` aggregate: frequent-item candidates
  *  - `kll_sketch_agg(value[, k])`  aggregate: mergeable KLL quantile sketch
  *  - `kll_merge_agg(sketch[, k])`  aggregate: merge stored KLL sketches
  *  - `kll_quantiles(sketch, p...)` quantile values from a sketch
  *
  * Table-valued functions (SQL time travel over versioned tables —
  * see [[GraftExtensions.tableDescriptors]]):
  *
  *  - `graft_snapshot(path[, version])`, `graft_snapshot_at(path, ts)`
  *  - `graft_history(path)`
  *  - `graft_changes(path, from, to, keysCsv[, include_preimage])`
  *
  * Two registration paths:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build
  *    (the SparkSessionExtensions route — survives `spark.sql(...)` from
  *    any caller);
  *  - `GraftExtensions.register(spark)` on a live session (temp-function
  *    route, handy in tests/notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.descriptors.foreach(e.injectFunction)
    GraftExtensions.tableDescriptors.foreach(e.injectTableFunction)
  }
}

object GraftExtensions {

  /** n/k arguments must be literal ints — they size buffers/loops at
    * plan time (the same contract as Spark's own `approx_count_distinct`
    * precision argument). */
  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def mkVecDot(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "vec_dot(a, b) takes exactly two arguments")
    VecDot(exprs.head, exprs(1))
  }
  private def mkVecL2Sq(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "vec_l2sq(a, b) takes exactly two arguments")
    VecL2Sq(exprs.head, exprs(1))
  }
  private def mkGramMix(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "gram_mix_hashes(text, n) takes two arguments")
    GramMixHashes(exprs.head, intLit(exprs(1), "gram_mix_hashes", "n"))
  }
  private def mkGramPos(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "gram_pos_hashes(text, n) takes two arguments")
    GramPosHashes(exprs.head, intLit(exprs(1), "gram_pos_hashes", "n"))
  }
  private def mkWinnow(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 4,
      "winnow_hashes(text, n, window, exact) takes four arguments")
    val exact = exprs(3) match {
      case Literal(b: Boolean, org.apache.spark.sql.types.BooleanType) => b
      case other => throw new IllegalArgumentException(
        s"winnow_hashes: exact must be a boolean literal, got $other")
    }
    WinnowHashes(exprs.head, intLit(exprs(1), "winnow_hashes", "n"),
      intLit(exprs(2), "winnow_hashes", "window"), exact)
  }
  private def mkSimHash(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "simhash_agg(hash) takes one argument")
    SimHashAgg(exprs.head)
  }
  private def mkMinHash(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "minhash_agg(hash, k) takes two arguments")
    MinHashAgg(exprs.head, intLit(exprs(1), "minhash_agg", "k"))
  }
  private def mkMisraGries(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(item, cap) =>
      MisraGriesAgg(item,
        Literal(1L, org.apache.spark.sql.types.LongType),
        intLit(cap, "misra_gries_agg", "capacity"))
    case Seq(item, weight, cap) =>
      MisraGriesAgg(item, weight,
        intLit(cap, "misra_gries_agg", "capacity"))
    case _ => throw new IllegalArgumentException(
      "misra_gries_agg(item[, weight], capacity) takes 2 or 3 arguments")
  }

  private def mkKllSketch(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(value) =>
      KllSketchAgg(value, k = 200, mergeMode = false)
    case Seq(value, k) =>
      KllSketchAgg(value, intLit(k, "kll_sketch_agg", "k"),
        mergeMode = false)
    case _ => throw new IllegalArgumentException(
      "kll_sketch_agg(value[, k]) takes 1 or 2 arguments")
  }
  private def mkKllMerge(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(sketch) =>
      KllSketchAgg(sketch, k = 200, mergeMode = true)
    case Seq(sketch, k) =>
      KllSketchAgg(sketch, intLit(k, "kll_merge_agg", "k"),
        mergeMode = true)
    case _ => throw new IllegalArgumentException(
      "kll_merge_agg(sketch[, k]) takes 1 or 2 arguments")
  }
  private def mkKllQuantiles(exprs: Seq[Expression]): Expression = {
    require(exprs.length >= 2,
      "kll_quantiles(sketch, p...) needs at least one probability")
    val ps = exprs.tail.map {
      case Literal(v: Double, org.apache.spark.sql.types.DoubleType) => v
      // the natural SQL spelling kll_quantiles(s, 0.5) parses 0.5 as
      // DECIMAL(1,1), which Catalyst stores as sql.types.Decimal (NOT
      // java BigDecimal — that arm would be dead code)
      case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
      // and 0/1 (exact rank endpoints) parse as integer literals
      case Literal(v: Int, org.apache.spark.sql.types.IntegerType) =>
        v.toDouble
      case Literal(v: Long, org.apache.spark.sql.types.LongType) =>
        v.toDouble
      case Literal(v: Float, org.apache.spark.sql.types.FloatType) =>
        v.toDouble
      case other => throw new IllegalArgumentException(
        s"kll_quantiles: probabilities must be numeric literals, got $other")
    }
    KllQuantiles(exprs.head, ps)
  }

  private type Descriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def descriptor(name: String, clazz: Class[_],
      build: Seq[Expression] => Expression): Descriptor =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name),
      build)

  private[graft] val descriptors: Seq[Descriptor] = Seq(
    descriptor("vec_dot", classOf[VecDot], mkVecDot),
    descriptor("vec_l2sq", classOf[VecL2Sq], mkVecL2Sq),
    descriptor("gram_mix_hashes", classOf[GramMixHashes], mkGramMix),
    descriptor("gram_pos_hashes", classOf[GramPosHashes], mkGramPos),
    descriptor("winnow_hashes", classOf[WinnowHashes], mkWinnow),
    descriptor("simhash_agg", classOf[SimHashAgg], mkSimHash),
    descriptor("minhash_agg", classOf[MinHashAgg], mkMinHash),
    descriptor("misra_gries_agg", classOf[MisraGriesAgg], mkMisraGries),
    descriptor("kll_sketch_agg", classOf[KllSketchAgg], mkKllSketch),
    descriptor("kll_merge_agg", classOf[KllSketchAgg], mkKllMerge),
    descriptor("kll_quantiles", classOf[KllQuantiles], mkKllQuantiles))

  // -------------------------------------------- table-valued functions

  /** SQL time travel over [[graft.io.VersionedTable]] — the
    * table-valued-function surface (Delta's `table@v`/`TIMESTAMP AS OF`
    * niche, expressed through Spark's own TVF machinery so it needs no
    * parser extension):
    *
    *  - `graft_snapshot('/path'[, version])`     snapshot read (planned
    *    over the manifest FileIndex: stats/Bloom skipping, DV subtract)
    *  - `graft_snapshot_at('/path', ts_millis)`  newest version at/before
    *  - `graft_history('/path')`                 the commit log as a table
    *  - `graft_changes('/path', from, to, 'k1,k2'[, include_preimage])`
    *    change feed between versions, keyed on the CSV column list
    *
    * All arguments must be literals (they resolve to a PLAN, not a row
    * expression). The builder expands to the SAME analyzed plan the Scala
    * API produces — one read path, two front doors. */
  private def strLit(e: Expression, fn: String, arg: String): String =
    e match {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String,
        org.apache.spark.sql.types.StringType) => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a string literal, got $other")
    }

  private def longLit(e: Expression, fn: String, arg: String): Long =
    e match {
      case Literal(v: Int, IntegerType) => v.toLong
      case Literal(v: Long, org.apache.spark.sql.types.LongType) => v
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got $other")
    }

  private def boolLit(e: Expression, fn: String, arg: String): Boolean =
    e match {
      case Literal(b: Boolean, org.apache.spark.sql.types.BooleanType) => b
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a boolean literal, got $other")
    }

  private def activeSession: SparkSession =
    SparkSession.getActiveSession.getOrElse(throw new IllegalStateException(
      "graft TVFs need an active SparkSession"))

  private def mkSnapshotTvf(exprs: Seq[Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    require(exprs.length == 1 || exprs.length == 2,
      "graft_snapshot(path[, version]) takes 1 or 2 arguments")
    val path = strLit(exprs.head, "graft_snapshot", "path")
    val v = exprs.lift(1).map(longLit(_, "graft_snapshot", "version"))
    org.apache.spark.sql.graftbridge.Bridge.analyzedPlan(
      graft.io.VersionedTable.snapshot(activeSession, path, v))
  }

  private def mkSnapshotAtTvf(exprs: Seq[Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    require(exprs.length == 2,
      "graft_snapshot_at(path, ts_millis) takes 2 arguments")
    org.apache.spark.sql.graftbridge.Bridge.analyzedPlan(
      graft.io.VersionedTable.snapshotAsOf(activeSession,
        strLit(exprs.head, "graft_snapshot_at", "path"),
        longLit(exprs(1), "graft_snapshot_at", "ts_millis")))
  }

  private def mkHistoryTvf(exprs: Seq[Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    require(exprs.length == 1, "graft_history(path) takes 1 argument")
    org.apache.spark.sql.graftbridge.Bridge.analyzedPlan(
      graft.io.VersionedTable.history(activeSession,
        strLit(exprs.head, "graft_history", "path")))
  }

  private def mkChangesTvf(exprs: Seq[Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    require(exprs.length == 4 || exprs.length == 5,
      "graft_changes(path, from, to, keysCsv[, include_preimage]) " +
        "takes 4 or 5 arguments")
    val keys = strLit(exprs(3), "graft_changes", "keysCsv")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(keys.nonEmpty, "graft_changes: keysCsv names no columns")
    org.apache.spark.sql.graftbridge.Bridge.analyzedPlan(
      graft.io.VersionedTable.changeFeed(activeSession,
        strLit(exprs.head, "graft_changes", "path"),
        longLit(exprs(1), "graft_changes", "from"),
        longLit(exprs(2), "graft_changes", "to"),
        keys,
        includePreimage = exprs.lift(4)
          .exists(boolLit(_, "graft_changes", "include_preimage"))))
  }

  private def mkTableChangesTvf(exprs: Seq[Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    require(exprs.length == 3,
      "graft_table_changes(path, from, to) takes 3 arguments")
    org.apache.spark.sql.graftbridge.Bridge.analyzedPlan(
      graft.io.VersionedTable.tableChanges(activeSession,
        strLit(exprs.head, "graft_table_changes", "path"),
        longLit(exprs(1), "graft_table_changes", "from"),
        longLit(exprs(2), "graft_table_changes", "to")))
  }

  private type TableDescriptor = (FunctionIdentifier, ExpressionInfo,
    Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)

  private def tableDescriptor(name: String,
      build: Seq[Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : TableDescriptor =
    (FunctionIdentifier(name),
      new ExpressionInfo(graft.io.VersionedTable.getClass.getName, name),
      build)

  private[graft] val tableDescriptors: Seq[TableDescriptor] = Seq(
    tableDescriptor("graft_snapshot", mkSnapshotTvf),
    tableDescriptor("graft_snapshot_at", mkSnapshotAtTvf),
    tableDescriptor("graft_history", mkHistoryTvf),
    tableDescriptor("graft_changes", mkChangesTvf),
    tableDescriptor("graft_table_changes", mkTableChangesTvf))

  /** Register on an existing session. */
  def register(spark: SparkSession): Unit = {
    descriptors.foreach { case (id, _, build) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        id.funcName, build, "scala_udf")
    }
    tableDescriptors.foreach { case (id, _, build) =>
      spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
        id.funcName, build, "scala_udf")
    }
  }
}
