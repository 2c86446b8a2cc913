package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col, lit}

/** Shared join shapes with library-wide invariants. */
object Joins {

  /** Null-safe equi-join on `keys`: a NULL key value is a real group
    * (dirty data routes there — the recurring audit lens), and a plain
    * usingColumns join drops its rows SILENTLY (null = null is never
    * true in an equi-join). Right-side key columns are aliased to
    * placeholders, matched with <=>, and dropped after; `bcastRight`
    * broadcasts the right side (the usual per-group aggregate, small by
    * construction). EMPTY `keys` join on a true condition with the
    * REQUESTED `how` — not a bare crossJoin, which equals a left join
    * only while the right side is a guaranteed one-row global aggregate
    * (every current call site) but would silently drop all left rows for
    * a future caller whose right side can be empty.
    *
    * One definition instead of three: Stats, Eval and Monitoring each
    * grew an identical copy of this invariant during the null-key audit
    * passes, and two of them had already diverged on the empty-keys
    * case. */
  def nullSafeEqui(l: DataFrame, r: DataFrame, keys: Seq[String],
      how: String = "inner", bcastRight: Boolean = true): DataFrame = {
    val right0 = (rr: DataFrame) => if (bcastRight) broadcast(rr) else rr
    if (keys.isEmpty) l.join(right0(r), lit(true), how)
    else {
      val ph = keys.indices.map(i => s"__nsk_$i")
      val rr = r.select(keys.zip(ph).map { case (c, a) => col(c).as(a) } ++
        r.columns.filterNot(keys.contains).map(col): _*)
      l.join(right0(rr), keys.zip(ph).map { case (c, a) =>
        l(c) <=> rr(a) }.reduce(_ && _), how).drop(ph: _*)
    }
  }
}
