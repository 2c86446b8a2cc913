package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining — the affinity/recommendation
  * primitive: which items co-occur within an entity's basket more than
  * their base rates explain ("users who touched A also touched B").
  */
object Associations {

  /** Pairwise association rules over (entity, item) rows: for every
    * unordered item pair co-occurring in ≥ `minSupport` of baskets,
    * the co-basket count, support, both directed confidences, and
    * lift = P(a,b)/(P(a)·P(b)) — lift ≫ 1 is genuine affinity, lift
    * ≈ 1 is two independently-popular items.
    *
    * A basket is an entity's DISTINCT item set (multiplicity within a
    * basket is presence, the market-basket convention). Entities with
    * more than `maxBasket` distinct items are dropped whole — a
    * crawler's everything-basket contributes pair fan-out quadratic in
    * its size and no affinity signal; the cap bounds the self-join at
    * maxBasket² per entity (the LSH bucket-cap discipline). Totals
    * count the SURVIVING population, so supports stay internally
    * consistent.
    *
    * Shuffles: basket dedup (entity, item), the capped self-join on
    * the entity, pair counting; item base rates broadcast back.
    * Output: (item_a, item_b, n_co, support, conf_a_to_b, conf_b_to_a,
    * lift), item_a < item_b. */
  def pairRules(df: DataFrame, entityCol: String, itemCol: String,
      minSupport: Double = 0.01, maxBasket: Int = 100,
      roundTo: Int = 6): DataFrame = {
    require(minSupport > 0 && minSupport <= 1, "minSupport in (0,1]")
    require(maxBasket >= 2, "maxBasket must be >= 2")
    val baskets = df
      .filter(col(entityCol).isNotNull && col(itemCol).isNotNull)
      .select(col(entityCol).as("__e"), col(itemCol).as("__i"))
      .distinct()
      .persist()
    baskets.count()
    val sizes = baskets.groupBy(col("__e"))
      .agg(count(lit(1)).as("__bs"))
      .filter(col("__bs") <= maxBasket)
      .select(col("__e"))
    val kept = baskets.join(sizes, Seq("__e"), "left_semi").persist()
    kept.count()
    baskets.unpersist(blocking = false)
    val nEntities = kept.select(col("__e")).distinct().count()
    // no broadcast hint on the item base rates: the item vocabulary is
    // corpus-scale in real basket data (the 5-type test fixture is not
    // the sizing case), so a forced broadcast could OOM the driver.
    // After the minSupport floor the surviving pair set is small, the
    // re-attach joins shuffle it by item key, and AQE still converts to
    // broadcast at runtime when the counts frame is actually small.
    val itemCounts = kept.groupBy(col("__i")).agg(count(lit(1)).as("__ni"))
    // INTEGER support floor: `n_co >= minSupport·n` compared in doubles
    // dropped pairs sitting exactly AT the documented boundary
    // (0.07·100 = 7.000000000000001 as a double excludes n_co = 7);
    // counts are integers, so the boundary must be one too
    val minCo = math.ceil(minSupport * nEntities - 1e-9).toLong
    val co = kept.select(col("__e"), col("__i").as("item_a"))
      .join(kept.select(col("__e"), col("__i").as("item_b")), Seq("__e"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_co"))
      .filter(col("n_co") >= minCo)
    val nD = lit(nEntities.toDouble)
    val out = co
      .join(itemCounts.select(col("__i").as("item_a"),
        col("__ni").as("__na")), Seq("item_a"))
      .join(itemCounts.select(col("__i").as("item_b"),
        col("__ni").as("__nb")), Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("n_co"),
        round(col("n_co").cast("double") / nD, roundTo).as("support"),
        round(col("n_co").cast("double") / col("__na").cast("double"),
          roundTo).as("conf_a_to_b"),
        round(col("n_co").cast("double") / col("__nb").cast("double"),
          roundTo).as("conf_b_to_a"),
        round(col("n_co").cast("double") * nD /
          (col("__na").cast("double") * col("__nb").cast("double")),
          roundTo).as("lift"))
    // eager snapshot (util.Caches contract): no CacheManager entry left
    // behind; the result's blocks GC-release with the returned frame
    val snap = graft.util.Caches.snapshot(out)
    kept.unpersist(blocking = false)
    snap
  }
}
