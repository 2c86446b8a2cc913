package graft

import org.apache.spark.sql.functions._

import graft.ext.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorderKey interleaves quantized bits as specified") {
    // 2 cols, 2 bits each: x,y ∈ {0..3} quantize to themselves
    // (min 0, max 3, range+1 = 4, ·4 div 4 = identity); key =
    // x-bit i at position 2i, y-bit i at position 2i+1
    val df = Seq((0L, 0L), (3L, 0L), (0L, 3L), (3L, 3L), (2L, 1L))
      .toDF("x", "y")
    val keys = Layout.zorderKey(df, Seq("x", "y"), bits = 2)
      .select(col("x"), col("y"), col("zkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    def interleave(x: Long, y: Long): Long =
      (0 until 2).map(i =>
        (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1))).sum
    assert(keys((0L, 0L)) == 0L)
    assert(keys((3L, 3L)) == 15L)
    assert(keys((3L, 0L)) == interleave(3, 0)) // 0b0101 = 5
    assert(keys((0L, 3L)) == interleave(0, 3)) // 0b1010 = 10
    assert(keys((2L, 1L)) == interleave(2, 1))
  }

  test("zorderKey is exact for full-long-range columns (no overflow)") {
    // hash-distributed ids spanning ±2^62: max−min+1 and (x−min)·2^bits
    // both blow past 64 bits — BIGINT arithmetic silently corrupted every
    // bucket; the DECIMAL(38,0) path must order buckets monotonically
    val big = 1L << 62
    val df = Seq(-big, -big / 2, 0L, big / 2, big).toDF("x")
    val keys = Layout.zorderKey(df, Seq("x"), bits = 8)
      .orderBy("x").select("zkey").as[Long].collect().toSeq
    assert(keys == keys.sorted, s"buckets not monotone: $keys")
    assert(keys.head == 0L) // min quantizes to bucket 0
    assert(keys.last == 255L) // max lands in the top bucket
    assert(keys.distinct.size == keys.size) // evenly spread, no collapse
  }

  test("z-order clustering prunes a 2-d box query better than linear sort") {
    // 64×64 grid of points, 16 "files"; query box = one column stripe in
    // y (the NON-leading dimension for the linear layout)
    val pts = spark.range(4096).select(
      (col("id") % 64).as("x"), (col("id") / 64).as("y"))
    def filesTouched(df: org.apache.spark.sql.DataFrame): Long =
      df.withColumn("file", spark_partition_id())
        .filter(col("y") >= 8 && col("y") < 16) // 1/8 stripe in y
        .select("file").distinct().count()
    val linear = pts.repartitionByRange(16, col("x"))
      .sortWithinPartitions(col("x"))
    val zordered = Layout.zorderCluster(pts, Seq("x", "y"), numFiles = 16,
      bits = 6)
    val lt = filesTouched(linear)
    val zt = filesTouched(zordered)
    // linear-by-x: every x-range file contains all y values → all 16
    // files hold stripe rows; z-order confines the stripe to a curve
    // segment subset
    assert(lt == 16L, s"linear touched $lt")
    assert(zt <= 8L, s"zorder touched $zt of 16")
  }

  test("zorderCluster preserves the row set and is deterministic") {
    val pts = spark.range(1000).select(
      (col("id") * 7 % 100).as("a"), (col("id") * 13 % 50).as("b"))
    val z1 = Layout.zorderCluster(pts, Seq("a", "b"), 8)
      .select("a", "b").as[(Long, Long)].collect().toSeq
    val z2 = Layout.zorderCluster(pts.repartition(5), Seq("a", "b"), 8)
      .select("a", "b").as[(Long, Long)].collect().toSeq
    assert(z1.sorted == z2.sorted)
    assert(z1.length == 1000)
    // key itself is partition-independent
    val k1 = Layout.zorderKey(pts, Seq("a", "b"))
      .select("a", "b", "zkey").as[(Long, Long, Long)].collect().toSet
    val k2 = Layout.zorderKey(pts.repartition(3), Seq("a", "b"))
      .select("a", "b", "zkey").as[(Long, Long, Long)].collect().toSet
    assert(k1 == k2)
  }

  test("zorderKey nulls the key for null values on BOTH numeric paths") {
    // fractional path: least() ignores the null from floor(), so an
    // unguarded null value landed in the TOP bucket with the max rows —
    // it must null the key like the integral path's DECIMAL expr does
    val frac = Seq(Some(0.0), Some(0.5), Some(1.0), None).toDF("x")
    val fk = Layout.zorderKey(frac, Seq("x"), bits = 4)
      .select(col("x"), col("zkey")).collect()
      .map(r => Option(r.get(0)) -> (if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toMap
    assert(fk(None).isEmpty, "null fractional value must null the z-key")
    assert(fk(Some(1.0)).contains(15L))
    assert(fk(Some(0.0)).contains(0L))
    val ints = Seq(Some(0L), Some(100L), None).toDF("x")
    val ik = Layout.zorderKey(ints, Seq("x"), bits = 4)
      .select(col("x"), col("zkey")).collect()
      .map(r => Option(r.get(0)) -> r.isNullAt(1)).toMap
    assert(ik(None), "null integral value must null the z-key")
    assert(!ik(Some(100L)))
  }
}
