package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Registry.table

/** Pins the deterministic-shuffle shard writer: partition-complete
  * (every doc in exactly one shard), balanced under the uniform key,
  * write→read round-trip equals the in-memory assignment, byte-for-byte
  * deterministic across independent writes, and within-shard order is
  * the shuffle-key order the loader streams. */
class ShardsSpec extends SparkSpec {

  private def docs = table(spark, sf("sf0.001"), "documents")

  test("shard assignment: total, disjoint, uniform-ish, stats agree") {
    val n = 10
    val assigned = Shards.assignShards(docs, n).cache()
    try {
      val total = docs.count()
      assert(assigned.count() == total, "assignment dropped or duplicated docs")
      val perShard = assigned.groupBy("shard").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(perShard.keys.forall(s => s >= 0 && s < n), "shard id out of range")
      assert(perShard.values.sum == total)
      // 50 docs over 10 shards: uniform md5 keys won't put >40% in one shard
      assert(perShard.values.max <= math.max(10, total * 2 / n),
        s"badly skewed shards: $perShard")
      // the audit's n_docs column is the same partition of the corpus
      val stats = Shards.shardStats(docs, n).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(stats == perShard)
    } finally { assigned.unpersist(); () }
  }

  test("hexVal resolves derived columns, matching driver-side md5 digits") {
    // regression: the expr()-interpolated form only parsed for a bare
    // named column; the Column-API form must accept any derived input
    import spark.implicits._
    val rows = Seq("a", "b", "xyz").toDF("s")
    val got = rows.select(col("s"),
        Shards.hexVal(md5(concat(col("s"), lit("#salt")).cast("binary")), 1).as("d1"),
        Shards.hexVal(md5(concat(col("s"), lit("#salt")).cast("binary")), 5).as("d5"))
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    Seq("a", "b", "xyz").foreach { s =>
      val h = md5hex(s + "#salt")
      assert(got(s) == (Character.digit(h.charAt(0), 16), Character.digit(h.charAt(4), 16)),
        s"hex digits diverged for '$s' (hash $h)")
    }
  }

  test("shard assignment: 16-bit key fold covers every shard id; bound enforced") {
    // the 8-bit fold this replaced left shards >= 256 structurally empty
    // and skewed non-divisors of 256; 16 bits caps mod-bias at n/65536
    val n = 300
    val perShard = Shards.assignShards(
        docs.limit(0).unionByName(docs), n) // same docs, exercise the path
      .groupBy("shard").count().collect().map(_.getInt(0)).toSet
    assert(perShard.forall(s => s >= 0 && s < n))
    // 50 docs cannot fill 300 shards, but ids past 255 must be REACHABLE:
    // fold four digits of known keys and check the arithmetic span
    val h = Shards.assignShards(docs, 4096).select("shard").collect()
      .map(_.getInt(0))
    assert(h.exists(_ > 255) || docs.count() < 20,
      s"16-bit fold never produced a shard id above 255 across ${h.length} docs")
    intercept[IllegalArgumentException] { Shards.assignShards(docs, 5000) }
    intercept[IllegalArgumentException] { Shards.assignShards(docs, 0) }
  }

  test("writeShards: round-trip matches assignment; independent writes identical") {
    val n = 4
    val root = java.nio.file.Files.createTempDirectory("graft_shards")
    val p1 = s"$root/w1"; val p2 = s"$root/w2"
    Shards.writeShards(docs, n, p1)
    Shards.writeShards(docs, n, p2)
    val r1 = spark.read.parquet(p1)
    val r2 = spark.read.parquet(p2)
    // every doc exactly once, shard column survives the partitioned write
    val expected = Shards.assignShards(docs, n)
      .select(col("doc_id"), col("shard")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    def readSet(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("shard").cast("int")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(readSet(r1) == expected, "round-trip lost or moved documents")
    assert(readSet(r2) == expected)
    // determinism: same corpus, two writes, identical per-shard content
    // in identical within-file order (read file-by-file, compare rows)
    def shardOrder(path: String, s: Int) = spark.read.parquet(s"$path/shard=$s")
      .select("h", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    (0 until n).foreach { s =>
      val o1 = shardOrder(p1, s); val o2 = shardOrder(p2, s)
      assert(o1 == o2, s"shard $s differs between two writes of the same corpus")
      // loader contract: a shard streams in ascending shuffle-key order.
      // One written file per shard here (4 input partitions → ≤1 file per
      // shard after the shard repartition), so read order IS file order.
      assert(o1.map(_._1) == o1.map(_._1).sorted,
        s"shard $s not in shuffle-key order")
    }
  }

  test("balance audit: balanced leg == scalar round-robin reference; hash leg == shardStats") {
    import spark.implicits._
    // skewed fixture: one giant doc + a long tail, plus ties on token
    // count (the doc_id tiebreak must decide deterministically)
    val docs = ((1L to 12L).map(i => (i, Seq.fill(5)("t").mkString(" "))) :+
      (99L, Seq.fill(100)("g").mkString(" "))).toDF("doc_id", "text")
    val n = 4
    val out = graft.ext.Shards.balanceAudit(docs, n).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // scalar reference for the balanced leg: rank by (tok desc, id asc)
    val toks = ((1L to 12L).map(_ -> 5L) :+ (99L -> 100L))
    val ranked = toks.sortBy { case (id, t) => (-t, id) }.zipWithIndex
    val byShard = ranked.groupBy(_._2 % n).view
      .mapValues(rs => (rs.size.toLong, rs.map(_._1._2).sum)).toMap
    val tot = toks.map(_._2).sum
    (0 until n).foreach { s =>
      val (nd, tm) = byShard(s)
      assert(out(("balanced", s)) == ((nd, tm, tm * 1000000L / tot)),
        s"balanced shard $s: ${out(("balanced", s))} want ($nd, $tm)")
    }
    // the giant doc dominates: balanced puts it alone on shard 0 with the
    // max share; hash can land it anywhere — cross-check hash totals
    // against the independent shardStats implementation
    val hs = graft.ext.Shards.shardStats(docs, n).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    hs.foreach { case (s, (nd, tm)) =>
      assert(out(("hash", s)) == ((nd, tm, tm * 1000000L / tot)),
        s"hash shard $s diverges from shardStats")
    }
    assert(out(("balanced", 0))._2 == 100L + 3 * 5L,
      "shard 0 gets ranks 0,4,8,12: the giant plus three 5-token docs")
  }

  test("padGuard: 0 under the bound, loud SparkException over it (the two pad-contract guards)") {
    import spark.implicits._
    val ok = Seq(1L, 99L, 100L).toDF("v")
      .select((lit(100L) - col("v") + Guards.padGuard(col("v"), 100L, "t")).as("c"))
      .collect().map(_.getLong(0)).toSet
    assert(ok == Set(99L, 1L, 0L), "in-contract values must pass through unchanged")
    val thrown = intercept[Exception] {
      Seq(101L).toDF("v")
        .select(Guards.padGuard(col("v"), 100L, "test quantity"))
        .collect()
    }
    assert(thrown.getMessage.contains("pad contract"), thrown.getMessage)
  }
}
