package graft.sources

import graft.SparkSpec

/** The DSv2 scrape source: partitioned reads, schema, and synthesis parity
  * with the reference's dirty-value grammar. */
class ScrapeSourceSpec extends SparkSpec {

  private def read(n: Long, parts: Int) =
    spark.read.format("graft.sources.ScrapeSource")
      .option("numRows", n).option("numPartitions", parts).load()

  test("reads exactly numRows across numPartitions input partitions") {
    val df = read(1000, 5)
    assert(df.count() == 1000)
    assert(df.rdd.getNumPartitions == 5)
    assert(df.columns.toSeq == Seq("p_partkey", "title", "price", "rating",
      "colors", "size", "gender", "timestamp"))
  }

  test("numRows < numPartitions yields exactly numRows rows, never phantoms") {
    assert(read(2, 4).count() == 2)
    assert(read(0, 4).count() == 0)
    assert(read(5, 3).select("p_partkey").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("synthesis carries the reference dirty grammar") {
    val rows = read(200, 2).collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(13L).getString(1) == "Unknown Product")
    assert(rows(11L).getString(2) == "Price Unavailable")
    assert(rows(23L).getString(3) == "Not Rated")
    assert(rows(31L).getString(4) == "Unknown Colors")
    assert(rows(1L).getString(2).startsWith("$"))
    assert(rows(7L).getString(2).contains(","))   // comma-decimal branch
    assert(rows(5L).getString(2).startsWith("$1,")) // thousands branch
  }

  test("feeds the full pipeline: source → transform → non-empty clean table") {
    val clean = graft.etl.Transform.transform(read(500, 4))
    assert(clean.count() > 0)
    assert(clean.filter(org.apache.spark.sql.functions.col("price").isNull).count() == 0)
  }
}
