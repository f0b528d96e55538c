package graft.ext

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Alias, BloomFilterMightContain, Literal, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.types.BinaryType

/** Runtime bloom-filter join pruning: build a compact membership sketch
  * of the dimension-side join keys and filter the fact table with it
  * BEFORE the exact join.
  *
  * Why this matters at 100 TB: a selective dim-side predicate ("BUILDING
  * customers") keeps only a fraction of join keys, but a shuffle join
  * still moves EVERY fact row. When the dim side is too large to
  * broadcast-hash-join outright, its bloom filter still fits in a few MB
  * — shipping the sketch and filtering at the scan cuts shuffle input by
  * the dim's selectivity at the cost of the configured false-positive
  * rate. This is exactly Spark's own AQE `InjectRuntimeFilter` shape,
  * materialized explicitly so the pruning is plan-visible and testable.
  *
  * The sketch is built with the public `DataFrameStatFunctions.bloomFilter`
  * (one distributed aggregate over the dim keys) and probed with
  * Catalyst's codegen'd `BloomFilterMightContain` — both sides use the
  * same `putLong`/`mightContainLong` hashing, so every true key passes.
  * The exact join afterwards removes the false positives, so results are
  * bit-identical to the unpruned join.
  */
object BloomPrune {

  /** An EAGER `might_contain(sketch, key)` predicate: the sketch is built
    * now (one distributed aggregate) and rides the plan as a binary
    * literal — broadcast once per executor like any literal. Useful when
    * the same sketch filters several downstream queries; for a
    * single-query filter prefer [[mightContainSubquery]], which defers
    * the build into the query's own plan. */
  def mightContain(dim: DataFrame, dimKey: String, expectedKeys: Long,
      fpp: Double, factKey: Column): Column = {
    val bf = dim.stat.bloomFilter(dimKey, expectedKeys, fpp)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    GraftColumnBridge.column(BloomFilterMightContain(
      Literal(out.toByteArray, BinaryType),
      GraftColumnBridge.expression(factKey)))
  }

  /** The LAZY form Spark's own `InjectRuntimeFilter` emits: the sketch is
    * a scalar subquery (`bloom_filter_agg` over the dim keys) INSIDE the
    * probe plan, so constructing the DataFrame launches no job and the
    * optimizer schedules the build like any other subquery. Both sides
    * hash with `XxHash64`, mirroring Spark's runtime-filter convention. */
  def mightContainSubquery(dim: DataFrame, dimKey: String, expectedKeys: Long,
      fpp: Double, factKey: Column): Column = {
    // standard bloom sizing: m = -n·ln(p) / (ln 2)²
    val numBits = math.ceil(
      -expectedKeys * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val analyzed = dim.queryExecution.analyzed
    val key = analyzed.output.find(_.name == dimKey).getOrElse(
      throw new IllegalArgumentException(s"$dimKey not in ${analyzed.output.map(_.name)}"))
    val agg = new BloomFilterAggregate(new XxHash64(Seq(key)),
      Literal(expectedKeys), Literal(numBits)).toAggregateExpression()
    val sketchPlan = Aggregate(Nil, Seq(Alias(agg, "bf")()), analyzed)
    GraftColumnBridge.column(BloomFilterMightContain(
      ScalarSubquery(sketchPlan),
      new XxHash64(Seq(GraftColumnBridge.expression(factKey)))))
  }

  /** Prune `fact` to rows whose `factKey` might be in `dim.dimKey`, then
    * left-semi join to drop the sketch's false positives. Semantically a
    * plain semi join; physically the semi join's shuffle reads only the
    * bloom survivors. */
  def semiJoinPruned(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.functions.col
    // dim key is aliased so fact and dim may share the same column name
    // (the usual case for a semi-join helper) without an ambiguous-
    // reference failure
    fact
      .filter(mightContainSubquery(dim, dimKey, expectedKeys, fpp, col(factKey)))
      .join(dim.select(col(dimKey).as("__bloom_dim_key")).distinct(),
        col(factKey) === col("__bloom_dim_key"), "left_semi")
  }
}
