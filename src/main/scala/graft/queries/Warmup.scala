package graft.queries

import org.apache.spark.sql.SparkSession

/** Pre-builds the once-per-corpus derived artifacts (IVF serving index,
  * SimHash pair table, co-purchase edge list, hive-partitioned layout) so
  * a benchmark's FIRST timed trial measures the operator, not the
  * snapshot build. In production each of these is materialized once per
  * corpus snapshot and every consumer reads the artifact — timing the
  * build inside a serving-path trial is exactly the attribution error the
  * round-5 bench hit (`sim_topk_ivf_indexed` trial 1 carried the whole
  * index build: 4.7 s vs 1.2 s warm). `index_upsert` is deliberately NOT
  * warmed: paying the real build+merge per invocation is that query's
  * contract (it times the maintenance path itself). */
object Warmup {
  def artifacts(s: SparkSession, dir: String): Unit = {
    ExtQueries.ivfIndexPath(s, dir)
    ExtQueries.quantIndexPath(s, dir)
    ScaleQueries.invertedIndexPath(s, dir)
    ScaleQueries.inflatedIndexPath(s, dir)
    ExtQueries.plantedIndexPath(s, dir)
    ExtQueries.plantedChunksPath(s, dir)
    ExtQueries.simhashPairsCached(s, dir)
    ScaleQueries.copurchaseEdgesCached(s, dir)
    ScaleQueries.triAdjCached(s, dir)
    ScaleQueries.partitionedOrdersPath(s, dir)
    CurationQueries.gramDfPath(s, dir)
    ()
  }
}
