package graft.queries

import org.apache.spark.sql.DataFrame

/** Oracle side-channel for the hash-seeded operators (MinHash / SimHash /
  * LSH / IVF): their *candidate generation* is seeded-hash math DuckDB
  * cannot reproduce, but the *verification* (exact Jaccard / Hamming /
  * cosine over the candidate pairs) is pure ANSI SQL. Each such query
  * persists its candidate-pair table here and reads it back, so the
  * DuckDB oracle can recompute the verify step over exactly the same
  * pair set and hash-compare the final output.
  *
  * Paths are keyed by the sf-directory basename so a bench run at sf0.1
  * can never clobber the sf0.01 candidates between the driver's Verify
  * dump and its DuckDB compare. The oracle SQL pins sf0.01 — the driver's
  * verify scale — exactly like the existing DSv2-source oracle.
  */
object OracleAux {
  val root = "/tmp/graft_oracle_aux"

  /** Persist `df` for the oracle and return the read-back frame, so the
    * Spark verify step provably runs over the persisted pair set. */
  def persist(sfDir: String, name: String)(df: DataFrame): DataFrame = {
    val path = s"$root/${new java.io.File(sfDir).getName}/$name"
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** DuckDB-side glob for a candidate table persisted by [[persist]]. */
  def duckGlob(name: String): String = s"'$root/sf0.01/$name/*.parquet'"
}
