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

  private def sfRoot(sfDir: String) =
    s"$root/${new java.io.File(sfDir).getName}"

  /** Remove this sf's candidate tables (Verify calls it up front so the
    * oracle can never compare against a stale set from an older run). */
  def clear(sfDir: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    val dir = new java.io.File(sfRoot(sfDir))
    if (dir.exists()) rm(dir)
  }

  /** Persist `df` for the oracle and return the read-back frame, so the
    * Spark verify step provably runs over the persisted pair set.
    *
    * Known tradeoff: the write runs at DataFrame-CONSTRUCTION time, so
    * building one of the six candidate-persisting queries executes its
    * candidate-generation job even if the caller only wants the plan —
    * the price of guaranteeing that what DuckDB re-verifies is exactly
    * what Spark scored. Plan-only tooling should inspect the other 86
    * queries, and Bench timings for these six deliberately include the
    * candidate write+read (it IS part of the operator's pipeline in the
    * registered, verifiable form). */
  def persist(sfDir: String, name: String)(df: DataFrame): DataFrame = {
    val path = s"${sfRoot(sfDir)}/$name"
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** DuckDB-side glob for a candidate table persisted by [[persist]].
    *
    * The sf segment defaults to sf0.01 — the driver's verify scale — but
    * is overridable via SPARK_GRAFT_ORACLE_SF so the sf-portability sweep
    * can run the same Verify + DuckDB compare at sf0.1 with the oracle
    * reading THAT corpus's candidate tables. The env var is read once at
    * JVM start (the SQL strings are built at registry init); the driver
    * never sets it, so its gate path is byte-identical to before. */
  private val oracleSf =
    sys.env.getOrElse("SPARK_GRAFT_ORACLE_SF", "sf0.01")
  def duckGlob(name: String): String = s"'$root/$oracleSf/$name/*.parquet'"

  /** Oracle-side row count for SQL strings whose Spark twin scales with
    * the corpus (e.g. the DSv2 scrape source follows `part.count()`).
    * The synthetic corpus holds 200/2000/20000 part rows at
    * sf0.001/0.01/0.1; the driver's gate (no env var → sf0.01) keeps the
    * original 2000-row contract byte-identical. */
  def oracleScaleRows(rowsAtGate: Long): Long = oracleSf match {
    case "sf0.001" => rowsAtGate / 10
    case "sf0.01"  => rowsAtGate
    case "sf0.1"   => rowsAtGate * 10
    // fail LOUDLY: a silent gate-count fallback at an unknown sf would
    // surface as a phantom row-count diff in the Spark-side source
    case other => throw new IllegalArgumentException(
      s"SPARK_GRAFT_ORACLE_SF=$other has no known row scale " +
        "(known: sf0.001, sf0.01, sf0.1) — add its multiplier here")
  }
}
