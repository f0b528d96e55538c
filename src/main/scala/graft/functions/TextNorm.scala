package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}

/** Column-DSL surface of [[NormalizeUnicode]] — Unicode TR15
  * normalization for text keys ahead of byte-keyed operators (exact
  * dedup, shingle hashing). NFC is the canonical composed form (and the
  * one DuckDB's `nfc_normalize()` mirrors for oracle parity); NFKC adds
  * compatibility folding (ligatures, width variants) for aggressive
  * key canonicalization. */
object TextNorm {

  private def norm(c: Column, form: String): Column =
    GraftColumnBridge.column(
      NormalizeUnicode(GraftColumnBridge.expression(c), form))

  def nfc(c: Column): Column = norm(c, "NFC")

  def nfkc(c: Column): Column = norm(c, "NFKC")
}
