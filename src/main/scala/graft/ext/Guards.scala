package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Loud contract guards for zero-padded complement sort keys (winnowing's
  * position complement, balanceAudit's token complement): a value over
  * the documented bound would make the complement negative and the
  * lpad'ed key lexicographically wrong — silent corruption. */
object Guards {

  /** 0L while `c ≤ bound` (add it to the complement and nothing
    * changes); raises with `what` + the offending value otherwise.
    * assert_true is NULL on pass, so the coalesce keeps the expression
    * codegen-friendly with no extra pass over the data. */
  def padGuard(c: Column, bound: Long, what: String): Column =
    coalesce(assert_true(c <= bound,
      concat(lit(s"$what exceeds the $bound pad contract (got "),
        c.cast("string"), lit(")"))).cast("long"), lit(0L))
}
