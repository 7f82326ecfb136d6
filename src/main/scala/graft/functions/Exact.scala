package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{round => sqlRound}

/** The hash-stability quantizers (SparkEntry's exact-arithmetic
  * discipline): monetary values reduce to integer CENTS and embedding
  * components to fixed-point MILLI-units BEFORE any aggregation, so every
  * fold is order-independent exact int64 and the DuckDB oracles
  * hash-match. One definition each — the conventions previously lived in
  * eleven hand-copied expressions across three files, where one typo
  * (cast before round, *1000 vs *100) would break cross-engine hashing
  * in just that query. */
object Exact {

  /** `round(x*100)::long` — integer cents. */
  def cents(c: Column): Column = sqlRound(c * 100).cast("long")

  /** SQL fragment quantizing an ARRAY<FLOAT/DOUBLE> column to
    * milli-units: `transform(col, x -> CAST(round(CAST(x AS DOUBLE) *
    * 1000) AS BIGINT))` — the embedding-side twin of [[cents]]. */
  def milliArrayExpr(col: String): String =
    s"transform($col, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
}
