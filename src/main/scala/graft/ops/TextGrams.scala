package graft.ops

/** The word n-gram fingerprint expression, shared by MinHash shingling
  * (n=3, `DedupOps.signatures`) and duplicated-gram coverage (n=5,
  * `PipelineOps.q94DupGramCoverage`) — one definition of the
  * off-by-one-prone window arithmetic.
  *
  * Emits a SQL expression over a column `ws: ARRAY<STRING>` producing
  * `ARRAY<BIGINT>`: the portable fingerprint of each space-joined n-word
  * window, one per position. CALLERS must guard `size(ws) >= n` — below
  * that the sequence would run descending and index out of bounds — and
  * must have `Fingerprint.register`ed the session. */
object TextGrams {
  def fpArrayExpr(n: Int, ws: String = "ws"): String = {
    val words = (0 until n).map(j => s"element_at($ws, i + $j)").mkString(", ")
    s"transform(sequence(1, size($ws) - ${n - 1}), i -> graft_fingerprint(concat_ws(' ', $words)))"
  }
}
