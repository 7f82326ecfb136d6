package graft.ops

/** The PII detector regexes, shared by the batch scrub (q81,
  * [[PipelineOps.q81PiiRedact]]) and the streaming ingest gate
  * ([[graft.streaming.EventStream.docQualityGate]]) — one definition so
  * the batch and stream scrubs can never silently diverge. Pass them
  * through the Column API (`lit`/`regexp_replace(col, pat, rep)`), never
  * interpolated into `expr()` strings (Spark SQL literals eat
  * backslashes). */
object PiiPatterns {
  val Email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4  = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
  val LongNumber = "\\d{6,}"
}
