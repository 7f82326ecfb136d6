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

/** The secret/credential detector regexes, shared by the batch audit
  * (q246, [[PipelineOps.q246SecretScan]]) and the streaming ingest gate
  * ([[graft.streaming.EventStream.secretGate]]) — one definition so the
  * batch and stream scanners can never silently diverge. These contain
  * no backslash escapes, so they are safe in both the Column API and
  * `expr()` strings. */
object SecretPatterns {
  /** 32+-char lowercase-hex runs — hash/key material. */
  val HexRun = "[0-9a-f]{32,}"
  /** AWS-style access-key ids. */
  val AwsKeyId = "AKIA[0-9A-Z]{16}"
  /** Credential assignments with a 16+-char value. */
  val CredAssign = "(?i)(?:api_key|secret|token|password)=[A-Za-z0-9+/_-]{16,}"
}
