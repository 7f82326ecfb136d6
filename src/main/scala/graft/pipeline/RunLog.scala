package graft.pipeline

/** File/error log split — the reference's `Log`/`logError` pair
  * (manager.go:1695-1737) re-expressed: timestamped lines appended to a
  * run log file and errors additionally routed to a SEPARATE error file,
  * each gated by config toggles (config.go:84-91):
  *
  *  - `enable_file_logging` + `log_file_path` / `error_log_path`: both
  *    files open in append mode (the reference's O_APPEND|O_CREATE), so
  *    successive runs accumulate one audit trail;
  *  - `show_log_in_console` mirrors info lines to stdout;
  *  - `show_console_logs` mirrors error lines to stdout.
  *
  * Driver-side only: executors never log through this — at cluster scale
  * per-task logging belongs to Spark's own executor logs, and this file
  * carries the per-stage/per-table migration narrative the operator reads.
  * Writers are lazily opened (no files appear unless file logging is on)
  * and flushed per line so a crashed run keeps its tail.
  */
final class RunLog(
    val enableFileLogging: Boolean = false,
    val logFilePath: String = "graft_run.log",
    val errorLogPath: String = "graft_error.log",
    val showConsoleLogs: Boolean = true,
    val showLogInConsole: Boolean = false) extends AutoCloseable {

  private def open(p: String): java.io.PrintWriter =
    new java.io.PrintWriter(new java.io.FileWriter(p, true))
  private lazy val logFile: Option[java.io.PrintWriter] =
    if (enableFileLogging) Some(open(logFilePath)) else None
  private lazy val errFile: Option[java.io.PrintWriter] =
    if (enableFileLogging) Some(open(errorLogPath)) else None
  private val fmt =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
  private def stamp: String = java.time.LocalDateTime.now.format(fmt)

  def log(msg: String): Unit = synchronized {
    logFile.foreach { f => f.println(s"[$stamp] $msg"); f.flush() }
    if (showLogInConsole) println(msg)
  }

  /** Errors land in BOTH files (the narrative shows where the run stopped;
    * the error file is the grep target), like the reference's logError. */
  def error(msg: String): Unit = synchronized {
    logFile.foreach { f => f.println(s"[$stamp] ERROR: $msg"); f.flush() }
    errFile.foreach { f => f.println(s"[$stamp] ERROR: $msg"); f.flush() }
    if (showConsoleLogs) println(s"error: $msg")
  }

  override def close(): Unit = synchronized {
    logFile.foreach(_.close())
    errFile.foreach(_.close())
  }
}

object RunLog {
  /** Console-only (file logging off, narrative on stdout). Info lines
    * must actually reach the console here — with showLogInConsole left
    * false this logger would silently discard the whole run narrative. */
  def consoleOnly: RunLog = new RunLog(showLogInConsole = true)
}
