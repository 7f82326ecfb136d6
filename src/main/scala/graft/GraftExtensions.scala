package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, Fingerprint, InetAton, InetNtoa,
  JsonFunctions, PointDecode, SortedIntersectSize}

/** Session-extension entry point: makes every graft custom function
  * available in any session via
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`), the
  * library-grade alternative to calling each `register(spark)` by hand.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_fingerprint"),
      info("graft_fingerprint", "rolling polynomial hash of a string"),
      (exprs: Seq[Expression]) => Fingerprint(exprs.head)))
    ext.injectFunction((FunctionIdentifier("inet_aton"),
      info("inet_aton", "dotted-quad IPv4 to number (MySQL semantics)"),
      (exprs: Seq[Expression]) => InetAton(exprs.head)))
    ext.injectFunction((FunctionIdentifier("inet_ntoa"),
      info("inet_ntoa", "number to dotted-quad IPv4"),
      (exprs: Seq[Expression]) => InetNtoa(exprs.head)))
    ext.injectFunction((FunctionIdentifier("graft_point_decode"),
      info("graft_point_decode", "MySQL WKB point bytes to struct(x,y)"),
      (exprs: Seq[Expression]) => PointDecode(exprs.head)))
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "sequential-fold dot product of two ARRAY<DOUBLE>"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_sorted_inter_n"),
      info("graft_sorted_inter_n",
        "intersection size of two sorted distinct arrays (merge count)"),
      (exprs: Seq[Expression]) => SortedIntersectSize(exprs(0), exprs(1))))
    JsonFunctions.modes.foreach { m =>
      ext.injectFunction((FunctionIdentifier(s"graft_json_$m"),
        info(s"graft_json_$m", s"MySQL JSON_${m.toUpperCase} semantics"),
        (exprs: Seq[Expression]) => JsonFunctions.JsonMutateExpr(exprs, m)))
    }
  }
}
