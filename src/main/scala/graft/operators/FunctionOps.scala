package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.StoredFunctions

/** Stored-function fixtures (SURVEY.md §2.5) evaluated at the driver
  * contract: each reference function class, run set-oriented for a fixed
  * parameter set. */
object FunctionOps {

  def q42StoredFunctions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val os = StoredFunctions.orderSummary(s, dir)
      .filter($"o_orderkey".isin(1L, 7L, 997L))
      .select(lit("order_summary").as("fn_name"),
        $"o_orderkey".cast("string").as("param"), $"result")
    val ss = StoredFunctions.statusSummary(s, dir)
      .select(lit("status_summary").as("fn_name"), $"status".as("param"), $"result")
    val sd = StoredFunctions.supplierDetail(s, dir)
      .filter($"s_suppkey".isin(1L, 2L, 3L))
      .select(lit("supplier_detail").as("fn_name"),
        $"s_suppkey".cast("string").as("param"), $"result")
    os.unionAll(ss).unionAll(sd).orderBy($"fn_name", $"param")
  }
}
