package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Co-occurrence / affinity mining — the "users who bought X also bought Y"
  * family. The reference engine (a migration tool) has no analytics surface
  * at all; any warehouse replacing it runs these daily, and they are the
  * canonical "self-join that must not explode" workload.
  *
  * Scale design: the pair expansion self-joins ONLY within an order group,
  * whose size is bounded by the order's line count (≤7 in TPC-H-shaped
  * data, bounded by business reality in general) — so the blow-up is a
  * constant factor (≤ C(7,2) = 21×), never corpus². Both join sides are the
  * same projected frame, shuffled once on the SAME key (exchange reuse).
  * Everything downstream aggregates on pair keys (combinable) or joins a
  * part-cardinality count frame (broadcast).
  */
object AffinityOps {

  /** X74 — co-purchase lift: for every unordered part pair appearing in ≥2
    * common orders, the support count and the lift vs independence, in
    * integer parts-per-million (ppm keeps the ratio engine-exact; a libm
    * double divide would hash-differ in the last ulp).
    *
    * lift = P(p1,p2) / (P(p1)·P(p2)) = n_both · T / (n1 · n2), scaled 1e6.
    */
  def q110Copurchase(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // one (order, part) incidence frame: dedup multiple lines of the same
    // part in one order so pair support counts orders, not line pairs.
    // The explicit non-null filter matches what the self-join would push
    // into ITS branches only — with every consumer seeing the identical
    // subtree, ReuseExchange collapses the four uses of this distinct to
    // ONE scan + ONE (ok, pk) shuffle instead of four of each.
    val po = Tables.load(s, dir, "lineitem")
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))
      .filter($"ok".isNotNull && $"pk".isNotNull)
      .distinct()
    val a = po.select($"ok", $"pk".as("p1"))
    val b = po.select($"ok", $"pk".as("p2"))
    // within-order pair expansion: both sides hash-partition on ok (the
    // same exchange), group size bounds the quadratic term
    val pairs = a.join(b, Seq("ok")).filter($"p1" < $"p2")
      .groupBy($"p1", $"p2").agg(count(lit(1)).as("n_both"))
      .filter($"n_both" >= 2)
    // per-part order frequency: a part-cardinality frame — broadcast it
    // onto the surviving pairs rather than shuffling pairs twice
    val freq = po.groupBy($"pk").agg(count(lit(1)).as("n_orders"))
    val total = po.select(countDistinct($"ok").as("t")) // 1-row frame
    pairs
      .join(broadcast(freq.select($"pk".as("p1"), $"n_orders".as("n1"))), Seq("p1"))
      .join(broadcast(freq.select($"pk".as("p2"), $"n_orders".as("n2"))), Seq("p2"))
      .crossJoin(broadcast(total))
      .select($"p1", $"p2", $"n_both",
        expr("n_both * t * 1000000 div (n1 * n2)").as("lift_ppm"))
      .orderBy($"p1", $"p2")
  }

  /** X75 — cross-source shingle overlap: Jaccard similarity of the word-
    * TRIGRAM vocabularies of every source pair, in ppm — the corpus-level
    * "are two crawls/feeds redundant?" diagnostic that doc-level dedup
    * (X1-X7) never answers. Trigrams, not unigrams: the unigram vocabulary
    * saturates (every source shares it → every pair scores 1.0), while the
    * shingle space is sparse enough to rank pairs (1–9% here).
    *
    * Scale: the (source, trigram) incidence is ONE combinable distinct
    * (shingle-vocabulary-sized, not corpus-sized); the pair intersection
    * self-joins on the uniform trigram key; per-source vocabulary sizes
    * are a source-cardinality frame, broadcast. */
  def q117SourceOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // non-null filter aligned across all three consumers (see q110) so the
    // (source, trigram) distinct plans one scan + one exchange, reused
    val sw = Tables.load(s, dir, "documents")
      .select($"source", split($"text", " ").as("ws"))
      .select($"source", explode(expr(
        """transform(sequence(1, size(ws) - 2),
          |  i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1),
          |                 element_at(ws, i + 2)))""".stripMargin)).as("t"))
      .filter($"source".isNotNull && $"t".isNotNull)
      .distinct()
    val inter = sw.select($"t", $"source".as("s1"))
      .join(sw.select($"t", $"source".as("s2")), Seq("t"))
      .filter($"s1" < $"s2")
      .groupBy($"s1", $"s2").agg(count(lit(1)).as("n_shared"))
    val sizes = sw.groupBy($"source").agg(count(lit(1)).as("n_vocab"))
    inter
      .join(broadcast(sizes.select($"source".as("s1"), $"n_vocab".as("v1"))), Seq("s1"))
      .join(broadcast(sizes.select($"source".as("s2"), $"n_vocab".as("v2"))), Seq("s2"))
      .select($"s1", $"s2", $"n_shared", $"v1", $"v2",
        expr("n_shared * 1000000 div (v1 + v2 - n_shared)").as("jaccard_ppm"))
      .orderBy($"s1", $"s2")
  }
}
