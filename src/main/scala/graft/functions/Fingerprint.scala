package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial hash fingerprint: `acc = (acc*31 + byte) mod 1e9+7`
  * over the UTF-8 bytes of the input.
  *
  * A native Catalyst expression with codegen (not a Scala UDF) so it stays
  * inside WholeStageCodegen on the hot path — used for document
  * fingerprinting and as the portable shingle hash for MinHash (the same
  * arithmetic is expressible in any engine, which is what makes the dedup
  * oracles cross-checkable).
  *
  * ORACLE CONVENTION: this hashes UTF-8 BYTES, and the DuckDB oracles
  * replay it byte-exactly on ANY Unicode text via SparkEntry.FpByteFold —
  * a 0-seeded codepoint fold whose step expands each codepoint into its
  * 1-4 UTF-8 bytes algebraically (a*31^k + Σ bᵢ·31^(k-i) mod 1e9+7).
  * q252_utf8_fingerprint is the oracle-gated proof on a planted
  * accents/Greek/CJK/emoji corpus; there is no ASCII precondition.
  *
  * The modulus keeps values < 2^30, so downstream `a*h+b` permutation
  * arithmetic in MinHash never overflows int64.
  */
case class Fingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fingerprint requires STRING, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31 + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $acc = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $acc = ($acc * 31 + ($bytes[$i] & 0xff)) % 1000000007L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Fingerprint =
    copy(child = newChild)
}

object Fingerprint {
  /** Driver-side evaluation of the same hash — for precomputing constants
    * (e.g. deterministic LSH hyperplanes) without a per-row expression. */
  def hashString(s: String): Long = {
    val bytes = s.getBytes("UTF-8")
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31 + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    acc
  }

  /** SQL registration; usable both as a Column (via [[fingerprint]]) and
    * inside lambda expressions (`transform(arr, s -> graft_fingerprint(s))`). */
  def register(spark: SparkSession): Unit = {
    Registration.once(spark, "graft_fingerprint") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_fingerprint", exprs => Fingerprint(exprs.head), "built-in")
    }
    Registration.once(spark, "graft_fingerprint_seeded") {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_fingerprint_seeded",
        exprs => FingerprintSeeded(exprs.head, exprs(1)), "built-in")
    }
  }

  /** Column API over the registered function (register() must run first). */
  def fingerprint(colName: String): Column = expr(s"graft_fingerprint($colName)")

  /** The fold modulus (1e9+7), named for the linear-fold algebra below. */
  val FpMod: Long = 1000000007L

  /** 31^j mod 1e9+7 for j = 1..128 (Pow31(j-1) = 31^j): the suffix-length
    * powers the LINEAR FOLD IDENTITY needs. The fold acc←acc·31+byte is
    * affine in acc, so folding a suffix `b` from seed `s` gives
    * `s·31^|b| + fp(b) (mod 1e9+7)` — i.e.
    * `fp(concat(a, b)) = fp(a)·31^octet_length(b) + fp(b) (mod p)`.
    * Hot paths that need fp(constᵢ ++ suffix) for MANY i therefore fold
    * the suffix ONCE and finish each i with one multiply-add instead of
    * re-folding the whole string per i (q344/q369/q374/q388/q399 — the
    * 32–512-replicate sign/weight families). The identity is the same
    * one [[FingerprintSeeded]]'s scaladoc states; the driver replays
    * (specs, oracles) keep hashing the full concatenation, which is
    * equal by construction. */
  val Pow31: IndexedSeq[Long] =
    Iterator.iterate(31L)(x => x * 31L % FpMod).take(128).toIndexedSeq

  /** SQL for `31^octet_length(strExpr) mod 1e9+7`, total for ANY length:
    * the seeded fold from 1 over octet_length zero bytes — each 0x00
    * byte multiplies the accumulator by exactly 31, so the fold IS
    * modular exponentiation. Chosen over an element_at(literal-array)
    * lookup because these expressions live inside HOF lambdas, where
    * CreateArray of literals is NOT constant-folded and a 128-literal
    * array would be re-built per row (measured on q369: the lookup
    * form cost more than it saved at r = 32). */
  def pow31LenSql(strExpr: String): String =
    s"graft_fingerprint_seeded(1L, repeat(chr(0), octet_length($strExpr)))"
}

/** The SAME rolling fold continued from an explicit seed:
  * `graft_fingerprint_seeded(graft_fingerprint(a), b)
  *  == graft_fingerprint(concat(a, b))` by definition of the fold (the
  * fold is left-associative, so a prefix's accumulator IS the seed for
  * the suffix). Exists for hot paths that hash a per-row prefix once and
  * extend it with a tiny varying suffix (q374 folds a ≤2-digit rep index
  * into a once-per-row 25-char prefix hash — 48M short folds instead of
  * 48M full concat+hash). DuckDB oracles need no counterpart: the
  * bounded fixture hashes the full concatenated string, which is equal
  * by the identity above (the spec pins it property-style). */
case class FingerprintSeeded(seed: Expression, child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = seed
  override def right: Expression = child
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (seed.dataType == LongType && child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fingerprint_seeded requires (BIGINT, STRING), got " +
          s"(${seed.dataType.catalogString}, ${child.dataType.catalogString})")

  override def nullSafeEval(seedV: Any, input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var acc = seedV.asInstanceOf[Long]
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31 + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s0, c) => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $acc = $s0;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $acc = ($acc * 31 + ($bytes[$i] & 0xff)) % 1000000007L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FingerprintSeeded =
    copy(seed = newLeft, child = newRight)
}
