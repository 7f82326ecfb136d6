package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode, JsonNodeFactory}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MySQL JSON *mutation* functions (SURVEY.md §2.4: JSON_SET / JSON_INSERT /
  * JSON_REPLACE / JSON_REMOVE / JSON_ARRAY_APPEND / JSON_MERGE_PATCH /
  * JSON_MERGE_PRESERVE, reference `sync_viewddl.go:39-45`, `:452-474`) —
  * Spark has read-side JSON functions (`get_json_object`, `from_json`) but
  * no mutators, so these are custom expressions over Jackson (already on
  * Spark's classpath). Interpreted (CodegenFallback), which is fine: view
  * rewriting is a cold path, and each call is O(|document|).
  *
  * Path subset: `$`, `$.name`, `$.a.b`, `$.a[i]`, nested combinations —
  * the same subset the reference's PG translation relies on. Semantics
  * follow MySQL:
  *  - SET: create-or-replace at path (array index past the end appends)
  *  - INSERT: only create (existing values untouched)
  *  - REPLACE: only overwrite (absent paths untouched)
  *  - REMOVE: delete if present
  *  - ARRAY_APPEND: append to array at path (non-array values are wrapped)
  *  - MERGE_PATCH: RFC 7386 (null values delete keys, objects recurse)
  *  - MERGE_PRESERVE: arrays/scalars concatenate, objects union recursively
  * Invalid JSON or unsupported paths → NULL (MySQL raises; NULL is the
  * Spark-idiomatic total form, matching get_json_object's behavior).
  */
object JsonFunctions {

  private val mapper = new ObjectMapper()
  private val nf = JsonNodeFactory.instance

  sealed trait Seg
  final case class Key(name: String) extends Seg
  final case class Idx(i: Int) extends Seg

  /** "$.a.b[2].c" → [Key(a), Key(b), Idx(2), Key(c)]; None on parse error. */
  def parsePath(p: String): Option[List[Seg]] = {
    val t = p.trim
    if (!t.startsWith("$")) return None
    var i = 1
    val segs = List.newBuilder[Seg]
    while (i < t.length) {
      t.charAt(i) match {
        case '.' =>
          val start = i + 1
          var j = start
          while (j < t.length && t.charAt(j) != '.' && t.charAt(j) != '[') j += 1
          if (j == start) return None
          segs += Key(t.substring(start, j))
          i = j
        case '[' =>
          val close = t.indexOf(']', i)
          if (close < 0) return None
          val idx = t.substring(i + 1, close).trim.toIntOption.getOrElse(return None)
          if (idx < 0) return None
          segs += Idx(idx)
          i = close + 1
        case _ => return None
      }
    }
    Some(segs.result())
  }

  private def navigate(root: JsonNode, segs: List[Seg]): Option[JsonNode] =
    segs.foldLeft(Option(root)) {
      case (Some(o: ObjectNode), Key(k)) => Option(o.get(k))
      case (Some(a: ArrayNode), Idx(i)) => Option(a.get(i))
      case _ => None
    }

  /** Apply one (path, value) mutation; returns the mutated root (in place). */
  def mutate(root: JsonNode, segs: List[Seg], value: JsonNode, mode: String): JsonNode = {
    if (segs.isEmpty) return mode match {
      case "replace" | "set" => value
      case "array_append" => // MySQL appends at '$' too, wrapping non-arrays
        root match {
          case a: ArrayNode => a.add(value); a
          case other =>
            val arr = nf.arrayNode(); arr.add(other); arr.add(value); arr
        }
      case _ => root // insert/remove at '$' are no-ops
    }
    val parent = navigate(root, segs.init).orNull
    val last = segs.last
    (parent, last) match {
      // NOTE: Jackson's set/add/remove return generically-typed results
      // (`<T extends JsonNode> T`); every call discards the result with an
      // explicit unit so scalac can't unify the branch types into a bogus
      // checkcast.
      case (o: ObjectNode, Key(k)) =>
        val exists = o.has(k)
        mode match {
          case "set" => o.set[JsonNode](k, value); ()
          case "insert" if !exists => o.set[JsonNode](k, value); ()
          case "replace" if exists => o.set[JsonNode](k, value); ()
          case "remove" if exists => o.remove(k); ()
          case "array_append" if exists =>
            o.get(k) match {
              case a: ArrayNode => a.add(value); ()
              case other =>
                val arr = nf.arrayNode(); arr.add(other); arr.add(value)
                o.set[JsonNode](k, arr); ()
            }
          case _ =>
        }
      case (a: ArrayNode, Idx(i)) =>
        val exists = i < a.size()
        mode match {
          case "set" => if (exists) { a.set(i, value); () } else { a.add(value); () }
          case "insert" if !exists => a.add(value); ()
          case "replace" if exists => a.set(i, value); ()
          case "remove" if exists => a.remove(i); ()
          case "array_append" if exists =>
            a.get(i) match {
              case inner: ArrayNode => inner.add(value); ()
              case other =>
                val arr = nf.arrayNode(); arr.add(other); arr.add(value)
                a.set(i, arr); ()
            }
          case _ =>
        }
      case _ => // parent missing: MySQL leaves the document unchanged
    }
    root
  }

  /** RFC 7386 merge patch. */
  def mergePatch(target: JsonNode, patch: JsonNode): JsonNode = patch match {
    case p: ObjectNode =>
      val base = target match {
        case o: ObjectNode => o
        case _ => nf.objectNode()
      }
      val fields = p.fields()
      while (fields.hasNext) {
        val e = fields.next()
        if (e.getValue.isNull) base.remove(e.getKey)
        else base.set(e.getKey, mergePatch(
          if (base.has(e.getKey)) base.get(e.getKey) else nf.objectNode(), e.getValue))
      }
      base
    case other => other.deepCopy[JsonNode]()
  }

  /** MySQL JSON_MERGE_PRESERVE: objects union (recursing on shared keys),
    * everything else concatenates into arrays. */
  def mergePreserve(a: JsonNode, b: JsonNode): JsonNode = (a, b) match {
    case (x: ObjectNode, y: ObjectNode) =>
      val out = x
      val fields = y.fields()
      while (fields.hasNext) {
        val e = fields.next()
        if (out.has(e.getKey)) out.set(e.getKey, mergePreserve(out.get(e.getKey), e.getValue))
        else out.set(e.getKey, e.getValue)
      }
      out
    case _ =>
      val out = nf.arrayNode()
      def push(n: JsonNode): Unit = n match {
        case arr: ArrayNode =>
          val it = arr.elements(); while (it.hasNext) out.add(it.next())
        case other => out.add(other)
      }
      push(a); push(b)
      out
  }

  private[functions] def toValueNode(v: Any, dt: DataType): JsonNode = (v, dt) match {
    case (null, _) => nf.nullNode()
    case (s: UTF8String, StringType) => nf.textNode(s.toString)
    case (i: Int, IntegerType) => nf.numberNode(i)
    case (l: Long, LongType) => nf.numberNode(l)
    case (d: Double, DoubleType) => nf.numberNode(d)
    case (f: Float, FloatType) => nf.numberNode(f)
    case (s: Short, ShortType) => nf.numberNode(s)
    case (b: Boolean, BooleanType) => nf.booleanNode(b)
    case (d: org.apache.spark.sql.types.Decimal, _: DecimalType) =>
      nf.numberNode(d.toJavaBigDecimal)
    case (other, _) => nf.textNode(String.valueOf(other))
  }

  /** graft_json_mutate family: one expression per mode. */
  case class JsonMutateExpr(children: Seq[Expression], mode: String)
      extends Expression with CodegenFallback {

    override def dataType: DataType = StringType
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = {
      val arity = mode match {
        case "remove" => 2
        case "merge_patch" | "merge_preserve" => 2
        case _ => 3
      }
      if (children.length != arity)
        TypeCheckResult.TypeCheckFailure(s"graft_json_$mode expects $arity args")
      else if (children.head.dataType != StringType)
        TypeCheckResult.TypeCheckFailure("first arg must be a JSON string")
      else if (children(1).dataType != StringType)
        TypeCheckResult.TypeCheckFailure(
          if (mode == "merge_patch" || mode == "merge_preserve")
            "patch arg must be a JSON string"
          else "path arg must be a string")
      else TypeCheckResult.TypeCheckSuccess
    }

    override def eval(input: InternalRow): Any = {
      val jv = children.head.eval(input)
      if (jv == null) return null
      val rootTry = try { Some(mapper.readTree(jv.asInstanceOf[UTF8String].toString)) }
                    catch { case _: Exception => None }
      val root = rootTry.orNull
      if (root == null) return null
      val out: JsonNode = mode match {
        case "merge_patch" | "merge_preserve" =>
          val pv = children(1).eval(input)
          if (pv == null) return null
          val patch = try { mapper.readTree(pv.asInstanceOf[UTF8String].toString) }
                      catch { case _: Exception => return null }
          if (mode == "merge_patch") mergePatch(root, patch) else mergePreserve(root, patch)
        case "remove" =>
          val pv = children(1).eval(input)
          if (pv == null) return null
          parsePath(pv.asInstanceOf[UTF8String].toString) match {
            case Some(segs) if segs.nonEmpty => mutate(root, segs, nf.nullNode(), "remove")
            case _ => return null
          }
        case m =>
          val pv = children(1).eval(input)
          if (pv == null) return null
          val value = toValueNode(children(2).eval(input), children(2).dataType)
          parsePath(pv.asInstanceOf[UTF8String].toString) match {
            case Some(segs) => mutate(root, segs, value, m)
            case None => return null
          }
      }
      UTF8String.fromString(mapper.writeValueAsString(out))
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): JsonMutateExpr =
      copy(children = newChildren)
  }

  /** Single source of truth for the mutator modes — both registration
    * paths (session [[register]] and [[graft.GraftExtensions]]) iterate
    * this, so they cannot drift. */
  val modes: Seq[String] = Seq("set", "insert", "replace", "remove",
    "array_append", "merge_patch", "merge_preserve")

  def register(spark: SparkSession): Unit =
    Registration.once(spark, modes.map(m => s"graft_json_$m"): _*) {
    val reg = spark.sessionState.functionRegistry
    modes.foreach { m =>
      reg.createOrReplaceTempFunction(
        s"graft_json_$m", exprs => JsonMutateExpr(exprs, m), "built-in")
    }
  }
}
