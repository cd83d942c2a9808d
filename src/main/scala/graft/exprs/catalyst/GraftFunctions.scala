package graft.exprs.catalyst

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity over `array<float>`
  * embeddings.
  *
  * This is the codegen tier of the extension preference order (compose
  * built-ins → native `Expression` → UDF → mapPartitions): unlike the
  * ScalaUDF kernel it participates in whole-stage codegen with no
  * row-boxing and no Scala-collection conversion per row — the generated
  * Java is the same tight loop a hand-written engine would run. The
  * accumulation order (sequential fold) matches `Kernels.cosineKernel` and
  * the declarative `Similarity.cosine`, so all three produce bit-identical
  * doubles.
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  // Input typing is enforced by GraftFunctions.register, which casts both
  // arguments to array<float> (AbstractDataType/ExpectsInputTypes is
  // private[sql], so the declarative input-type route is unavailable to
  // external expressions).
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d > 0) java.lang.Double.valueOf(dot / d) else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double dot = 0.0, na = 0.0, nb = 0.0;
         |for (int i = 0; i < n; i++) {
         |  double x = (double) $a.getFloat(i);
         |  double y = (double) $b.getFloat(i);
         |  dot += x * y; na += x * x; nb += y * y;
         |}
         |double d = java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb);
         |if (d > 0) { ${ev.value} = dot / d; } else { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Unicode NFC normalization as a native codegen expression.
  *
  * Spark has no built-in Unicode normalizer, and a corpus scrubbed for
  * training MUST canonicalize before any hash-based dedup — "café" composed
  * and decomposed are different byte strings with identical rendering, so
  * unnormalized text defeats exact dedup, fingerprinting and n-gram
  * matching. `java.text.Normalizer` is the JDK's ICU-derived implementation;
  * the generated code calls it directly with no row boxing, keeping the
  * normalize inside whole-stage codegen like any built-in string function.
  * (DuckDB's `nfc_normalize` is the independent oracle.)
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Session registration for Graft's native functions — makes them usable
  * from both the Column API (via `call_function`) and plain Spark SQL. */
object GraftFunctions {
  val CosineName = "graft_cosine"
  val NfcName = "graft_nfc"

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      CosineName,
      { exprs =>
        require(exprs.length == 2, s"$CosineName expects 2 arguments")
        CosineSimilarityExpr(
          castToFloatArray(exprs.head), castToFloatArray(exprs(1)))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      NfcName,
      { exprs =>
        require(exprs.length == 1, s"$NfcName expects 1 argument")
        NfcNormalizeExpr(exprs.head.dataType match {
          case StringType => exprs.head
          case _          => Cast(exprs.head, StringType)
        })
      },
      "built-in")
  }

  private def castToFloatArray(e: Expression): Expression = e.dataType match {
    case ArrayType(FloatType, _) => e
    case _: ArrayType            => Cast(e, ArrayType(FloatType))
    case other                   => throw new graft.model.ExpressionError(
      s"$CosineName requires an array argument, got $other")
  }
}
