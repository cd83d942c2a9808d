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

/** Float-array dot product as a native codegen expression — the cosine's
  * numerator alone, for callers that hoist the norms: cosine recomputes
  * BOTH vector norms per pair, which is 3 multiply-adds per element, but
  * an all-pairs stage (semDedup's in-cluster sweep is O(cluster²) pairs)
  * touches each vector ~cluster times — precomputing `sqrt(dot(v,v))` once
  * per vector and dividing the pair dot by the norm product does the same
  * arithmetic (identical ascending summation order and the identical
  * `sqrt(na)*sqrt(nb)` product, so the result is bit-for-bit the cosine)
  * at 1/3 of the per-pair flops. */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(dot)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double dot = 0.0;
         |for (int i = 0; i < n; i++) {
         |  dot += (double) $a.getFloat(i) * (double) $b.getFloat(i);
         |}
         |${ev.value} = dot;
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

/** All regex matches of a string with their offsets and capture groups, in
  * one pass: `array<struct<match string, idx int, captures array<string>>>`
  * — the MongoDB `$regexFind`/`$regexFindAll` result shape. A native
  * expression because no composition of built-ins yields per-occurrence
  * offsets AND per-group captures without re-running the regex 2+g times;
  * here one `Matcher` walk produces everything. Non-participating groups
  * are null captures entries (Mongo semantics — `regexp_extract` would
  * flatten them to ""). `idx` is the UTF-16 offset, consistent with the
  * JVM regex engine Spark's own regexp functions run on. The pattern is a
  * plan-time literal, compiled once per expression instance. */
case class RegexFindAllExpr(child: Expression, pattern: String) extends UnaryExpression {
  @transient private lazy val compiled = java.util.regex.Pattern.compile(pattern)

  override def dataType: DataType = RegexFindAllExpr.resultType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_regex_find_all"

  override def nullSafeEval(input: Any): Any =
    RegexFindAllExpr.findAll(compiled, input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patRef = ctx.addReferenceObj("graftRegexPattern", compiled,
      classOf[java.util.regex.Pattern].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.exprs.catalyst.RegexFindAllExpr.findAll($patRef, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RegexFindAllExpr {
  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("match", StringType, nullable = false),
    StructField("idx", IntegerType, nullable = false),
    StructField("captures", ArrayType(StringType, containsNull = true), nullable = false))),
    containsNull = false)

  /** Shared by interpreted eval and generated code. */
  def findAll(pattern: java.util.regex.Pattern,
              input: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val s = input.toString
    val m = pattern.matcher(s)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    while (m.find()) {
      val caps = new Array[Any](m.groupCount())
      var g = 0
      while (g < m.groupCount()) {
        val c = m.group(g + 1)
        caps(g) = if (c == null) null
                  else org.apache.spark.unsafe.types.UTF8String.fromString(c)
        g += 1
      }
      out += org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(m.group(0)),
        // MongoDB reports idx in code points, not UTF-16 code units —
        // Matcher.start() alone would diverge on supplementary characters
        s.codePointCount(0, m.start()),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(caps))
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** Session registration for Graft's native functions — makes them usable
  * from both the Column API (via `call_function`) and plain Spark SQL. */
object GraftFunctions {
  val CosineName = "graft_cosine"
  val DotName = "graft_dot"
  val NfcName = "graft_nfc"
  val RegexFindAllName = "graft_regex_find_all"
  val TopKName = "graft_top_k"
  val MightContainName = "graft_bloom_might_contain"
  val HashedShinglesName = "graft_hashed_shingles"
  val MinhashSigName = "graft_minhash_sig"
  val BandKeysName = "graft_band_keys"
  val Jaccard64Name = "graft_jaccard64"
  val Int8DotName = "graft_int8_dot"
  val ClassifierSumName = "graft_classifier_sum"
  val WordGramsName = "graft_word_grams"
  val GramHalvesName = "graft_gram_halves"
  val PositionalGramsName = "graft_positional_grams"
  val SpanCutName = "graft_span_cut"

  /** Literal-int extraction for the registration builders (the graft_top_k
    * pattern: scalar kernel parameters arrive as plan literals). */
  private def litInt(name: String, e: Expression): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case other => throw new graft.model.ExpressionError(
      s"$name expects an int literal parameter, got $other")
  }

  private def litLong(name: String, e: Expression): Long = e match {
    case Literal(l: Long, LongType) => l
    case Literal(i: Int, IntegerType) => i.toLong
    case other => throw new graft.model.ExpressionError(
      s"$name expects a long literal parameter, got $other")
  }

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
      DotName,
      { exprs =>
        require(exprs.length == 2, s"$DotName expects 2 arguments")
        DotProductExpr(
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
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      RegexFindAllName,
      { exprs =>
        require(exprs.length == 2, s"$RegexFindAllName expects 2 arguments")
        val pat = exprs(1) match {
          case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) => s.toString
          case other => throw new graft.model.ExpressionError(
            s"$RegexFindAllName requires a literal string pattern, got $other")
        }
        RegexFindAllExpr(exprs.head.dataType match {
          case StringType => exprs.head
          case _          => Cast(exprs.head, StringType)
        }, pat)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      TopKName,
      { exprs =>
        require(exprs.length == 4, s"$TopKName expects (key, value, k, smallest)")
        val k = exprs(2) match {
          case Literal(i: Int, IntegerType) => i
          case other => throw new graft.model.ExpressionError(
            s"$TopKName k must be an int literal, got $other")
        }
        val smallest = exprs(3) match {
          case Literal(b: Boolean, BooleanType) => b
          case other => throw new graft.model.ExpressionError(
            s"$TopKName smallest must be a boolean literal, got $other")
        }
        BoundedTopKAggregate(exprs.head, exprs(1), k, smallest)
      },
      "built-in")
    // Spark's own codegen'd Bloom probe (not in the public registry):
    // bloom filter as a foldable binary, value as an xxhash64 long.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      MightContainName,
      { exprs =>
        require(exprs.length == 2, s"$MightContainName expects (bloomBinary, longValue)")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs.head, exprs(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      HashedShinglesName,
      { exprs =>
        require(exprs.length == 2, s"$HashedShinglesName expects (text, n)")
        HashedShinglesExpr(exprs.head.dataType match {
          case StringType => exprs.head
          case _          => Cast(exprs.head, StringType)
        }, litInt(HashedShinglesName, exprs(1)))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      MinhashSigName,
      { exprs =>
        require(exprs.length == 3, s"$MinhashSigName expects (hashes, numHashes, seed)")
        MinhashSigExpr(castToLongArray(MinhashSigName, exprs.head),
          litInt(MinhashSigName, exprs(1)), litLong(MinhashSigName, exprs(2)))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      BandKeysName,
      { exprs =>
        require(exprs.length == 3, s"$BandKeysName expects (sig, bands, rowsPerBand)")
        BandKeysExpr(castToLongArray(BandKeysName, exprs.head),
          litInt(BandKeysName, exprs(1)), litInt(BandKeysName, exprs(2)))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Jaccard64Name,
      { exprs =>
        require(exprs.length == 2, s"$Jaccard64Name expects 2 array arguments")
        JaccardSortedExpr(castToLongArray(Jaccard64Name, exprs.head),
          castToLongArray(Jaccard64Name, exprs(1)))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Int8DotName,
      { exprs =>
        require(exprs.length == 2, s"$Int8DotName expects 2 array arguments")
        Int8DotExpr(castToByteArray(Int8DotName, exprs.head),
          castToByteArray(Int8DotName, exprs(1)))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      ClassifierSumName,
      { exprs =>
        require(exprs.length == 2, s"$ClassifierSumName expects (tokens, weightsLiteral)")
        val w = exprs(1) match {
          case Literal(arr: org.apache.spark.sql.catalyst.util.ArrayData,
                       ArrayType(DoubleType, _)) => arr.toDoubleArray()
          case other => throw new graft.model.ExpressionError(
            s"$ClassifierSumName expects a literal double-array weights argument, got $other")
        }
        ClassifierSumExpr(exprs.head, w)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      WordGramsName,
      { exprs =>
        require(exprs.length == 2, s"$WordGramsName expects (tokens, k)")
        WordGramsExpr(exprs.head, litInt(WordGramsName, exprs(1)))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      GramHalvesName,
      { exprs =>
        require(exprs.length == 2, s"$GramHalvesName expects (tokens, n)")
        GramHalvesExpr(exprs.head, litInt(GramHalvesName, exprs(1)))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      PositionalGramsName,
      { exprs =>
        require(exprs.length == 2, s"$PositionalGramsName expects (tokens, n)")
        PositionalGramsExpr(exprs.head, litInt(PositionalGramsName, exprs(1)))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      SpanCutName,
      { exprs =>
        require(exprs.length == 3, s"$SpanCutName expects (tokens, starts, n)")
        SpanCutExpr(exprs.head, exprs(1), litInt(SpanCutName, exprs(2)))
      },
      "built-in")
  }

  private def castToLongArray(name: String, e: Expression): Expression = e.dataType match {
    case ArrayType(LongType, _) => e
    case _: ArrayType           => Cast(e, ArrayType(LongType))
    case other                  => throw new graft.model.ExpressionError(
      s"$name requires an array argument, got $other")
  }

  private def castToByteArray(name: String, e: Expression): Expression = e.dataType match {
    case ArrayType(ByteType, _) => e
    case _: ArrayType           => Cast(e, ArrayType(ByteType))
    case other                  => throw new graft.model.ExpressionError(
      s"$name requires an array argument, got $other")
  }

  private def castToFloatArray(e: Expression): Expression = e.dataType match {
    case ArrayType(FloatType, _) => e
    case _: ArrayType            => Cast(e, ArrayType(FloatType))
    case other                   => throw new graft.model.ExpressionError(
      s"$CosineName requires an array argument, got $other")
  }
}
