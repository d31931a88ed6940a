package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for text shingling — the corpus
  * featurize hot path.
  *
  * The JVM `udf` form (the previous implementation) already beat the
  * interpreted higher-order-function pipeline ~10x, but a udf still
  * pays the Catalyst converter round-trip per row: UTF8String → String
  * → Array[String] → CatalystConverter → ArrayData, plus the
  * row-encoder wrapper, all OUTSIDE whole-stage codegen. This
  * expression's generated code calls [[ShingleKernel]] directly inside
  * the codegen'd projection: one UTF8String in, one ArrayData out,
  * zero converter machinery. Semantics are pinned EXACTLY equal to the
  * udf and HOF forms by DedupSpec (lowercase, trim, \s+ split,
  * first-occurrence-order distinct, <n tokens → empty, null → null).
  */
object TextExprs {

  def shingles(text: Column, n: Int = 3): Column =
    GraftColumnBridge.column(Shingles(GraftColumnBridge.expression(text), n))

  def bigramTally(tokens: Column): Column =
    GraftColumnBridge.column(BigramTally(GraftColumnBridge.expression(tokens)))

  def nfcClean(text: Column): Column =
    GraftColumnBridge.column(NfcClean(GraftColumnBridge.expression(text)))
}

/** Unicode hygiene kernel — shared by interpreted eval and generated
  * code, so it must stay a static, stateless function. NFC-normalize
  * (canonical composition, `java.text.Normalizer` — the JDK's ICU
  * implementation of UAX #15), then strip the control characters that
  * have no business in training text: C0 except tab/newline, DEL, and
  * C1 — the byte ranges [\x00-\x08\x0B-\x1F\x7F-\x9F]. The strip runs
  * AFTER normalization so a control char can never block a canonical
  * recombination. NFC is engine-portable: DuckDB's `nfc_normalize`
  * (utf8proc) implements the same standard, so
  * `regexp_replace(nfc_normalize(t), '[...]', '', 'g')` is an exact
  * cross-engine oracle. */
object NfcCleanKernel {
  def clean(s: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFC)
    val n = nfc.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val ch = nfc.charAt(i)
      val drop = (ch < 0x20 && ch != '\n' && ch != '\t') ||
        (ch >= 0x7F && ch <= 0x9F)
      if (!drop) sb.append(ch)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Codegen'd Unicode NFC + control-strip (see [[NfcCleanKernel]]) —
  * the first pass of any text-cleaning pipeline, kept inside
  * whole-stage codegen like the shingle featurizer. */
case class NfcClean(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_nfc_clean"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    NfcCleanKernel.clean(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcCleanKernel.clean($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared by interpreted eval and generated code — the generated call
  * is `ShingleKernel.shingles(<utf8string>, <n>)`, so the kernel must
  * stay a static, stateless function. */
object ShingleKernel {
  def shingles(s: UTF8String, n: Int): ArrayData = {
    // Locale.ROOT (round 16): default-locale lowercasing makes the
    // shingle vocabulary host-dependent (Turkish 'I' -> dotless 'ı'),
    // which breaks the engine-portable bit-exact signature property
    // (DuckDB's lower() is non-tailored Unicode) AND cross-executor
    // determinism on a cluster with mixed default locales
    val toks = s.toString.toLowerCase(java.util.Locale.ROOT).trim.split("\\s+")
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      // LinkedHashSet = first-occurrence-order distinct, matching
      // Array.distinct in the reference udf formulation
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i + n <= toks.length) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size())
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    }
  }
}

/** Bigram tally kernel: total and distinct adjacent-pair counts over a
  * token array, without ever materializing the gram strings as column
  * data — only the two ints leave the scan. Static and stateless so the
  * generated projection can call it directly. */
object BigramTallyKernel {
  def tally(toks: ArrayData): InternalRow = {
    val n = toks.numElements()
    if (n < 2) new GenericInternalRow(Array[Any](0, 0))
    else {
      // distinct over "a b" joined grams, matching the udf pin's
      // sliding(2).mkString(" ") semantics exactly — including null
      // array elements, which mkString renders as the literal "null"
      // (the declared input type allows containsNull=true, so the
      // kernel must not NPE where the udf didn't)
      def tok(i: Int): String = {
        val s = toks.getUTF8String(i)
        if (s == null) "null" else s.toString
      }
      val seen = new java.util.HashSet[String]()
      var i = 0
      while (i + 2 <= n) {
        seen.add(tok(i) + " " + tok(i + 1))
        i += 1
      }
      new GenericInternalRow(Array[Any](n - 1, seen.size()))
    }
  }
}

/** Native codegen form of the bigram tally (the one remaining hot-path
  * udf after Shingles went native): same UnaryExpression shape, same
  * kernel-call codegen, semantics pinned equal to the udf formulation
  * in DedupSpec. Null token array (null document) → null, which the
  * caller's `n_bg > 0` filter drops exactly like the udf's (0, 0). */
case class BigramTally(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_bg", IntegerType, nullable = false),
    StructField("n_bg_d", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bigram_tally"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    BigramTallyKernel.tally(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BigramTallyKernel.tally($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class Shingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    ShingleKernel.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleKernel.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
