package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding hot path.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) is interpreted, not
  * codegen'd, and allocates a zipped intermediate array per row — per
  * PAIR in a similarity self-join. These expressions generate a tight
  * primitive loop over the two `ArrayData` (whole-stage codegen, zero
  * allocation), with bit-identical results: the same left-to-right
  * double accumulation order as the fold they replace.
  *
  * Null semantics match the HOF versions: null input → null; mismatched
  * lengths → null (zip_with pads with null, which poisons the sum);
  * a null ELEMENT → null (the lambda product/square is null, which
  * poisons the aggregate fold). The element check is emitted only when
  * the static schema says `containsNull` — arrays declared null-free
  * keep the branch-free tight loop.
  */
object VectorExprs {

  private[graft] def elemOf(dt: DataType): DataType = dt match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  private[graft] def checkVec(name: String, dts: DataType*): TypeCheckResult = {
    val ok = dts.forall {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    } && dts.map(elemOf).distinct.size == 1
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires two array<float> or two array<double> arguments, got ${dts.mkString(", ")}")
  }

  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def l2norm(a: Column): Column =
    GraftColumnBridge.column(L2Norm(GraftColumnBridge.expression(a)))

  /** All SRP band keys of a vector in ONE expression. `planes` is
    * indexed `planes(band * bits + j)(d)`. Composing this from
    * bands*bits separate [[dot]] calls generates a whole-stage-codegen
    * method far past HotSpot's huge-method compile limit (8 KB
    * bytecode), which silently runs as INTERPRETED bytecode — ~100x.
    * One expression with a data-driven loop over a referenced plane
    * matrix stays small and JIT-compiles. */
  def srpBandKeys(vec: Column, planes: Array[Array[Double]], bits: Int,
                  bands: Int): Column =
    GraftColumnBridge.column(SrpBandKeys(
      GraftColumnBridge.expression(vec), planes.flatten, bits, bands))

  /** Asymmetric-distance (ADC) score of a product-quantized code
    * against a per-query lookup table: Σ_s lut[s*ksub + codes[s]].
    * The PQ query hot path — runs once per (query, corpus-code) pair,
    * so it must stay inside whole-stage codegen like [[dot]]. */
  def pqAdc(codes: Column, lut: Column, ksub: Int): Column =
    GraftColumnBridge.column(PqAdcScore(
      GraftColumnBridge.expression(codes), GraftColumnBridge.expression(lut), ksub))

  /** L2-normalize in ONE expression (optimization round 21). The
    * `transform(vec, x => x / l2norm(vec))` formulation it replaces
    * embedded the norm subtree INSIDE the lambda, and higher-order
    * lambdas get no common-subexpression elimination — Catalyst
    * re-evaluated the entire child expression (the norm, and with it
    * any UDF the column was computed by, e.g. the OPQ rotation) once
    * PER ELEMENT: O(d²) interpreted work on plain columns, ~d UDF
    * invocations per row when composed over one (measured ~1 ms/row on
    * the 64-d corpus — the dominant cost of every vector-family key).
    * Here the child evaluates once, the norm once, one divide pass —
    * bit-identical values (same left-to-right double accumulation,
    * same per-element `toDouble / norm`), same null semantics (null
    * input, null element, or zero norm → null array). */
  def normalize(vec: Column): Column =
    GraftColumnBridge.column(L2Normalize(GraftColumnBridge.expression(vec)))
}

/** Sequential-order dot product of two equal-typed float/double
  * arrays, accumulated in double. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.checkVec(prettyName, left.dataType, right.dataType)

  private def isFloat = VectorExprs.elemOf(left.dataType) == FloatType

  private def elemsNullable: Boolean = (left.dataType, right.dataType) match {
    case (ArrayType(_, ln), ArrayType(_, rn)) => ln || rn
    case _ => true
  }

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val checkNulls = elemsNullable
    var s = 0.0
    var i = 0
    if (isFloat) while (i < n) {
      if (checkNulls && (a.isNullAt(i) || b.isNullAt(i))) return null
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1
    }
    else while (i < n) {
      if (checkNulls && (a.isNullAt(i) || b.isNullAt(i))) return null
      s += a.getDouble(i) * b.getDouble(i); i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lg = left.genCode(ctx)
    val rg = right.genCode(ctx)
    val get = if (isFloat) "getFloat" else "getDouble"
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val s = ctx.freshName("s")
    val anyNull = ctx.freshName("anyNull")
    // only arrays whose schema admits null elements pay the per-element
    // branch; null-free arrays keep the branch-free loop
    val nullCheck =
      if (elemsNullable)
        s"if (${lg.value}.isNullAt($i) || ${rg.value}.isNullAt($i)) { $anyNull = true; break; }"
      else ""
    ev.copy(code =
      code"""
        ${lg.code}
        ${rg.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${lg.isNull} && !${rg.isNull}) {
          int $n = ${lg.value}.numElements();
          if ($n == ${rg.value}.numElements()) {
            double $s = 0.0;
            boolean $anyNull = false;
            for (int $i = 0; $i < $n; $i++) {
              $nullCheck
              $s += (double) ${lg.value}.$get($i) * (double) ${rg.value}.$get($i);
            }
            if (!$anyNull) {
              ${ev.isNull} = false;
              ${ev.value} = $s;
            }
          }
        }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sequential-order euclidean norm: sqrt of the in-order sum of
  * squares, accumulated in double. */
case class L2Norm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_l2norm"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.checkVec(prettyName, child.dataType, child.dataType)

  private def isFloat = VectorExprs.elemOf(child.dataType) == FloatType

  private def elemsNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val checkNulls = elemsNullable
    var s = 0.0
    var i = 0
    if (isFloat) while (i < n) {
      if (checkNulls && a.isNullAt(i)) return null
      val v = a.getFloat(i).toDouble; s += v * v; i += 1
    }
    else while (i < n) {
      if (checkNulls && a.isNullAt(i)) return null
      val v = a.getDouble(i); s += v * v; i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      val anyNull = ctx.freshName("anyNull")
      val nullCheck =
        if (elemsNullable) s"if ($c.isNullAt($i)) { $anyNull = true; break; }"
        else ""
      s"""
        int $n = $c.numElements();
        double $s = 0.0;
        boolean $anyNull = false;
        for (int $i = 0; $i < $n; $i++) {
          $nullCheck
          double $v = (double) $c.$get($i);
          $s += $v * $v;
        }
        if ($anyNull) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = java.lang.Math.sqrt($s);
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Product-quantization asymmetric-distance score (ADC, Jégou et al.,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011):
  * `codes` is the corpus row's m-byte PQ code (BinaryType, one unsigned
  * byte per subspace), `lut` the query's flattened m×ksub inner-product
  * lookup table (`lut[s*ksub + c] = dot(q_s, codebook_s[c])`), and the
  * score Σ_s lut[s*ksub + (codes[s] & 0xFF)] approximates dot(q, v)
  * reading only m bytes of corpus data — the compressed-domain scan
  * that makes a 100 TB corpus ADC-searchable at ~1/32 the bytes.
  *
  * Null semantics: null codes or null lut → null; a lut sized
  * differently from codes.length*ksub (a codebook/codes mismatch) →
  * null, poisoning the rank step rather than mis-scoring. lut is an
  * ArrayType(Double, containsNull=false) produced by the LUT builder,
  * so no per-element null branch is emitted. */
case class PqAdcScore(left: Expression, right: Expression, ksub: Int)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_adc"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, ArrayType(DoubleType, false)) if ksub >= 1 && ksub <= 256 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary codes, array<double> lut not null) and ksub in [1,256], " +
        s"got (${left.dataType}, ${right.dataType}) ksub=$ksub")
  }

  override def nullSafeEval(codesAny: Any, lutAny: Any): Any = {
    val codes = codesAny.asInstanceOf[Array[Byte]]
    val lut = lutAny.asInstanceOf[ArrayData]
    if (lut.numElements() != codes.length * ksub) return null
    var s = 0.0
    var i = 0
    while (i < codes.length) {
      val c = codes(i) & 0xFF
      // a code byte >= ksub (corrupt/foreign code column when
      // ksub < 256) would index another subspace's LUT region — or
      // past the lut entirely, which UnsafeArrayData does NOT bounds
      // check — so poison to null like the size-mismatch case
      if (c >= ksub) return null
      s += lut.getDouble(i * ksub + c)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      s"""
        int $m = $codes.length;
        if ($lut.numElements() != $m * $ksub) {
          ${ev.isNull} = true;
        } else {
          double $s = 0.0;
          for (int $i = 0; $i < $m; $i++) {
            int $c = $codes[$i] & 0xFF;
            if ($c >= $ksub) { ${ev.isNull} = true; break; }
            $s += $lut.getDouble($i * $ksub + $c);
          }
          if (!${ev.isNull}) {
            ${ev.value} = $s;
          }
        }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Whole-array L2 normalization: out[i] = v[i] / sqrt(Σ v[j]²), norm
  * accumulated left-to-right in double exactly like [[L2Norm]]. Null
  * input → null; a null ELEMENT → null; zero norm → null (so zero
  * vectors never rank — the callers' isNotNull-guard contract). The
  * static type matches the transform() formulation this replaces
  * (ArrayType(Double, containsNull = true)); produced arrays never
  * actually hold null elements. */
case class L2Normalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_l2normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.checkVec(prettyName, child.dataType, child.dataType)

  private def isFloat = VectorExprs.elemOf(child.dataType) == FloatType

  private def elemsNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val checkNulls = elemsNullable
    var s = 0.0
    var i = 0
    if (isFloat) while (i < n) {
      if (checkNulls && a.isNullAt(i)) return null
      val v = a.getFloat(i).toDouble; s += v * v; i += 1
    }
    else while (i < n) {
      if (checkNulls && a.isNullAt(i)) return null
      val v = a.getDouble(i); s += v * v; i += 1
    }
    val norm = math.sqrt(s)
    if (norm == 0.0) return null
    val out = new Array[Double](n)
    i = 0
    if (isFloat) while (i < n) { out(i) = a.getFloat(i).toDouble / norm; i += 1 }
    else while (i < n) { out(i) = a.getDouble(i) / norm; i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      val norm = ctx.freshName("norm")
      val out = ctx.freshName("out")
      val bad = ctx.freshName("bad")
      val nullCheck =
        if (elemsNullable) s"if ($c.isNullAt($i)) { $bad = true; break; }"
        else ""
      s"""
        int $n = $c.numElements();
        double $s = 0.0;
        boolean $bad = false;
        for (int $i = 0; $i < $n; $i++) {
          $nullCheck
          double $v = (double) $c.$get($i);
          $s += $v * $v;
        }
        double $norm = java.lang.Math.sqrt($s);
        if ($bad || $norm == 0.0) {
          ${ev.isNull} = true;
        } else {
          double[] $out = new double[$n];
          for (int $i = 0; $i < $n; $i++) {
            $out[$i] = (double) $c.$get($i) / $norm;
          }
          ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Banded sign-random-projection signature: for each band b,
  * key(b) = Σ_j [dot(planes(b*bits+j), v) > 0] << j. `planes` is the
  * flattened (bands*bits) x dim hyperplane matrix (row-major). Null
  * input, a null element, or a dim mismatch with the plane matrix →
  * null (poison semantics, matching [[DotProduct]]). */
case class SrpBandKeys(child: Expression, planes: Array[Double], bits: Int,
                       bands: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_srp_band_keys"

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.checkVec(prettyName, child.dataType, child.dataType)

  private def isFloat = VectorExprs.elemOf(child.dataType) == FloatType

  private def elemsNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n * bands * bits != planes.length) return null
    if (elemsNullable) {
      var i = 0
      while (i < n) { if (v.isNullAt(i)) return null; i += 1 }
    }
    val keys = new Array[Int](bands)
    var p = 0
    var b = 0
    while (b < bands) {
      var key = 0
      var j = 0
      while (j < bits) {
        var s = 0.0
        var d = 0
        if (isFloat) while (d < n) { s += planes(p + d) * v.getFloat(d); d += 1 }
        else while (d < n) { s += planes(p + d) * v.getDouble(d); d += 1 }
        p += n
        if (s > 0) key |= (1 << j)
        j += 1
      }
      keys(b) = key
      b += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    val planesRef = ctx.addReferenceObj("srpPlanes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val keys = ctx.freshName("keys")
      val p = ctx.freshName("p")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val key = ctx.freshName("key")
      val bad = ctx.freshName("bad")
      val i = ctx.freshName("i")
      val nullElemCheck =
        if (elemsNullable)
          s"for (int $i = 0; $i < $n && !$bad; $i++) { if ($c.isNullAt($i)) $bad = true; }"
        else ""
      s"""
        int $n = $c.numElements();
        boolean $bad = ($n * $bands * $bits != $planesRef.length);
        $nullElemCheck
        if ($bad) {
          ${ev.isNull} = true;
        } else {
          int[] $keys = new int[$bands];
          int $p = 0;
          for (int $b = 0; $b < $bands; $b++) {
            int $key = 0;
            for (int $j = 0; $j < $bits; $j++) {
              double $s = 0.0;
              for (int $d = 0; $d < $n; $d++) {
                $s += $planesRef[$p + $d] * (double) $c.$get($d);
              }
              $p += $n;
              if ($s > 0) $key |= (1 << $j);
            }
            $keys[$b] = $key;
          }
          ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($keys);
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
