package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{DotProduct, L2Norm, NfcClean, Shingles}

/** Engine extension point (SURVEY.md §4.2): registers graft's native
  * expressions with the session so they are callable from SQL
  * (`SELECT graft_dot(a.embedding, b.embedding) ...`) as well as from
  * the Column API.
  *
  * Two wirings:
  *  - session owned by us: `SparkSession.builder().withExtensions(new
  *    GraftExtensions)` — custom optimizer rules / strategies would be
  *    injected here too;
  *  - session owned by a host (the round driver hands us its session):
  *    [[GraftExtensions.register]] adds the functions to the live
  *    session's registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    // arity validated with a usage message (round-15 review: args(i)
    // on a wrong-arity SQL call threw a bare IndexOutOfBoundsException
    // that never named the function)
    (new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => DotProduct(a, b)
        case _ => throw new IllegalArgumentException(
          s"graft_dot(a, b) expects two array columns, got ${args.size} argument(s)")
      }),
    (new FunctionIdentifier("graft_l2norm"),
      new ExpressionInfo(classOf[L2Norm].getName, "graft_l2norm"),
      (args: Seq[Expression]) => args match {
        case Seq(a) => L2Norm(a)
        case _ => throw new IllegalArgumentException(
          s"graft_l2norm(a) expects one array column, got ${args.size} argument(s)")
      }),
    (new FunctionIdentifier("graft_nfc_clean"),
      new ExpressionInfo(classOf[NfcClean].getName, "graft_nfc_clean"),
      (args: Seq[Expression]) => args match {
        case Seq(a) => NfcClean(a)
        case _ => throw new IllegalArgumentException(
          s"graft_nfc_clean(text) expects one string column, got ${args.size} argument(s)")
      }),
    (new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "graft_shingles"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => Shingles(c, 3)
        case Seq(c, Literal(n: Int, IntegerType)) => Shingles(c, n)
        case _ => throw new IllegalArgumentException(
          "graft_shingles(text[, n]) expects a string column and an optional int literal")
      }),
  )

  /** Imperative registration into an already-running session. */
  def register(s: SparkSession): Unit = functions.foreach { case (id, info, builder) =>
    s.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
