package graft

import graft.functions.{DotProduct, L2Norm, MinHashAgg, Shingles, SimHashAgg, SrpBuckets}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Session extension registering graft's native expressions as SQL
  * functions (`graft_dot`, `graft_norm`). Install either declaratively
  * (`spark.sql.extensions=graft.GraftExtensions`) or programmatically
  * via [[GraftExtensions.register]] — operators call the latter
  * idempotently, so a plain SparkSession works too.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args.head, args(1))),
    ("graft_norm",
      new ExpressionInfo(classOf[L2Norm].getName, "graft_norm"),
      (args: Seq[Expression]) => L2Norm(args.head)),
    ("graft_shingles",
      new ExpressionInfo(classOf[Shingles].getName, "graft_shingles"),
      (args: Seq[Expression]) => args(1) match {
        case Literal(k: Int, _) => Shingles(args.head, k)
        case other => throw new IllegalArgumentException(
          s"graft_shingles size must be an integer literal, got $other")
      }),
    ("graft_srp_buckets",
      new ExpressionInfo(classOf[SrpBuckets].getName, "graft_srp_buckets"),
      (args: Seq[Expression]) => (args(1), args(2)) match {
        case (Literal(t: Int, _), Literal(b: Int, _)) => SrpBuckets(args.head, t, b)
        case other => throw new IllegalArgumentException(
          s"graft_srp_buckets tables/bits must be integer literals, got $other")
      }),
    ("graft_simhash",
      new ExpressionInfo(classOf[SimHashAgg].getName, "graft_simhash"),
      (args: Seq[Expression]) => SimHashAgg(args.head).toAggregateExpression()),
    ("graft_minhash",
      new ExpressionInfo(classOf[MinHashAgg].getName, "graft_minhash"),
      (args: Seq[Expression]) => args(1) match {
        case Literal(n: Int, _) => MinHashAgg(args.head, n).toAggregateExpression()
        case other => throw new IllegalArgumentException(
          s"graft_minhash size must be an integer literal, got $other")
      }))

  /** Idempotently register the functions on an existing session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (name, info, builder) =>
      val id = FunctionIdentifier(name)
      if (!registry.functionExists(id)) registry.registerFunction(id, info, builder)
    }
  }
}
