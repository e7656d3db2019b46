package graft.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registrations for graft's native expressions, injected through
  * `SparkSessionExtensions` by [[graft.GraftSession]] — the same functions
  * the Column API exposes become first-class in `spark.sql`.
  */
object GraftFunctions {

  type Registration =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftFunctions.type].getName, null, name, usage, "")

  val registrations: Seq[Registration] = Seq(
    (
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - ordered-fold dot product of two array<double>"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot takes exactly 2 arguments")
        DotProduct(args(0), args(1))
      }),
    (
      FunctionIdentifier("graft_md5long60"),
      info("graft_md5long60", "graft_md5long60(s) - top 60 bits of md5(s) as bigint"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_md5long60 takes exactly 1 argument")
        Md5Long60(args(0))
      }),
    (
      FunctionIdentifier("graft_shingle_hashes"),
      info(
        "graft_shingle_hashes",
        "graft_shingle_hashes(th, k) - all k-window combine hashes of an array<bigint>"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_shingle_hashes takes exactly 2 arguments")
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other =>
            throw new IllegalArgumentException(
              s"graft_shingle_hashes: k must be an integer literal, got $other")
        }
        ShingleHashes(args(0), k)
      }),
    (
      FunctionIdentifier("graft_simhash32"),
      info(
        "graft_simhash32",
        "graft_simhash32(hashes) - 32-bit majority SimHash of an array<bigint>"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_simhash32 takes exactly 1 argument")
        SimHash32(args(0))
      }))
}
