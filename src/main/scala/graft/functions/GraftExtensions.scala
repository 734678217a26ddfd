package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** `SparkSessionExtensions` entry point (SURVEY §7.3): registers the
  * library's custom Catalyst expressions as SQL functions, so a pure-SQL
  * consumer gets the same codegen'd hot paths the DataFrame API uses:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  * SELECT doc_id FROM emb WHERE graft_dot(a, b) > 0.9
  * }}}
  *
  * Besides the functions, `injectOptimizerRule` adds the library's two
  * plan rewrites: [[graft.plans.RangeJoinRewrite]] (naive
  * point-in-interval theta joins — nested-loop at scale — become the
  * bucketed equi-join automatically) and
  * [[graft.plans.SaltedJoinRewrite]] (equi-joins on a column with a
  * REGISTERED skew profile become the salted join; off unless a
  * profile is registered). Everything else stays a
  * stock Catalyst plan, which is the point: the optimizer surface
  * remains Spark's own (predicate pushdown, AQE, codegen all apply
  * unmodified). Integer arguments to the dedup signatures arrive as SQL
  * literals and are folded at registration (non-literal counts are
  * rejected at analysis time, not runtime).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "misc_funcs", "", "", "internal")

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: count argument must be an INT literal, got $other")
  }

  /** Analysis-time arity gate: a wrong argument count gets a message
    * naming the expected signature instead of an
    * IndexOutOfBoundsException from the builder body. */
  private def arity(fn: String, usage: String, n: Int)(
      args: Seq[Expression]): Seq[Expression] = {
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n argument(s) — $usage — got ${args.length}")
    args
  }

  private def fns: Seq[(String, String, FunctionBuilder)] = {
    val dotU = "graft_dot(a, b) - dot product of two double arrays"
    val l2U = "graft_l2norm(a) - L2 norm of a double array"
    val mhU = "graft_minhash_sig(bases, k) - k-permutation MinHash signature"
    val shU = "graft_simhash_bits(digests, bits) - SimHash bit string"
    val dlU = "graft_dl(a, b) - unrestricted Damerau-Levenshtein distance"
    Seq(
      ("graft_dl", dlU, (args: Seq[Expression]) => {
        val a = arity("graft_dl", dlU, 2)(args)
        DamerauLevenshtein(a(0), a(1))
      }),
      ("graft_dot", dotU, (args: Seq[Expression]) => {
        val a = arity("graft_dot", dotU, 2)(args); DotProduct(a(0), a(1))
      }),
      ("graft_l2norm", l2U, (args: Seq[Expression]) =>
        L2Norm(arity("graft_l2norm", l2U, 1)(args).head)),
      ("graft_minhash_sig", mhU, (args: Seq[Expression]) => {
        val a = arity("graft_minhash_sig", mhU, 2)(args)
        MinHashSig(a(0), intLit(a(1), "graft_minhash_sig"))
      }),
      ("graft_simhash_bits", shU, (args: Seq[Expression]) => {
        val a = arity("graft_simhash_bits", shU, 2)(args)
        SimHashBits(a(0), intLit(a(1), "graft_simhash_bits"))
      }))
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    fns.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    // off by default — fires only where a skew profile was registered
    // (spark.graft.saltedJoin.*; X318)
    ext.injectOptimizerRule(_ => graft.plans.SaltedJoinRewrite)
  }
}
