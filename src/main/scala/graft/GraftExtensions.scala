package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression

import graft.functions._

/** SQL surface for the engine's custom expressions: `roc_date`,
  * `simhash32`/`simhash64`, `minhash_hex`, `shingle_hashes`, `hyperplane_sig`,
  * `dot_f`, `norm_f`, `sorted_intersect_count`, `winnow_fingerprints`
  * become callable from `spark.sql(...)`.
  *
  * Two wirings:
  *  - `GraftExtensions` for session construction
  *    (`SparkSession.builder().withExtensions(new GraftExtensions)` or
  *    `spark.sql.extensions=graft.GraftExtensions`);
  *  - `GraftFunctions.register(spark)` for an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftFunctions.defs
  override def apply(e: SparkSessionExtensions): Unit = {
    defs.foreach { case (name, builder) =>
      e.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
            "graft", name),
          (args: Seq[Expression]) => builder(args)))
    }
    // committed-table SQL surface (GraftCatalog): native-scan read
    // substitution + DELETE/UPDATE/MERGE/INSERT routing, and the
    // manifest-fed COUNT(*) collapse
    e.injectResolutionRule(session => graft.sql.GraftAnalysis(session))
    e.injectOptimizerRule(session => graft.sql.GraftMetadataAgg(session))
    // table-valued CDF surface: SELECT * FROM graft_changes('/wh/t', 2[, 5])
    e.injectTableFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_changes"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft", "graft_changes"),
        (args: Seq[Expression]) => graft.sql.GraftTableFunctions.changes(args)))
    // per-partition manifest introspection: files/bytes/rows/MoR state
    e.injectTableFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_partitions"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft", "graft_partitions"),
        (args: Seq[Expression]) =>
          graft.sql.GraftTableFunctions.partitions(args)))
    // retained-generation history as a composable relation
    e.injectTableFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_history"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft", "graft_history"),
        (args: Seq[Expression]) =>
          graft.sql.GraftTableFunctions.history(args)))
  }
}

object GraftFunctions {

  private def intLit(e: Expression): Int =
    e.eval(null).asInstanceOf[Number].intValue()

  private def arity(name: String, n: Int)(
      f: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      require(args.length == n,
        s"$name expects $n argument(s), got ${args.length}")
      f(args)
    }

  val defs: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "roc_date" -> arity("roc_date", 1)(args => RocDate(args.head)),
    "simhash32" -> arity("simhash32", 1)(args => SimHashExpr(args.head, 32)),
    "simhash64" -> arity("simhash64", 1)(args => SimHashExpr(args.head, 64)),
    "minhash_hex" -> arity("minhash_hex", 3)(args =>
      MinHashHexExpr(args.head, intLit(args(1)), intLit(args(2)))),
    "shingle_hashes" -> arity("shingle_hashes", 2)(args =>
      ShingleHashesExpr(args.head, intLit(args(1)))),
    "hyperplane_sig" -> arity("hyperplane_sig", 3)(args =>
      HyperplaneSigExpr(args.head, intLit(args(1)), intLit(args(2)))),
    "dot_f" -> arity("dot_f", 2)(args => DotProductF(args.head, args(1))),
    "norm_f" -> arity("norm_f", 1)(args => NormL2F(args.head)),
    "sorted_intersect_count" -> arity("sorted_intersect_count", 2)(args =>
      SortedIntersectCount(args.head, args(1))),
    "winnow_fingerprints" -> arity("winnow_fingerprints", 3)(args =>
      WinnowFingerprintsExpr(args.head, intLit(args(1)), intLit(args(2)))))

  /** Register all engine functions on an already-built session. */
  def register(spark: SparkSession): Unit = {
    defs.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_changes",
      (args: Seq[Expression]) => graft.sql.GraftTableFunctions.changes(args),
      "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_partitions",
      (args: Seq[Expression]) => graft.sql.GraftTableFunctions.partitions(args),
      "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_history",
      (args: Seq[Expression]) => graft.sql.GraftTableFunctions.history(args),
      "scala_udf")
  }
}
