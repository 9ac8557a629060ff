package graft.queries

import graft.SparkSpec

/** The session contract must be LOCAL to the engine: running any registry
  * query configures an isolated child session (Registry.contractSession),
  * never the caller's own SparkSession — a library flipping ANSI or the
  * timezone under its host application is spooky action at a distance. */
class RegistrySpec extends SparkSpec {

  test("a caller's ANSI/timezone conf survives a query call") {
    // the caller runs STRICT ANSI in a non-UTC zone — the opposite of the
    // engine contract on both axes
    spark.conf.set("spark.sql.ansi.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Taipei")
    try {
      // one parquet-read query and one fixture-built query (both classes
      // of entry point must isolate)
      assert(Registry.byName("q01_pricing_summary").run(spark, sf0001).count() > 0)
      assert(Registry.byName("q75_line_dedup").run(spark, sf0001).count() > 0)
      assert(spark.conf.get("spark.sql.ansi.enabled") === "true")
      assert(spark.conf.get("spark.sql.session.timeZone") === "Asia/Taipei")
    } finally {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      spark.conf.set("spark.sql.session.timeZone", "UTC")
    }
  }

  test("contract session is memoized and self-idempotent") {
    val c1 = Registry.contractSession(spark)
    val c2 = Registry.contractSession(spark)
    assert(c1 eq c2)
    assert(Registry.contractSession(c1) eq c1)
    assert(!(c1 eq spark))
    // the engine semantics hold on the child regardless of the caller
    assert(c1.conf.get("spark.sql.ansi.enabled") === "false")
    assert(c1.conf.get("spark.sql.session.timeZone") === "UTC")
    // the operational knob the caller owns carried over
    assert(c1.conf.get("spark.sql.shuffle.partitions") ===
      spark.conf.get("spark.sql.shuffle.partitions"))
  }

  test("query run under a strict-ANSI caller still yields contract semantics") {
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      // q17 exercises coerce-to-NULL numeric casts and ÷0 repair — under
      // ANSI it would throw; under the contract session it must return rows
      val df = Registry.byName("q17_unit_repair").run(spark, sf0001)
      assert(df.count() > 0)
    } finally spark.conf.set("spark.sql.ansi.enabled", "false")
  }
}
