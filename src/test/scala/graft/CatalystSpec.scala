package graft

import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.functions.{VectorFunctions => VF}

/** Custom Catalyst pieces installed via GraftExtensions: the codegen'd
  * cosine_sim expression and the epsilon-equality pushdown rule.
  */
class CatalystSpec extends SparkTestBase {

  test("cosine_sim is bit-identical to the declarative zip_with form") {
    val e = Catalog(spark, sf).table("embeddings")
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_e"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_e"))
    val pairs = a.crossJoin(b).filter(col("a_id") < col("b_id")).limit(2000)
    val diff = pairs
      .select(
        VF.cosineFast(col("a_e"), col("b_e")).as("fast"),
        VF.cosine(col("a_e"), col("b_e")).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(diff == 0L)
  }

  test("cosine_sim survives whole-stage codegen (no fallback)") {
    val e = Catalog(spark, sf).table("embeddings")
    val df = e.select(VF.cosineFast(col("embedding"), col("embedding")).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [cosine_sim"), plan)
    val self = df.filter(col("c") > 0.999999).count()
    assert(self == e.count(), "self-cosine must be ~1 for every row")
  }

  test("approxEqual(abs form) is rewritten to a pushdown-friendly range") {
    val li = Catalog(spark, sf).table("lineitem")
    val df = li.filter(VF.approxEqual(col("l_quantity"), lit(25.0), 0.5))
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") &&
      scan.contains("GreaterThan(l_quantity,24.5)") &&
      scan.contains("LessThan(l_quantity,25.5)"), scan)
    // semantics unchanged vs the un-rewritten predicate evaluated manually
    val expected = li.filter(col("l_quantity") > 24.5 && col("l_quantity") < 25.5).count()
    assert(df.count() == expected && expected > 0)
  }
}
