package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.catalog.Catalog
import graft.conditions.Condition
import graft.conditions.Condition._
import graft.conditions.Operand

/** Golden tests translated 1:1 from the reference's normalizer suite
  * (reference: src/query/condition.rs:139-383 — same inputs, same
  * expected strings), plus a ScalaCheck equivalence property the
  * reference lacks, plus end-to-end compilation to a Spark filter.
  */
class ConditionSpec extends SparkTestBase {

  private val a = c("a"); private val b = c("b")
  private val cc = c("c"); private val d = c("d")
  private val f = c("f"); private val g = c("g")

  test("not_equal (condition.rs:141-159)") {
    val cond = And(Seq(a !== b))
    assert(cond.toString == "a != b")
    assert(cond.normalize.toString == "NOT (a == b)")
  }

  test("double_negation (condition.rs:161-179)") {
    val cond = Not(Not(truthy("a")))
    assert(cond.toString == "NOT (NOT (a))")
    assert(cond.normalize.toString == "a")
  }

  test("or_demorgan (condition.rs:181-200)") {
    val cond = Not(Or(Seq(truthy("a"), truthy("b"), truthy("c"))))
    assert(cond.toString == "NOT (a OR b OR c)")
    assert(cond.normalize.toString == "NOT (a) AND NOT (b) AND NOT (c)")
  }

  test("and_demorgan (condition.rs:202-221)") {
    val cond = Not(And(Seq(truthy("a"), truthy("b"), truthy("c"))))
    assert(cond.toString == "NOT (a AND b AND c)")
    assert(cond.normalize.toString == "NOT (a) OR NOT (b) OR NOT (c)")
  }

  test("and stays and (condition.rs:223-250)") {
    val cond = And(Seq(a === b, cc < d))
    assert(cond.toString == "a == b AND c < d")
    assert(cond.normalize.toString == "a == b AND c < d")
  }

  test("or_and: comparator canonicalization inside (condition.rs:252-291)") {
    val cond = And(Seq(a === b, Or(Seq(cc < d, f > g))))
    assert(cond.toString == "(c < d OR f > g) AND a == b")
    assert(cond.normalize.toString == "(c < d OR g < f) AND a == b")
  }

  test("and_or: CNF distribution (condition.rs:293-332)") {
    val cond = Or(Seq(a === b, And(Seq(cc < d, f > g))))
    assert(cond.toString == "(c < d AND f > g) OR a == b")
    assert(cond.normalize.toString == "(a == b OR c < d) AND (a == b OR g < f)")
  }

  test("and_or_three (condition.rs:334-355)") {
    val cond = Or(Seq(truthy("a"), And(Seq(truthy("b"), truthy("c"))), truthy("d")))
    assert(cond.toString == "(b AND c) OR a OR d")
    assert(cond.normalize.toString == "(a OR b OR d) AND (a OR c OR d)")
  }

  test("full: NOT over mixed or/and (condition.rs:357-383)") {
    val cond = Not(Or(Seq(truthy("a"), And(Seq(truthy("b"), truthy("c"))), truthy("d"))))
    assert(cond.toString == "NOT ((b AND c) OR a OR d)")
    assert(cond.normalize.toString == "(NOT (b) OR NOT (c)) AND NOT (a) AND NOT (d)")
  }

  // ---- equivalence property (SURVEY §5.2.3) ------------------------------

  private def eval(cond: Condition, row: Map[String, Boolean]): Boolean =
    cond match {
      case BoolCol(n)         => row(n)
      case Cmp("==", l, r)    => evalOp(l, row) == evalOp(r, row)
      case Cmp("!=", l, r)    => evalOp(l, row) != evalOp(r, row)
      case Cmp("<", l, r)     => evalOp(l, row) < evalOp(r, row)
      case Cmp("<=", l, r)    => evalOp(l, row) <= evalOp(r, row)
      case Cmp(">", l, r)     => evalOp(l, row) > evalOp(r, row)
      case Cmp(">=", l, r)    => evalOp(l, row) >= evalOp(r, row)
      case Cmp(op, _, _)      => fail(s"unexpected op $op")
      case Not(x)             => !eval(x, row)
      case And(cs)            => cs.forall(eval(_, row))
      case Or(cs)             => cs.exists(eval(_, row))
    }

  private def evalOp(o: Operand, row: Map[String, Boolean]): Int = o match {
    case Operand.Col(n) => if (row(n)) 1 else 0
    case Operand.Lit(v) => v.asInstanceOf[Int]
    case Operand.Len(x) => evalOp(x, row) // not generated below
  }

  private val names = Seq("a", "b", "c", "d")
  private def genCond(depth: Int): Gen[Condition] =
    if (depth == 0)
      Gen.oneOf(
        Gen.oneOf(names).map(truthy),
        for {
          op <- Gen.oneOf("==", "!=", "<", "<=", ">", ">=")
          l <- Gen.oneOf(names).map(Operand.Col)
          r <- Gen.oneOf(Gen.oneOf(names).map(Operand.Col(_): Operand),
            Gen.chooseNum(0, 1).map(Operand.Lit(_): Operand))
        } yield Cmp(op, l, r))
    else
      Gen.oneOf(
        genCond(0),
        genCond(depth - 1).map(Not(_)),
        Gen.listOfN(2, genCond(depth - 1)).map(And(_)),
        Gen.listOfN(2, genCond(depth - 1)).map(Or(_)))

  test("normalize preserves semantics on random condition trees") {
    val rows = for {
      av <- Seq(true, false); bv <- Seq(true, false)
      cv <- Seq(true, false); dv <- Seq(true, false)
    } yield Map("a" -> av, "b" -> bv, "c" -> cv, "d" -> dv)
    (1 to 200).foreach { i =>
      val cond = genCond(3).pureApply(Gen.Parameters.default, Seed(i.toLong))
      val norm = cond.normalize
      rows.foreach { row =>
        assert(eval(cond, row) == eval(norm, row), s"$cond vs $norm on $row")
      }
      // idempotent
      assert(norm.normalize.toString == norm.toString)
    }
  }

  test("TypedQuery (entry point B): accumulated conditions reach the plan, typed collect") {
    import spark.implicits._
    import graft.dsl.TypedQuery
    val q = TypedQuery[OrderRow](Catalog(spark, sf), "orders")
      .filter(c("o_totalprice") > v(200000.0))
      .filter(!(c("o_orderkey") !== c("o_orderkey"))) // tautology, exercises normalize
    val rows = q.collect()
    val expected = Catalog(spark, sf).table("orders")
      .filter(col("o_totalprice") > 200000.0).count()
    assert(rows.length.toLong == expected && rows.forall(_.o_totalprice > 200000.0))
    // the condition is pushed into the parquet scan
    val scan = q.ds.queryExecution.executedPlan.toString
    assert(scan.contains("GreaterThan(o_totalprice,200000.0)"), scan)
  }

  test("compiles to a Spark filter equal to the hand-written Column") {
    val cond = (c("l_quantity") > v(25)) &&
      (c("l_returnflag") like "R%") && !(c("l_linestatus") !== v("F"))
    val li = Catalog(spark, sf).table("lineitem")
    val viaCondition = li.filter(cond.column).count()
    val viaNormalized = li.filter(cond.normalize.column).count()
    val direct = li.filter(
      col("l_quantity") > 25 && col("l_returnflag").like("R%") &&
        col("l_linestatus") === "F").count()
    assert(viaCondition == direct && viaNormalized == direct && direct > 0)
  }
}
