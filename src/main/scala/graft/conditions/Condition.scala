package graft.conditions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, length, lit, not}

/** Declarative boolean-condition IR + normalizer — the reference's
  * `Condition` layer (reference: src/query/condition.rs:12-120,
  * src/query/binary_expression.rs, src/query/unary_expression.rs)
  * re-expressed as a Scala ADT that *compiles to a Catalyst Column*.
  *
  * In the reference this normalizer exists but nothing consumes it yet
  * (src/query/mod.rs:52-54); here it is wired end-to-end: `cond.column`
  * hands Catalyst the compiled expression (which then applies its own
  * BooleanSimplification on top — normalization is semantics-preserving,
  * so the two compose). `normalize` reproduces the reference's rewrite
  * pipeline and is golden-tested against the reference's own unit-test
  * strings (condition.rs:139-383).
  *
  * Rewrites (SURVEY §4.1):
  *  - `!=` → `NOT ==`, `NOT LIKE` → `NOT(LIKE)` (binary_expression.rs:33-48)
  *  - `a > b` → `b < a`, `a >= b` → `b <= a` (binary_expression.rs:49-58)
  *  - double-negation elimination (unary_expression.rs:26-29)
  *  - De Morgan both directions (unary_expression.rs:31-51)
  *  - n-ary AND/OR flattening with set-dedup (condition.rs:64-74)
  *  - OR-over-AND distribution → CNF (condition.rs:25-63)
  *
  * AND/OR members live in canonical sorted order mirroring the
  * reference's `BTreeSet<Condition>` (variant rank Or < And < Not < Cmp
  * < Col, then structural compare) so golden strings match.
  */
sealed trait Operand {
  def column: Column = this match {
    case Operand.Col(n) => col(n)
    case Operand.Lit(v) => lit(v)
    case Operand.Len(o) => length(o.column)
  }
  override def toString: String = this match {
    case Operand.Col(n)         => n
    case Operand.Lit(s: String) => s"'$s'"
    case Operand.Lit(v)         => String.valueOf(v)
    case Operand.Len(o)         => s"LEN($o)"
  }
}
object Operand {
  final case class Col(name: String) extends Operand
  final case class Lit(value: Any) extends Operand
  final case class Len(of: Operand) extends Operand

  /** Reference operand rank: Unary(Len)=2 < Column=4 < Value=5. */
  implicit val ordering: Ordering[Operand] = Ordering.by {
    case Len(o) => (2, o.toString)
    case Col(n) => (4, n)
    case Lit(v) => (5, String.valueOf(v))
  }
}

sealed trait Condition {

  import Condition._

  /** Compile to a Catalyst Column (the layer the reference never wired). */
  def column: Column = this match {
    case BoolCol(n) => col(n)
    case Cmp(op, l, r) =>
      op match {
        case "=="      => l.column === r.column
        case "!="      => l.column =!= r.column
        case "<"       => l.column < r.column
        case "<="      => l.column <= r.column
        case ">"       => l.column > r.column
        case ">="      => l.column >= r.column
        case "LIKE"    => l.column.like(r.asInstanceOf[Operand.Lit].value.toString)
        case "NOTLIKE" => !l.column.like(r.asInstanceOf[Operand.Lit].value.toString)
      }
    case Not(c)  => not(c.column)
    case And(cs) => cs.map(_.column).reduce(_ && _)
    case Or(cs)  => cs.map(_.column).reduce(_ || _)
  }

  /** Full normalization to CNF (the reference's normalize(),
    * condition.rs:23-120). Idempotent; semantics-preserving.
    */
  def normalize: Condition = this match {
    case b: BoolCol => b

    // comparison canonicalization (binary_expression.rs:33-58)
    case Cmp("!=", l, r)      => Not(Cmp("==", l, r))
    case Cmp("NOTLIKE", l, r) => Not(Cmp("LIKE", l, r))
    case Cmp(">", l, r)       => Cmp("<", r, l)
    case Cmp(">=", l, r)      => Cmp("<=", r, l)
    case c: Cmp               => c

    case Not(inner) =>
      // De Morgan applies to the RAW inner structure (as in the
      // reference, unary_expression.rs:31-51) — normalizing first would
      // CNF-distribute the inner Or and lose the golden shape.
      inner match {
        case And(cs) => or(cs.map(Not(_))).normalize // De Morgan
        case Or(cs)  => and(cs.map(Not(_))).normalize
        case _ =>
          inner.normalize match {
            case Not(c)  => c                            // double negation
            case And(cs) => or(cs.map(Not(_))).normalize // (e.g. via !=)
            case Or(cs)  => and(cs.map(Not(_))).normalize
            case c       => Not(c)
          }
      }

    case And(cs) =>
      // flatten nested ANDs, set-dedup (condition.rs:64-74)
      val flat = cs.map(_.normalize).flatMap {
        case And(inner) => inner
        case c          => Seq(c)
      }
      mk(flat, and)

    case Or(cs) =>
      val flat = cs.map(_.normalize).flatMap {
        case Or(inner) => inner
        case c         => Seq(c)
      }
      // distribute OR over AND → CNF (condition.rs:25-63):
      // OR(rest…, AND(a,b)) = AND(OR(rest…,a), OR(rest…,b))
      flat.find(_.isInstanceOf[And]) match {
        case None => mk(flat, or)
        case Some(a @ And(conjuncts)) =>
          val rest = flat.filterNot(_ == a)
          and(conjuncts.map(c => or(rest :+ c))).normalize
        case Some(_) => throw new IllegalStateException("unreachable")
      }
  }

  /** Render in the reference's golden-test format
    * (condition.rs:331: "(a == b OR c < d) AND (a == b OR g < f)").
    */
  override def toString: String = this match {
    case BoolCol(n) => n
    case Cmp(op, l, r) =>
      val o = op match { case "NOTLIKE" => "NOT LIKE"; case x => x }
      s"$l $o $r"
    case Not(c) => s"NOT ($c)"
    case And(cs) =>
      Condition.canon(cs).map(c => if (c.isInstanceOf[Or]) s"($c)" else s"$c").mkString(" AND ")
    case Or(cs) =>
      Condition.canon(cs).map(c => if (c.isInstanceOf[And]) s"($c)" else s"$c").mkString(" OR ")
  }
}

object Condition {
  /** Truthy column condition (reference Condition::Column). */
  final case class BoolCol(name: String) extends Condition
  final case class Cmp(op: String, l: Operand, r: Operand) extends Condition
  final case class Not(c: Condition) extends Condition
  final case class And(cs: Seq[Condition]) extends Condition
  final case class Or(cs: Seq[Condition]) extends Condition

  private val opRank = Seq("==", "!=", "<", "<=", ">", ">=", "LIKE", "NOTLIKE")

  /** Structural ordering mirroring the reference's derived `Ord`
    * (condition.rs:12-21 variant order Or, And, Unary, Binary, Column;
    * binary_expression.rs:13-22 comparator order).
    */
  implicit object CondOrdering extends Ordering[Condition] {
    private def rank(c: Condition): Int = c match {
      case _: Or      => 0
      case _: And     => 1
      case _: Not     => 2
      case _: Cmp     => 3
      case _: BoolCol => 4
    }
    def compare(x: Condition, y: Condition): Int = (x, y) match {
      case (Or(a), Or(b))   => compareSeqs(a, b)
      case (And(a), And(b)) => compareSeqs(a, b)
      case (Not(a), Not(b)) => compare(a, b)
      case (Cmp(o1, l1, r1), Cmp(o2, l2, r2)) =>
        val c0 = opRank.indexOf(o1).compareTo(opRank.indexOf(o2))
        if (c0 != 0) c0
        else {
          val c1 = Operand.ordering.compare(l1, l2)
          if (c1 != 0) c1 else Operand.ordering.compare(r1, r2)
        }
      case (BoolCol(a), BoolCol(b)) => a.compareTo(b)
      case _                        => rank(x).compareTo(rank(y))
    }
    private def compareSeqs(a: Seq[Condition], b: Seq[Condition]): Int =
      a.zip(b).iterator.map { case (x, y) => compare(x, y) }
        .find(_ != 0).getOrElse(a.size.compareTo(b.size))
  }

  /** BTreeSet semantics: sorted, deduped; singleton collapses. */
  private[conditions] def canon(cs: Seq[Condition]): Seq[Condition] = cs.distinct.sorted
  private[conditions] def and(cs: Seq[Condition]): Condition = mk(cs, And(_))
  private[conditions] def or(cs: Seq[Condition]): Condition = mk(cs, Or(_))
  private def mk(cs: Seq[Condition], f: Seq[Condition] => Condition): Condition = {
    val c = canon(cs)
    if (c.sizeIs == 1) c.head else f(c)
  }

  // ---- builder DSL --------------------------------------------------------
  def c(name: String): Operand = Operand.Col(name)
  def v(value: Any): Operand = Operand.Lit(value)
  def len(o: Operand): Operand = Operand.Len(o)
  def truthy(name: String): Condition = BoolCol(name)

  implicit final class OperandOps(private val l: Operand) extends AnyVal {
    def ===(r: Operand): Condition = Cmp("==", l, r)
    def !==(r: Operand): Condition = Cmp("!=", l, r)
    def <(r: Operand): Condition = Cmp("<", l, r)
    def <=(r: Operand): Condition = Cmp("<=", l, r)
    def >(r: Operand): Condition = Cmp(">", l, r)
    def >=(r: Operand): Condition = Cmp(">=", l, r)
    def like(pattern: String): Condition = Cmp("LIKE", l, Operand.Lit(pattern))
    def notLike(pattern: String): Condition = Cmp("NOTLIKE", l, Operand.Lit(pattern))
  }

  implicit final class ConditionOps(private val a: Condition) extends AnyVal {
    def &&(b: Condition): Condition = And(Seq(a, b))
    def ||(b: Condition): Condition = Or(Seq(a, b))
    def unary_! : Condition = Not(a)
  }
}
