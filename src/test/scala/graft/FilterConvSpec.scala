package graft

import graft.meta.expr.{And => GAnd, FalseExpr, Not => GNot, Or => GOr, Pred}
import graft.table.SparkFilterConv

import org.apache.spark.sql.{sources => s}
import org.scalatest.funsuite.AnyFunSuite

/** DSv2 `sources.Filter` conversion soundness (ADVICE r2): partial And is
  * only legal for scan PRUNING (weaker predicate, rows re-filtered); anywhere
  * the result selects rows to delete it must convert exactly, and under Not
  * the polarity flips so the subtree must convert exactly too. */
class FilterConvSpec extends AnyFunSuite {

  // LIKE '%x' has no sources.Filter with a convertible shape
  private val unconvertible: s.Filter = s.StringEndsWith("b", "x")
  private val a1: s.Filter = s.EqualTo("a", 1)
  private val c2: s.Filter = s.EqualTo("c", 2)

  test("pruning mode keeps convertible conjuncts of And") {
    val got = SparkFilterConv.fromV1(s.And(a1, unconvertible))
    assert(got.exists(_.isInstanceOf[Pred]))
  }

  test("strict mode refuses partial And") {
    assert(SparkFilterConv.fromV1Strict(s.And(a1, unconvertible)).isEmpty)
    SparkFilterConv.fromV1Strict(s.And(a1, c2)) match {
      case Some(GAnd(_, _)) =>
      case other => fail(other.toString)
    }
  }

  test("strict mode refuses (a AND unconvertible) OR c — the data-loss shape") {
    // pruning conversion would weaken this to (a OR c): rows matching a but
    // not the unconvertible conjunct would be deleted by overwrite-by-filter
    assert(SparkFilterConv.fromV1Strict(
      s.Or(s.And(a1, unconvertible), c2)).isEmpty)
  }

  test("Not requires exact subtree conversion even in pruning mode") {
    // NOT(a AND u): dropping u gives NOT(a), a STRONGER predicate — pruning
    // with it could skip files containing matching rows
    assert(SparkFilterConv.fromV1(s.Not(s.And(a1, unconvertible))).isEmpty)
    SparkFilterConv.fromV1(s.Not(a1)) match {
      case Some(GNot(_)) =>
      case other => fail(other.toString)
    }
  }

  test("Or never converts partially") {
    assert(SparkFilterConv.fromV1(s.Or(a1, unconvertible)).isEmpty)
    SparkFilterConv.fromV1(s.Or(a1, c2)) match {
      case Some(GOr(_, _)) =>
      case other => fail(other.toString)
    }
  }

  test("AlwaysFalse converts in both modes") {
    assert(SparkFilterConv.fromV1Strict(s.AlwaysFalse()).contains(FalseExpr))
  }
}
