package graft

import graft.meta.{PartitionSpec, Schema}
import graft.meta.expr._
import graft.meta.transforms._

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class ExprSpec extends AnyFunSuite {
  val schema: Schema = Schema.fresh(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("data", StringType),
    StructField("ts", TimestampType),
    StructField("d", DateType),
    StructField("f", DoubleType),
    StructField("n", IntegerType))))
  import Exprs._

  private def b(e: Expr): Expr = Binder.bind(schema, e)

  test("binder resolves ids, converts literals, folds out-of-range") {
    b(equalTo("id", 5)) match {
      case BoundPred(Op.Eq, id, "id", LongType, Seq(v)) =>
        assert(id === schema.fieldId("id")); assert(v === 5L)
      case other => fail(other.toString)
    }
    // int column, long literal above range
    assert(b(greaterThan("n", Int.MaxValue.toLong + 1)) === FalseExpr)
    assert(b(lessThan("n", Int.MaxValue.toLong + 1)) === TrueExpr)
    assert(b(equalTo("n", Long.MinValue)) === FalseExpr)
    // string → timestamp micros
    b(greaterThanOrEqual("ts", "1995-01-01 00:00:00")) match {
      case BoundPred(Op.GtEq, _, _, TimestampType, Seq(v)) =>
        assert(v === 788918400000000L)
      case other => fail(other.toString)
    }
    // string → date days
    b(equalTo("d", "2017-11-16")) match {
      case BoundPred(Op.Eq, _, _, DateType, Seq(v)) => assert(v === 17486)
      case other => fail(other.toString)
    }
    // required column null checks fold
    assert(b(isNull("id")) === FalseExpr)
    assert(b(notNull("id")) === TrueExpr)
    // NOT is rewritten away
    assert(b(not(lessThan("id", 5))) === b(greaterThanOrEqual("id", 5)))
  }

  test("row evaluator") {
    val e = b(and(greaterThan("id", 10), or(isNull("data"), startsWith("data", "ab"))))
    val idId = schema.fieldId("id"); val dataId = schema.fieldId("data")
    def row(vs: (Int, Any)*): Int => Any = vs.toMap.withDefaultValue(null)
    assert(RowEvaluator.eval(e, row(idId -> 11L, dataId -> "abc")))
    assert(RowEvaluator.eval(e, row(idId -> 11L, dataId -> null)))
    assert(!RowEvaluator.eval(e, row(idId -> 11L, dataId -> "xbc")))
    assert(!RowEvaluator.eval(e, row(idId -> 9L, dataId -> "abc")))
  }

  case class Stats(rows: Long, vc: Map[Int, Long] = Map(), nc: Map[Int, Long] = Map(),
      nanc: Map[Int, Long] = Map(), lo: Map[Int, Any] = Map(), hi: Map[Int, Any] = Map())
    extends MetricsSource {
    def rowCount: Long = rows
    def valueCount(id: Int): Option[Long] = vc.get(id)
    def nullCount(id: Int): Option[Long] = nc.get(id)
    def nanCount(id: Int): Option[Long] = nanc.get(id)
    def lower(id: Int): Option[Any] = lo.get(id)
    def upper(id: Int): Option[Any] = hi.get(id)
  }

  test("inclusive metrics evaluator") {
    val id = schema.fieldId("id"); val f = schema.fieldId("f")
    val s = Stats(100, vc = Map(id -> 100L, f -> 100L), nc = Map(id -> 0L, f -> 10L),
      nanc = Map(f -> 0L), lo = Map(id -> 30L, f -> 1.5), hi = Map(id -> 79L, f -> 9.5))
    def incl(e: Expr): Boolean = InclusiveMetricsEvaluator.eval(b(e), s)
    assert(!incl(lessThan("id", 30)))
    assert(incl(lessThan("id", 31)))
    assert(!incl(lessThanOrEqual("id", 29)))
    assert(incl(lessThanOrEqual("id", 30)))
    assert(!incl(greaterThan("id", 79)))
    assert(incl(greaterThan("id", 78)))
    assert(!incl(equalTo("id", 80)))
    assert(incl(equalTo("id", 42)))
    assert(!incl(in("id", 5, 100)))
    assert(incl(in("id", 5, 42)))
    assert(incl(notEqualTo("id", 42))) // can never exclude
    assert(incl(isNull("data")))       // no stats ⇒ might match
    assert(incl(isNull("f")))          // 10 nulls
    assert(!incl(isNaN("f")))          // nanCount 0
    assert(incl(notNaN("f")))
  }

  test("inclusive: all-null column cannot match value predicates") {
    val d = schema.fieldId("data")
    val s = Stats(10, vc = Map(d -> 10L), nc = Map(d -> 10L))
    assert(!InclusiveMetricsEvaluator.eval(b(equalTo("data", "x")), s))
    assert(!InclusiveMetricsEvaluator.eval(b(notNull("data")), s))
    assert(InclusiveMetricsEvaluator.eval(b(isNull("data")), s))
  }

  test("inclusive: startsWith against bounds") {
    val d = schema.fieldId("data")
    val s = Stats(10, vc = Map(d -> 10L), nc = Map(d -> 0L),
      lo = Map(d -> "apple"), hi = Map(d -> "cherry"))
    def incl(e: Expr): Boolean = InclusiveMetricsEvaluator.eval(b(e), s)
    assert(incl(startsWith("data", "b")))
    assert(incl(startsWith("data", "ap")))
    assert(incl(startsWith("data", "ch")))
    assert(!incl(startsWith("data", "d")))
    assert(!incl(startsWith("data", "aa")))
  }

  test("strict metrics evaluator") {
    val id = schema.fieldId("id")
    val s = Stats(100, vc = Map(id -> 100L), nc = Map(id -> 0L),
      lo = Map(id -> 30L), hi = Map(id -> 79L))
    def strict(e: Expr): Boolean = StrictMetricsEvaluator.eval(b(e), s)
    assert(strict(lessThan("id", 80)))
    assert(!strict(lessThan("id", 79)))
    assert(strict(greaterThanOrEqual("id", 30)))
    assert(!strict(greaterThanOrEqual("id", 31)))
    assert(strict(notEqualTo("id", 100)))
    assert(!strict(notEqualTo("id", 50)))
    assert(!strict(equalTo("id", 50)))
    assert(strict(notNull("id")))
    // with nulls present, literal predicates can't be strict
    val sn = Stats(100, vc = Map(id -> 100L), nc = Map(id -> 5L),
      lo = Map(id -> 30L), hi = Map(id -> 79L))
    assert(!StrictMetricsEvaluator.eval(b(lessThan("id", 1000)), sn))
    // single-value file
    val s1 = Stats(10, vc = Map(id -> 10L), nc = Map(id -> 0L),
      lo = Map(id -> 42L), hi = Map(id -> 42L))
    assert(StrictMetricsEvaluator.eval(b(equalTo("id", 42)), s1))
    assert(StrictMetricsEvaluator.eval(b(in("id", 41, 42)), s1))
  }

  val spec: PartitionSpec = PartitionSpec.builderFor(schema)
    .bucket("id", 8).day("ts").truncate("data", 2).build()

  test("inclusive projection: bucket eq, day range, truncate") {
    val bucketField = spec.fields(0); val dayField = spec.fields(1)
    // bucket: eq projects to the computed bucket
    Projections.inclusive(spec, schema, b(equalTo("id", 34))) match {
      case BoundPred(Op.Eq, fid, _, IntegerType, Seq(v)) =>
        assert(fid === bucketField.fieldId)
        assert(v === (2017239379 & Int.MaxValue) % 8)
      case other => fail(other.toString)
    }
    // bucket: comparison does not project
    assert(Projections.inclusive(spec, schema, b(lessThan("id", 34))) === TrueExpr)
    // day: range projects with boundary shift
    val micros1995 = 788918400000000L // 1995-01-01, epoch day 9131
    Projections.inclusive(spec, schema, b(lessThan("ts", "1995-01-01 00:00:00"))) match {
      case BoundPred(Op.LtEq, fid, _, IntegerType, Seq(v)) =>
        assert(fid === dayField.fieldId)
        assert(v === 9130) // day(micros-1) = previous day
      case other => fail(other.toString)
    }
    Projections.inclusive(spec, schema, b(greaterThanOrEqual("ts", "1995-01-01 00:00:00"))) match {
      case BoundPred(Op.GtEq, _, _, _, Seq(v)) => assert(v === 9131)
      case other => fail(other.toString)
    }
    // truncate string: startsWith shorter than width stays startsWith; longer → eq
    Projections.inclusive(spec, schema, b(startsWith("data", "a"))) match {
      case BoundPred(Op.StartsWith, _, _, _, Seq("a")) =>
      case other => fail(other.toString)
    }
    Projections.inclusive(spec, schema, b(startsWith("data", "abc"))) match {
      case BoundPred(Op.Eq, _, _, _, Seq("ab")) =>
      case other => fail(other.toString)
    }
  }

  test("strict projection: bucket notEq; day ranges") {
    Projections.strict(spec, schema, b(notEqualTo("id", 34))) match {
      case BoundPred(Op.NotEq, _, _, _, Seq(v)) =>
        assert(v === (2017239379 & Int.MaxValue) % 8)
      case other => fail(other.toString)
    }
    assert(Projections.strict(spec, schema, b(equalTo("id", 34))) === FalseExpr)
    // unpartitioned column predicates are never strictly guaranteed
    assert(Projections.strict(spec, schema, b(equalTo("f", 1.0))) === FalseExpr)
    // lt strict over day
    Projections.strict(spec, schema, b(lessThan("ts", "1995-01-01 00:00:00"))) match {
      case BoundPred(Op.Lt, _, _, _, Seq(v)) => assert(v === 9131)
      case other => fail(other.toString)
    }
  }

  test("strict projection ORs multiple transforms of one source column") {
    // identity + day over ts: Eq projects strictly through identity but not
    // through day (None ⇒ FALSE). OR-reduction keeps the identity guarantee;
    // AND-reduction would collapse the whole projection to FALSE and miss
    // metadata-only deletes on multi-transform specs (ref Projections.java:113).
    val spec2 = PartitionSpec.builderFor(schema).identity("ts").day("ts").build()
    val idField = spec2.fields(0)
    Projections.strict(spec2, schema, b(equalTo("ts", "1995-01-01 00:00:00"))) match {
      case BoundPred(Op.Eq, fid, _, _, Seq(v)) =>
        assert(fid === idField.fieldId)
        assert(v === 788918400000000L)
      case other => fail(s"expected identity Eq to survive OR-reduction, got $other")
    }
    // both project (range over day+hour spec): OR of two sufficient conditions
    val spec3 = PartitionSpec.builderFor(schema).day("ts").hour("ts").build()
    Projections.strict(spec3, schema, b(lessThan("ts", "1995-01-01 00:00:00"))) match {
      case Or(BoundPred(Op.Lt, _, _, _, _), BoundPred(Op.Lt, _, _, _, _)) =>
      case other => fail(other.toString)
    }
    // inclusive still ANDs (each projection is necessary)
    Projections.inclusive(spec3, schema, b(lessThan("ts", "1995-01-01 00:00:00"))) match {
      case And(BoundPred(Op.LtEq, _, _, _, _), BoundPred(Op.LtEq, _, _, _, _)) =>
      case other => fail(other.toString)
    }
  }

  test("residual: day partition fully inside range becomes TRUE") {
    val dayField = spec.fields(1)
    val e = b(and(greaterThanOrEqual("ts", "1995-01-01 00:00:00"),
      lessThan("ts", "1996-01-01 00:00:00")))
    // partition day 9300 (mid-1995): both bounds strictly satisfied
    val part: Int => Any = {
      case id if id == dayField.fieldId => 9300
      case _ => null
    }
    assert(ResidualEvaluator.residual(spec, schema, e, part) === TrueExpr)
    // filter boundary mid-day: rows of that day straddle it, lt must stay
    val e2 = b(and(greaterThanOrEqual("ts", "1995-01-01 00:00:00"),
      lessThan("ts", "1995-06-15 12:00:00")))
    val straddle: Int => Any = {
      case id if id == dayField.fieldId => 9296 // 1995-06-15
      case _ => null
    }
    ResidualEvaluator.residual(spec, schema, e2, straddle) match {
      case BoundPred(Op.Lt, _, _, TimestampType, _) =>
      case other => fail(s"expected lt residual, got $other")
    }
    // partition day outside range → FALSE
    val outside: Int => Any = {
      case id if id == dayField.fieldId => 12000
      case _ => null
    }
    assert(ResidualEvaluator.residual(spec, schema, e, outside) === FalseExpr)
  }

  test("manifest evaluator prunes by partition summaries") {
    import ManifestEvaluator.FieldSummary
    val e = and(equalTo("id", 34), greaterThanOrEqual("ts", "1995-01-01 00:00:00"))
    val bucket34 = (2017239379 & Int.MaxValue) % 8
    val summariesHit = Seq(
      FieldSummary(containsNull = false, Some(false), Some(0), Some(7)),
      FieldSummary(containsNull = false, Some(false), Some(9000), Some(9200)),
      FieldSummary(containsNull = false, Some(false), Some("aa"), Some("zz")))
    assert(ManifestEvaluator.eval(spec, schema, e, summariesHit))
    // ts summary entirely before 1995 → pruned
    val summariesMiss = Seq(
      FieldSummary(containsNull = false, Some(false), Some(0), Some(7)),
      FieldSummary(containsNull = false, Some(false), Some(8000), Some(9100)),
      FieldSummary(containsNull = false, Some(false), Some("aa"), Some("zz")))
    assert(!ManifestEvaluator.eval(spec, schema, e, summariesMiss))
    // bucket summary excluding bucket34 → pruned
    val bucketMiss = Seq(
      FieldSummary(containsNull = false, Some(false),
        Some(bucket34 + 1), Some(bucket34 + 2)),
      FieldSummary(containsNull = false, Some(false), Some(9000), Some(9200)),
      FieldSummary(containsNull = false, Some(false), Some("aa"), Some("zz")))
    assert(!ManifestEvaluator.eval(spec, schema, e, bucketMiss))
  }

  test("schema evolution: add/rename/promote/delete/move keeps IDs stable") {
    val s0 = schema
    val idOfData = s0.fieldId("data")
    val s1 = new graft.meta.UpdateSchema(s0, s0.highestFieldId)
      .addColumn("extra", StringType)
      .renameColumn("data", "payload")
      .updateColumn("n", LongType)
      .deleteColumn("f")
      .moveFirst("payload")
      .apply()
    assert(s1.fieldId("payload") === idOfData)
    assert(s1.columnNames.head === "payload")
    assert(!s1.contains("f"))
    assert(s1.fieldType(s1.fieldId("n")) === LongType)
    assert(s1.fieldId("extra") > s0.highestFieldId)
    intercept[IllegalArgumentException] {
      new graft.meta.UpdateSchema(s1, s1.highestFieldId).updateColumn("id", IntegerType).apply()
    }
  }
}
