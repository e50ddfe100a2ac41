package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.table._

/** Soundness property: for ARBITRARY file contents and simple predicates,
  * manifest pruning may keep a file with no matches (that costs time) but
  * must NEVER drop a file containing a matching row (that would lose
  * results). Stats are derived from the rows exactly as FooterStats
  * derives them from footers; the predicate is evaluated both ways. */
class PruningPropertySpec extends SparkSpec {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  private val schema = SchemaMeta(0, List(
    FieldMeta(1, "k", "bigint"), FieldMeta(2, "s", "string")))

  private def meta(spec: PartSpecMeta): TableMeta =
    TableMeta(3, "u", 2, 0, 0, 0, 0, 0, 0, 0, List(schema), List(spec),
      Nil, Map.empty, Map.empty)

  private val genRows: Gen[List[(Long, String)]] = Gen.nonEmptyListOf(
    Gen.zip(Gen.chooseNum(-1000L, 1000L), Gen.oneOf("a", "bb", "ccc", "Zz", "")))

  private val genOp = Gen.oneOf("=", "<", "<=", ">", ">=")
  private val genPredicate: Gen[String] = Gen.oneOf(
    Gen.zip(genOp, Gen.chooseNum(-1000L, 1000L)).map { case (op, v) => s"k $op $v" },
    Gen.zip(genOp, Gen.oneOf("a", "bb", "ccc", "Zz")).map { case (op, v) => s"s $op '$v'" },
    Gen.listOfN(3, Gen.chooseNum(-1000L, 1000L)).map(vs => s"k in (${vs.mkString(",")})"))

  private def evalRow(row: (Long, String), pred: String): Boolean = {
    // reference semantics via the SQL the scan itself would apply
    val p = pred.replace("k", row._1.toString).replace("s", s"'${row._2}'")
    spark.sql(s"SELECT $p AS r").collect()(0).getBoolean(0)
  }

  test("stats pruning never drops a file containing a matching row") {
    check(Prop.forAll(genRows, genPredicate) { (rows, pred) =>
      val stats = Map(
        "1" -> ColStats(Some(rows.map(_._1).min.toString),
          Some(rows.map(_._1).max.toString), 0),
        "2" -> ColStats(Some(rows.map(_._2).min), Some(rows.map(_._2).max), 0))
      val f = FileMeta("f", "data", 0, 0, Map.empty, rows.size, 1, 1, stats)
      val m = meta(PartSpecMeta(0, Nil))
      val kept = Pruning.fileMatches(f, m, Pruning.extract(pred, spark))
      val hasMatch = rows.exists(evalRow(_, pred))
      kept || !hasMatch
    })
  }

  test("bucket partition pruning never drops a file holding the key") {
    val spec = PartSpecMeta(0, List(PartFieldMeta("b", "bucket", List(1), Some(4))))
    val m = meta(spec)
    check(Prop.forAll(genRows, Gen.chooseNum(-1000L, 1000L)) { (rows, probe) =>
      // one file per actual bucket of the rows it holds
      val pf = spec.fields.head
      rows.groupBy(r => Transforms.evalLiteral(pf, Seq(r._1)).get).forall {
        case (bucket, bucketRows) =>
          val f = FileMeta("f", "data", 0, 0, Map("b" -> bucket),
            bucketRows.size, 1, 1, Map.empty)
          val kept = Pruning.fileMatches(f, m, Pruning.extract(s"k = $probe", spark))
          val hasMatch = bucketRows.exists(_._1 == probe)
          kept || !hasMatch
      }
    })
  }
}
