package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Evaluation

class EvaluationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("binaryConfusion: degenerate matrices give null metrics, not errors") {
    val d = Seq((true, false), (false, false)).toDF("label", "pred")
    val r = Evaluation.binaryConfusion(d, col("label"), col("pred")).collect().head
    assert(r.getLong(0) == 0L) // tp
    assert(r.isNullAt(4), "precision must be null with no predicted positives")
    assert(!r.isNullAt(5) && r.getDouble(5) == 0.0) // recall = 0/1
    assert(!r.isNullAt(6) && r.getDouble(6) == 0.0) // f1 = 0/(0+0+1)
    val allTn = Seq((false, false)).toDF("label", "pred")
    val r2 = Evaluation.binaryConfusion(allTn, col("label"), col("pred"))
      .collect().head
    assert(r2.isNullAt(4) && r2.isNullAt(5) && r2.isNullAt(6))
  }

  test("binaryConfusion: empty input yields zero counts, not nulls") {
    val d = Seq.empty[(Boolean, Boolean)].toDF("label", "pred")
    val r = Evaluation.binaryConfusion(d, col("label"), col("pred")).collect().head
    assert((0 to 3).forall(i => !r.isNullAt(i) && r.getLong(i) == 0L),
      s"empty-input confusion counts must be 0, got $r")
    assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6)) // ratios: 0/0
  }

  test("binaryConfusion: perfect and inverted predictors") {
    val d = Seq((true, true), (true, true), (false, false)).toDF("l", "p")
    val perfect = Evaluation.binaryConfusion(d, col("l"), col("p")).collect().head
    assert(perfect.getDouble(4) == 1.0 && perfect.getDouble(5) == 1.0 &&
      perfect.getDouble(6) == 1.0)
    val inverted = Evaluation.binaryConfusion(d, col("l"), !col("p")).collect().head
    assert(inverted.getDouble(6) == 0.0) // f1 = 0/(0+1+2)
  }

  test("recallAtK: misses surface as zero, duplicates don't double-count") {
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L)).toDF("q", "n")
    val approx = Seq((1L, 10L), (1L, 10L), (3L, 30L)).toDF("q", "n")
    val r = Evaluation.recallAtK(approx, exact, "q", "n").collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3)))
      .toMap
    assert(r(1L) == ((1L, 2L, 0.5))) // dup (1,10) counts once
    assert(r(2L) == ((0L, 1L, 0.0))) // query entirely missed by approx
    assert(!r.contains(3L)) // approx-only query has no exact truth row
  }
}
