package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Chunking

class ChunkingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chunkWords: stride windows, tail chunk, short text, empty text") {
    val d = Seq((1L, "a b c d e"), (2L, "x y"), (3L, ""), (4L, "  "))
      .toDF("doc_id", "text")
    val r = Chunking.chunkWords(d, "doc_id", "text", size = 3, stride = 2)
      .orderBy("doc_id", "chunk_idx")
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getString(2)))
    assert(r.toSeq == Seq(
      (1L, 0, "a b c"), (1L, 1, "c d e"), (1L, 2, "e"),
      (2L, 0, "x y")))
  }

  test("packByCumulativeWords: budget boundaries and shard independence") {
    val d = Seq(
      ("s1", 1L, 300L), ("s1", 2L, 300L), ("s1", 3L, 300L), ("s1", 4L, 300L),
      ("s1", 5L, 300L), ("s2", 1L, 600L), ("s2", 2L, 10L))
      .toDF("source", "doc_id", "n_words")
    val r = Chunking.packByCumulativeWords(d, "source", "doc_id", "n_words", 512)
      .select("source", "doc_id", "seq_id").collect()
      .map(x => (x.getString(0), x.getLong(1)) -> x.getLong(2)).toMap
    // s1 prefix sums: 0,300,600,900,1200 → seqs 0,0,1,1,2 (start-bucket rule)
    assert(r(("s1", 1L)) == 0L && r(("s1", 2L)) == 0L)
    assert(r(("s1", 3L)) == 1L && r(("s1", 4L)) == 1L && r(("s1", 5L)) == 2L)
    // s2 restarts: 0, 600 → seqs 0, 1
    assert(r(("s2", 1L)) == 0L && r(("s2", 2L)) == 1L)
  }

  test("binaryConfusion: degenerate matrices give null metrics, not errors") {
    import graft.operators.Evaluation
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

  test("text profiler annotate: empty text gives zero counts, null fracs") {
    val d = Seq((1L, ""), (2L, "one"), (3L, "a a b")).toDF("doc_id", "text")
    val a = graft.core.TextProfiler.annotate(d, "text")
      .select("doc_id", "n_words", "top_word_frac", "dup_2gram_frac")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(a(1L) == ((0, None, None)))
    assert(a(2L) == ((1, Some(1.0), None)))
    assert(a(3L)._1 == 3 && a(3L)._2.isDefined && a(3L)._3.isDefined)
  }

  test("exact-moment stdev on a single-row domain fails gracefully") {
    import graft.core._
    val d = Seq(7).toDF("v")
    val sr = Graft.validate(d, Suite("one", Seq(
      ExpectColumnStdevToBeBetween("v", Some(0.0), None, exactMoments = true),
      ExpectColumnStdevToBeBetween("v", Some(0.0), None))))
    // both variants observe NULL (n-1 = 0) and fail identically — no
    // DIVIDE_BY_ZERO aborting the fused pass
    assert(sr.results.map(_.success) == Seq(false, false))
  }
}
