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

  test("chunkWords plan is map-side only: no Exchange, pruned scan") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Chunking.chunkWords(d, "doc_id", "text", 20, 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
    // check the scan's actual output schema, not the (truncatable)
    // ReadSchema plan string
    val scans = Chunking.chunkWords(d, "doc_id", "text", 20, 10)
      .queryExecution.executedPlan.collectLeaves()
    assert(scans.exists(_.output.map(_.name).toSet == Set("doc_id", "text")),
      s"scan must read only doc_id+text: ${scans.map(_.output.map(_.name))}")
  }

  test("chunkWords at stride == size partitions the text exactly") {
    // non-overlapping chunks reassemble to the original normalized text
    val texts = Seq("a b c d e f g", "one two", "x", "p q r s t")
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val rejoined = Chunking.chunkWords(d, "doc_id", "text", 3, 3)
      .groupBy("doc_id")
      .agg(concat_ws(" ", sort_array(collect_list(
        struct(col("chunk_idx"), col("chunk_text")))).getField("chunk_text"))
        .as("re"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(rejoined(i.toLong) == t, s"doc $i")
    }
  }

  test("packByCumulativeWords plan: shard-partitioned window, never a global sort") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("n_words", lit(10L))
    val plan = Chunking.packByCumulativeWords(d, "source", "doc_id", "n_words", 512)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(source"),
      s"window must partition by the shard column:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"packing must never serialize on one partition:\n$plan")
  }
}
