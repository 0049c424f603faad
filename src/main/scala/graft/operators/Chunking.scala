package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Passage chunking + sequence packing — the two reshaping steps between a
  * cleaned corpus and a trainer (or a RAG index). chunkWords is pure
  * map-side (one explode, no shuffle); packing shuffles once by shard and
  * sorts within each shard's window — parallel across shards, no GLOBAL
  * sort or other cross-shard coordination. Both are deterministic. */
object Chunking {

  /** Sliding word-window chunks: starts at 0, stride, 2·stride, … while
    * start < n_words; each chunk is the next `size` words (the tail chunk
    * may be shorter). Empty/null text yields no chunks. One map-side
    * explode — chunk text is assembled from the SAME normalized token
    * array both here and in the DuckDB oracle, so output is
    * byte-deterministic. */
  def chunkWords(df: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0, s"size/stride must be positive")
    val w = graft.functions.TextFunctions.tokens(col(textCol))
    val chunks = when(size_(w) === 0,
        array().cast(ArrayType(StringType)))
      .otherwise(transform(
        sequence(lit(0), floor((size_(w) - 1) / lit(stride)).cast(IntegerType)),
        s => concat_ws(" ", slice(w, s * stride + 1, lit(size)))))
    // posexplode_OUTER + null filter instead of plain posexplode: the
    // optimizer infers `size(chunks) > 0` below a plain generate, which
    // re-expands the whole chunk-building expression (tokenize + slice +
    // concat per window) into a second per-row evaluation. The outer
    // generate infers nothing; an empty chunk array (empty doc) emits one
    // (id, null, null) row that the filter drops — chunk_text itself is
    // never null (concat_ws), so the output rows are identical.
    df.select(col(idCol),
        posexplode_outer(chunks).as(Seq("chunk_idx", "chunk_text")))
      .filter(col("chunk_text").isNotNull)
  }

  private def size_(c: Column): Column = size(c)

  /** Shard-parallel sequence packing: within each `shardCol` partition,
    * documents (in `orderCol` order) are assigned to sequences of roughly
    * `budget` words — seq_id = floor(exclusive-prefix-sum / budget), the
    * scalable approximation of greedy packing (a document whose span
    * crosses a boundary joins the sequence its START falls in, so
    * sequences can overflow by at most one document; exact greedy packing
    * is inherently sequential). The window is PARTITIONED by shard, so
    * packing parallelizes across shards and no global sort exists. */
  def packByCumulativeWords(df: DataFrame, shardCol: String, orderCol: String,
      wordsCol: String, budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__before", coalesce(sum(col(wordsCol)).over(win), lit(0L)))
      .withColumn("seq_id", floor(col("__before") / lit(budget)).cast(LongType))
      .drop("__before")
  }
}
