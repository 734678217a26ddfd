package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key top-k with per-partition pre-pruning — the per-key analogue
  * of Spark's global `TakeOrderedAndProject`, which the built-in
  * operator set lacks: a rank window (`row_number ≤ k`) shuffles and
  * sorts EVERY row of every group; this operator first reduces each
  * input partition to at most k rows per key with a bounded heap, so
  * the shuffle moves at most k·partitions rows per key instead of the
  * whole group — the difference between "shuffle 100 TB" and "shuffle
  * k rows per key" when groups are large.
  *
  * Correctness: every row of a key's true global top-k is also in that
  * key's top-k within its own partition (removing other-partition rows
  * only improves a row's local standing), so the pre-prune keeps a
  * superset and the final rank window over ≤ k·P rows per key returns
  * EXACTLY the rank-window answer — the oracle is the plain window.
  *
  * Order: (`orderCol` DESC, `tieCol` ASC), both LONG — the exact-cents
  * convention; the deterministic tiebreak is what makes the result a
  * function of the data, not the partitioning. `mapPartitions` is the
  * documented last-resort tier (SURVEY §7.3): the bounded heap is
  * imperative per-partition state no Column expression can hold.
  * Heap memory is O(keys-in-partition · k), independent of rows.
  */
object TopKPerKey {

  def topKPerKey(df: DataFrame, keys: Seq[String], orderCol: String,
      tieCol: String, k: Int): DataFrame = {
    require(k > 0, "topKPerKey: k must be positive")
    val schema = df.schema
    val keyIdx = keys.map(schema.fieldIndex)
    val ordIdx = schema.fieldIndex(orderCol)
    val tieIdx = schema.fieldIndex(tieCol)
    // the LONG/non-null contract enforced up front with real messages,
    // not via an opaque NPE inside the partition loop
    Seq(orderCol -> ordIdx, tieCol -> tieIdx).foreach { case (name, i) =>
      require(schema(i).dataType ==
        org.apache.spark.sql.types.LongType,
        s"topKPerKey: column '$name' must be LONG (exact-cents " +
          s"convention), got ${schema(i).dataType.sql}")
    }
    def longAt(row: Row, i: Int, name: String): Long = {
      if (row.isNullAt(i)) throw new IllegalArgumentException(
        s"topKPerKey: NULL in ordering column '$name' — supply " +
          "non-null order/tie values (a rank window would sort NULLs; " +
          "this operator's bounded heap deliberately rejects them)")
      row.getLong(i)
    }
    // larger (ord DESC, tie ASC) rank = better; heap evicts the worst
    val betterLast = Ordering.by[(Long, Long, Row), (Long, Long)] {
      case (o, t, _) => (-o, t)
    }
    val pruned = df.mapPartitions { it =>
      val heaps = scala.collection.mutable.HashMap
        .empty[Seq[Any], scala.collection.mutable.PriorityQueue[(Long, Long, Row)]]
      it.foreach { row =>
        val key = keyIdx.map(row.get)
        val h = heaps.getOrElseUpdate(key,
          scala.collection.mutable.PriorityQueue.empty(betterLast))
        h.enqueue((longAt(row, ordIdx, orderCol),
          longAt(row, tieIdx, tieCol), row))
        if (h.size > k) h.dequeue()  // drops the WORST (max of betterLast)
      }
      heaps.valuesIterator.flatMap(_.iterator.map(_._3))
    }(Encoders.row(schema))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol).desc, col(tieCol).asc)
    pruned.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }
}
