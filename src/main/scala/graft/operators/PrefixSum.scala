package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed grouped prefix sum — the classic two-phase scan.
  *
  * `sum(valCol) OVER (PARTITION BY keyCol ORDER BY ordCols)` via a
  * window puts EVERY row of a key group through one task: fine for
  * high-cardinality keys, but a corpus keyed by `lang` has a handful of
  * giant groups, and the single task per group becomes the serial
  * bottleneck at 100 TB (the same shape the q63 packing fix removed).
  *
  * Here instead:
  *  1. range-repartition by (key, ord) and sort within partitions —
  *     each key group spans a RUN of partitions, each partition holds
  *     sorted runs of one or more groups;
  *  2. pass 1: per-partition per-key partial sums (a few rows per
  *     partition) collected to the driver;
  *  3. driver: offset(partition p, key k) = sum of k's partials in
  *     partitions before p — partitions × keys entries, tiny;
  *  4. pass 2: map-side running sum seeded from the broadcast offsets.
  *
  * Work is two linear passes over range-balanced partitions — no task
  * ever sees more than its partition, regardless of key skew. The
  * sorted intermediate is cached (registered under the dedup
  * signature-cache lifecycle) so pass 2 replays the cache, not the
  * sort, and both passes see the identical partition layout.
  *
  * Appends `cumCol` (long) to the input schema. `valCol` must be long;
  * ordering is (keyCol, ordCols...) ascending and must be total for a
  * deterministic result.
  */
object PrefixSum {

  def cumSumByKey(df: DataFrame, keyCol: String, ordCols: Seq[String],
      valCol: String, cumCol: String = "cum"): DataFrame = {
    val spark = df.sparkSession
    val sortCols = (keyCol +: ordCols).map(col)
    val sorted = graft.ext.Dedup.cached(
      df.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*))
    val schema = sorted.schema
    val keyIdx = schema.fieldIndex(keyCol)
    val valIdx = schema.fieldIndex(valCol)

    // pass 1: (partition, key) partial sums, in partition order
    val partials: Array[(Int, Seq[(Any, Long)])] =
      sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
        val acc = scala.collection.mutable.LinkedHashMap.empty[Any, Long]
        it.foreach { r =>
          val k = r.get(keyIdx)
          // null value contributes 0, matching SQL sum() null handling
          val v = if (r.isNullAt(valIdx)) 0L else r.getLong(valIdx)
          acc.update(k, acc.getOrElse(k, 0L) + v)
        }
        Iterator.single((pid, acc.toSeq))
      }.collect()

    // driver: running offset per key across partitions
    val offsets = scala.collection.mutable.HashMap.empty[(Int, Any), Long]
    val runningByKey = scala.collection.mutable.HashMap.empty[Any, Long]
    partials.sortBy(_._1).foreach { case (pid, ks) =>
      ks.foreach { case (k, s) =>
        offsets.update((pid, k), runningByKey.getOrElse(k, 0L))
        runningByKey.update(k, runningByKey.getOrElse(k, 0L) + s)
      }
    }
    val bcOffsets = spark.sparkContext.broadcast(offsets.toMap)

    // pass 2: map-side running sum seeded from the offsets
    val outRows = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var curKey: Any = null
      var started = false
      var run = 0L
      it.map { r =>
        val k = r.get(keyIdx)
        if (!started || k != curKey) {
          curKey = k
          started = true
          run = bcOffsets.value.getOrElse((pid, k), 0L)
        }
        run += (if (r.isNullAt(valIdx)) 0L else r.getLong(valIdx))
        Row.fromSeq(r.toSeq :+ run)
      }
    }
    spark.createDataFrame(outRows,
      StructType(schema.fields :+ StructField(cumCol, LongType, nullable = false)))
  }
}
