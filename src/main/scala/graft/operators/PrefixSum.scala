package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow, UnsafeProjection}
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
  * Both passes run over the INTERNAL row format
  * (`queryExecution.toRdd` + an unsafe projection for the appended
  * column) — the earlier `.rdd`/`createDataFrame(Row)` form paid an
  * interpreted external-Row decode of every field in pass 1 and a full
  * encode back in pass 2 (guide §1.4's warned conversion cost), pure
  * per-row overhead for two passes that only touch the key and one
  * long.
  *
  * **This operator is for LOW-cardinality keys** (languages, sources,
  * shards): the driver state is (partitions × keys). Keyed by `doc_id`
  * it would silently ship the corpus to the driver, so pass 1 FAILS
  * LOUDLY when any partition exceeds `maxKeysPerPartition` distinct
  * keys (range partitioning splits keys across partitions roughly
  * evenly, so per-partition distinct ≈ totalKeys / partitions; the
  * default 10k bounds driver state to ~partitions × 10k entries). For
  * high-cardinality keys use the window form — each group is small
  * there, which is exactly when the window is the right plan.
  *
  * **Determinism requirement**: correctness depends on pass 2 observing
  * the SAME partition layout pass 1's offsets were computed from. The
  * cache makes that hold; if the cache is dropped (explicit release,
  * executor loss) the lineage replays, and an input whose row order is
  * non-deterministic could make `repartitionByRange` re-sample
  * different bounds. Pass 2 therefore verifies each partition's row
  * count against pass 1's and throws rather than mis-seed offsets.
  * Inputs must be deterministic under recompute (parquet scans and
  * narrow transforms are; a prior `repartition()` round-robin is not).
  *
  * Appends `cumCol` (long) to the input schema. `valCol` must be long;
  * ordering is (keyCol, ordCols...) ascending and must be total for a
  * deterministic result.
  */
object PrefixSum {

  def cumSumByKey(df: DataFrame, keyCol: String, ordCols: Seq[String],
      valCol: String, cumCol: String = "cum",
      maxKeysPerPartition: Int = 10000): DataFrame = {
    val spark = df.sparkSession
    val sortCols = (keyCol +: ordCols).map(col)
    val sorted = graft.ext.Dedup.cached(
      df.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*))
    val schema = sorted.schema
    val keyIdx = schema.fieldIndex(keyCol)
    val keyType = schema(keyIdx).dataType
    val valIdx = schema.fieldIndex(valCol)
    val maxKeys = maxKeysPerPartition

    // pass 1: (partition, rowCount, key -> (partial sum, sawNonNull)),
    // in partition order. The seen-flag rides along so pass 2 can
    // reproduce SQL window-sum null semantics exactly: `sum() OVER` is
    // NULL until the frame holds its first non-null value — a key whose
    // leading rows are all null must emit NULL cums, not 0, even when
    // those rows span partitions. Keys are catalyst values copied out
    // of the (reused) scan rows; only the key and the long value are
    // ever read — no full-row decode.
    val partials: Array[(Int, Long, Seq[(Any, (Long, Boolean))])] =
      sorted.queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
        val acc =
          scala.collection.mutable.LinkedHashMap.empty[Any, (Long, Boolean)]
        var n = 0L
        it.foreach { r =>
          val k = InternalRow.copyValue(r.get(keyIdx, keyType))
          if (!acc.contains(k) && acc.size >= maxKeys)
            throw new IllegalStateException(
              s"PrefixSum.cumSumByKey: partition $pid holds > $maxKeys " +
                s"distinct '$keyCol' keys — this operator's driver state " +
                "is (partitions x keys) and is meant for low-cardinality " +
                "keys (lang, source). Use a window " +
                s"(sum over partitionBy($keyCol) orderBy ...) for " +
                "high-cardinality keys, or raise maxKeysPerPartition.")
          val isNull = r.isNullAt(valIdx)
          val v = if (isNull) 0L else r.getLong(valIdx)
          val (s0, seen0) = acc.getOrElse(k, (0L, false))
          acc.update(k, (s0 + v, seen0 || !isNull))
          n += 1
        }
        Iterator.single((pid, n, acc.toSeq))
      }.collect()

    // driver: running (offset, seen-any-non-null) per key across partitions
    val offsets = scala.collection.mutable.HashMap.empty[(Int, Any), (Long, Boolean)]
    val runningByKey = scala.collection.mutable.HashMap.empty[Any, (Long, Boolean)]
    partials.sortBy(_._1).foreach { case (pid, _, ks) =>
      ks.foreach { case (k, (s, seen)) =>
        val (run0, seen0) = runningByKey.getOrElse(k, (0L, false))
        offsets.update((pid, k), (run0, seen0))
        runningByKey.update(k, (run0 + s, seen0 || seen))
      }
    }
    val bcOffsets = spark.sparkContext.broadcast(offsets.toMap)
    val expectedCounts = spark.sparkContext.broadcast(
      partials.map(p => p._1 -> p._2).toMap)

    // pass 2: map-side running sum seeded from the offsets; the count
    // check detects a partition layout that diverged from pass 1
    // (cache dropped + non-deterministic lineage) before wrong cums
    // could escape silently. Output rows are the input row + cum,
    // assembled by an unsafe projection (one memcpy per row — the
    // .copy() is required because internalCreateDataFrame consumers
    // may buffer rows the projection would otherwise reuse).
    val outSchema =
      StructType(schema.fields :+ StructField(cumCol, LongType, nullable = true))
    val outRows = sorted.queryExecution.toRdd
      .mapPartitionsWithIndex { (pid, it) =>
        var curKey: Any = null
        var started = false
        var run = 0L
        var seen = false
        var n = 0L
        val expected = expectedCounts.value.getOrElse(pid, 0L)
        val proj = UnsafeProjection.create(outSchema)
        val cumRow = new GenericInternalRow(1)
        val joined = new JoinedRow()
        new Iterator[InternalRow] {
          def hasNext: Boolean = {
            val h = it.hasNext
            if (!h && n != expected)
              throw new IllegalStateException(
                s"PrefixSum.cumSumByKey: partition $pid saw $n rows in " +
                  s"pass 2 but $expected in pass 1 — the partition layout " +
                  "changed between passes (cached intermediate dropped over " +
                  "a non-deterministic input?). Re-run with a deterministic " +
                  "input; offsets cannot be trusted.")
            h
          }
          def next(): InternalRow = {
            val r = it.next()
            val k = r.get(keyIdx, keyType)
            if (!started || k != curKey) {
              curKey = InternalRow.copyValue(k)
              started = true
              val (off, seenBefore) =
                bcOffsets.value.getOrElse((pid, curKey), (0L, false))
              run = off
              seen = seenBefore
            }
            if (!r.isNullAt(valIdx)) {
              run += r.getLong(valIdx)
              seen = true
            }
            n += 1
            // SQL window-sum null semantics: NULL until the key's frame
            // holds its first non-null value, then nulls are ignored
            if (seen) cumRow.update(0, run) else cumRow.update(0, null)
            proj(joined(r, cumRow)).copy()
          }
        }
      }
    org.apache.spark.sql.graft.GraftExec
      .internalRowsToDf(spark, outRows, outSchema)
  }
}
