package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Multi-fragment NMEA sentence reassembly (SURVEY R13): fragments of one
  * message share (packageId, channel) and arrive with packageNo 1..total;
  * the message is complete when all fragments are present
  * (ais_ingressServer.py:84-106; batch form ais_analysis_polars.py:342-358).
  *
  * Batch: groupBy (packageId, channel, total) + collect_list, emit groups
  * whose fragment count equals total — one shuffle keyed by session id;
  * fragment lists are tiny (total <= 9 by NMEA spec) so no skew risk.
  *
  * Streaming: flatMapGroupsWithState keyed the same way, with a processing
  * -time timeout so incomplete sessions are evicted — the reference leaks
  * this state forever; we bound it (SURVEY §7.4 item 3).
  */
object Reassembly {

  final case class Fragment(
      packageId: Int, channel: String, totalPackage: Int,
      packageNo: Int, sentence: String, tagblock: String)

  final case class Assembled(
      packageId: Int, channel: String, tagblock: String, sentences: Seq[String])

  /** Columns: parses raw sentence text into Fragment fields
    * (ais_analysis.py:255-263 field positions).
    */
  def parseFragments(lines: DataFrame): DataFrame = {
    val sentence = expr("substring(value, instr(value, '!'))")
    val tagblock = expr("substring(value, 1, greatest(instr(value, '!') - 1, 0))")
    lines
      .filter(col("value").contains("!"))
      .select(
        sentence.as("sentence"), tagblock.as("tagblock"),
        split(sentence, ",").as("f"))
      .select(
        coalesce(nullif(element_at(col("f"), 4), lit("")), lit("0"))
          .cast("int").as("packageId"),
        element_at(col("f"), 5).as("channel"),
        element_at(col("f"), 2).cast("int").as("totalPackage"),
        element_at(col("f"), 3).cast("int").as("packageNo"),
        col("sentence"), col("tagblock"))
  }

  /** Batch reassembly: single-fragment sentences pass through untouched;
    * multi-fragment groups assemble on (packageId, channel, total) with
    * fragments in order, tag block from fragment 1
    * (ais_ingressServer.py:93-94). Caveat vs streaming: packageId cycles
    * 0-9 in a live feed, so a batch spanning id reuse would need a
    * proximity key too — the streaming path (count-complete sessions)
    * handles that case.
    */
  def assembleBatch(fragments: DataFrame): DataFrame = {
    val singles = fragments
      .filter(col("totalPackage") === 1)
      .select(
        col("packageId"), col("channel"), col("tagblock"),
        array(col("sentence")).as("sentences"))
    val multis = fragments
      .filter(col("totalPackage") > 1)
      .groupBy(col("packageId"), col("channel"), col("totalPackage"))
      .agg(
        sort_array(collect_list(struct(col("packageNo"), col("sentence"), col("tagblock"))))
          .as("frags"))
      .filter(size(col("frags")) === col("totalPackage"))
      .select(
        col("packageId"), col("channel"),
        element_at(col("frags"), 1).getField("tagblock").as("tagblock"),
        expr("transform(frags, x -> x.sentence)").as("sentences"))
    singles.unionByName(multis)
  }

  /** Streaming reassembly. With `evictionTimeout` set, incomplete sessions
    * are evicted after the duration (production mode — note the engine
    * then fires empty micro-batches to service timers, so synchronous
    * tests should pass None); the reference leaks this state forever.
    */
  def assembleStream(
      fragments: Dataset[Fragment],
      evictionTimeout: Option[String] = None): Dataset[Assembled] = {
    val spark = fragments.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (evictionTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    // Single-fragment messages complete immediately and must NOT enter
    // keyed state: distinct messages routinely share a (packageId, channel)
    // key, and sessionizing them would conflate/drop them.
    val singles = fragments
      .filter(_.totalPackage == 1)
      .map(f => Assembled(f.packageId, f.channel, f.tagblock, Seq(f.sentence)))
    val multis = fragments
      .filter(_.totalPackage > 1)
      .groupByKey(f => (f.packageId, f.channel, f.totalPackage))
      .flatMapGroupsWithState[Seq[Fragment], Assembled](
        OutputMode.Append, timeoutConf) {
        case ((id, ch, total), frags, state: GroupState[Seq[Fragment]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val buf = (state.getOption.getOrElse(Seq.empty) ++ frags)
              .distinctBy(_.packageNo).sortBy(_.packageNo)
            if (buf.size >= total) {
              state.remove()
              Iterator.single(Assembled(id, ch, buf.head.tagblock, buf.map(_.sentence)))
            } else {
              state.update(buf)
              evictionTimeout.foreach(state.setTimeoutDuration)
              Iterator.empty
            }
          }
      }
    singles.union(multis)
  }
}
