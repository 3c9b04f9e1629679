package graft.queries

/** Frozen aggregate of the deterministic 20k-sentence volume pipeline
  * (generator: graft.ais.Synth; values captured from a verified run and
  * pinned — any decode/geo regression breaks the hash).
  */
object AisVolumeOracle {
  val sql: String =
    "SELECT * FROM (VALUES (CAST(20000 AS BIGINT), CAST(321 AS BIGINT), CAST(285 AS BIGINT), CAST(20000 AS BIGINT))) AS t(n_positions, n_in_north, n_in_south, n_vessels)"
}
