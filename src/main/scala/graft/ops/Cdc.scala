package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC CHANGELOG APPLICATION — materialize the current state of a table from
  * a base snapshot plus an I/U/D change stream (the Debezium/binlog-compaction
  * shape every warehouse ingests). Semantics: per key, the highest-`seqCol`
  * entry wins; a winning D removes the key; U on an absent key inserts it
  * (upsert semantics — each changelog row carries the FULL payload, the
  * row-image convention of CDC feeds, not a field-level patch).
  *
  * Scale shape: ONE hash aggregation. The base is unioned in as a
  * lowest-possible-seq insert and the winner per key is picked with
  * `max_by(payload_struct, seq)` — an associative/commutative aggregate, so
  * Spark computes it with map-side partial aggregation and a single shuffle
  * of pre-collapsed (key, winner) pairs. The window-function alternative
  * (row_number over key ORDER BY seq DESC) shuffles EVERY changelog row and
  * sorts each partition; at a 100 TB changelog the partial-agg form moves
  * only O(distinct keys per map task) bytes. No join, no sort.
  */
object Cdc {

  /** @param base        current snapshot (one row per key)
    * @param changelog   change rows: `keyCol`, `seqCol` (monotone per key),
    *                    `opCol` in {I,U,D}, and `payloadCols`
    * @param payloadCols full row image carried by every changelog entry
    */
  def applyChangelog(base: DataFrame, changelog: DataFrame, keyCol: String,
                     seqCol: String, opCol: String,
                     payloadCols: Seq[String]): DataFrame = {
    val baseAsLog = base.select(
      (col(keyCol) +: lit(Long.MinValue).as(seqCol) +: lit("I").as(opCol) +:
        payloadCols.map(col)): _*)
    val log = changelog.select(
      (col(keyCol) +: col(seqCol) +: col(opCol) +: payloadCols.map(col)): _*)
    baseAsLog.unionByName(log)
      .groupBy(col(keyCol))
      .agg(max_by(struct((opCol +: payloadCols).map(col): _*), col(seqCol)).as("__w"))
      .filter(col(s"__w.$opCol") =!= "D")
      .select(col(keyCol) +: payloadCols.map(c => col(s"__w.$c").as(c)): _*)
  }
}
