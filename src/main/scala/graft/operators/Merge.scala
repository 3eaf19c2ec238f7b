package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Batch MERGE: apply a keyed change set (op ∈ I/U/D) onto a snapshot in
 * ONE full-outer-join pass — the `MERGE INTO … WHEN MATCHED THEN
 * UPDATE/DELETE WHEN NOT MATCHED THEN INSERT` statement expressed on
 * plain DataFrames (no transactional table format required):
 *
 *  - change row present, op I/U → the change's values win (matched ⇒
 *    update; unmatched ⇒ insert — I and U collapse, upsert-style);
 *  - change row present, op D → the key disappears (a D for an absent
 *    key is a no-op, like MERGE's unmatched-source DELETE);
 *  - no change row → the snapshot row passes through.
 *
 * Contract: at most one change per key — compact a multi-version CDC
 * tail with [[CdcMaterializer.latestSnapshot]] first (that operator
 * owns intra-batch ordering; this one owns application).
 *
 * Scale shape: one shuffle of each side on the key (or a broadcast of
 * the change set when AQE sizes it small — the common case: changes ≪
 * snapshot). The full payload travels once; no window, no second pass.
 * At 100 TB with a partitioned snapshot, compose with
 * [[StreamSplitter.replayAll]]-style dynamic partition overwrite so
 * only partitions containing changed keys rewrite.
 */
object Merge {

  def mergeBatch(target: DataFrame, changes: DataFrame, key: String,
      opCol: String = "op"): DataFrame = {
    val dataCols = target.columns.toSeq.filterNot(_ == key)
    require(changes.columns.contains(opCol),
      s"changes must carry an '$opCol' column")
    target.as("t").join(changes.as("c"), Seq(key), "full_outer")
      // keep unless an explicit D arrived; a target-only row has NULL op
      // (NULL <> 'D' is NULL, hence the coalesce)
      .filter(coalesce(col(s"c.$opCol") =!= "D", lit(true)))
      .select(col(key) +: dataCols.map(cn =>
        when(col(s"c.$opCol").isNotNull, col(s"c.$cn"))
          .otherwise(col(s"t.$cn")).as(cn)): _*)
  }
}
