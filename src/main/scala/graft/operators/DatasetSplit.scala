package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/**
 * Deterministic train/val/test assignment by id hash — reproducible
 * across runs, engines, partitionings, and re-ingestions (rand-based
 * splits lose all four the moment data moves), and leakage-free by id:
 * one id, one split, forever.
 *
 * The optional `seed` folds into the hashed key (`len(id):id:seed`),
 * giving a DIFFERENT deterministic fold without touching ids — the
 * re-draw a user needs when leakage is found in the held-out set
 * (round-3 advice). Empty seed hashes the bare id, so existing
 * assignments are stable. The length prefix pins the id/seed boundary:
 * without it a string id containing ':' collides with another id under
 * a different seed (id "7:f" ∅-seed vs id "7" seed "f"), correlating
 * folds that must be independent.
 *
 * Zero shuffle: the assignment is a per-row projection; only whatever
 * rollup the caller adds pays an exchange.
 */
object DatasetSplit {

  /** 0..99 bucket for an id (portable 60-bit md5 hash, mod 100). */
  def bucket(idCol: Column, seed: String = ""): Column =
    PortableHash.h60(PortableHash.saltedKey(idCol, seed)) % 100

  /** 'train' (80%) / 'val' (10%) / 'test' (10%) label. NULL ids get a
    * NULL label, consistent with [[bucket]] — without the explicit
    * null branch, a null hash would fail both `when` guards and the
    * `otherwise` would silently label every unkeyed row 'test',
    * inflating the held-out split with exactly the rows that have no
    * stable identity. */
  def splitCol(idCol: Column, seed: String = ""): Column = {
    val b = bucket(idCol, seed)
    when(b.isNull, lit(null).cast("string"))
      .when(b < 80, "train").when(b < 90, "val").otherwise("test")
  }
}
