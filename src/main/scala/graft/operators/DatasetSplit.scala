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

  /** 'train' (80%) / 'val' (10%) / 'test' (10%) label. */
  def splitCol(idCol: Column, seed: String = ""): Column = {
    val b = bucket(idCol, seed)
    when(b < 80, "train").when(b < 90, "val").otherwise("test")
  }
}
