package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic surrogate keys replacing the reference's `uuid.uuid4` row
  * ids (reference: models.py:19,35,58,94). Random UUIDs break re-run
  * determinism and differential testing (SURVEY.md §7.4.3); hashing the
  * natural key gives stable ids with no coordination — critical at scale,
  * where a sequence/identity column would serialize writers.
  */
object Keys {

  /** Portable hex surrogate key from the natural-key columns (md5 of the
    * ''-joined parts — md5 is identical across engines, so oracle
    * SQL can reproduce it). */
  def surrogateKey(parts: Column*): Column =
    md5(concat_ws("", parts.map(_.cast("string")): _*))

  /** 64-bit surrogate for join-heavy internal use (xxhash64 is codegen'd
    * and 8 bytes instead of 32 — prefer it when the key never needs to
    * match an external system). */
  def surrogateKey64(parts: Column*): Column =
    xxhash64(parts.map(_.cast("string")): _*)
}
