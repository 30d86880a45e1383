package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE cross-engine deterministic bucket: first 15 md5 hex chars of the
  * stringified id as a positive BIGINT (< 2^60), mod `modulus`.
  *
  * Every deterministic split in the engine (x7 shard, x9/d9 mixture
  * thresholds, x10 cluster shard) rides this one formula, because its
  * byte-identity with DuckDB's `('0x' || substr(md5(CAST(x AS VARCHAR)),
  * 1, 15))::BIGINT % m` is what the oracle parity of all of them rests
  * on — md5 (not xxhash64, whose seed is engine-specific), 15 hex chars
  * (so the value is positive by construction and fits a BIGINT), string
  * form of the id (so INT and BIGINT ids bucket identically).
  */
object Md5Bucket {
  def apply(id: Column, modulus: Int): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(modulus))
}
