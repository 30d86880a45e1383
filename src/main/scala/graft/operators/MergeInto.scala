package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch MERGE with the full ANSI action matrix — the statement warehouses
  * (Delta/Iceberg `MERGE INTO`, SQL:2003 + the 2023 `NOT MATCHED BY SOURCE`
  * extension) run nightly at 100 TB, expressed as ONE full-outer join plus a
  * row-level decision calculus:
  *
  *   - matched, `matchedDelete`          → row dropped
  *   - matched, otherwise                → target row with `matchedUpdate`
  *                                         columns replaced
  *   - not matched (source-only)         → source row inserted
  *   - not matched by source, `staleDelete` → row dropped
  *   - not matched by source, otherwise  → target row kept byte-unchanged
  *
  * This generalizes the incremental family around it: [[graft.finance.TableStore.upsert]]
  * is the matrix with only update+insert, `mergeFieldwise` fixes the update
  * rule to coalesce-per-field, and a CDC apply (i6) is the matrix with
  * tombstone-driven deletes. Here all five actions are caller conditions.
  *
  * Condition/update columns are written against the JOINED schema: target
  * columns under their own names, non-key source columns under an `s_`
  * prefix. Conditions are evaluated null-safely (an unmatched side makes a
  * condition NULL → treated as false), so callers write plain predicates.
  *
  * Scale shape: one key-partitioned full-outer join — sort-merge at fact
  * scale, exchange-free when both sides are bucketed by the key
  * (io/Bucketing, the i5 posture) — then a codegen'd filter + projection.
  * No second pass, no driver state: the decision for every row is local to
  * its key's partition.
  */
object MergeInto {

  def apply(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      matchedDelete: Column = lit(false),
      matchedUpdate: Map[String, Column] = Map.empty,
      staleDelete: Column = lit(false)): DataFrame = {
    require(keys.nonEmpty, "MergeInto: at least one key column")
    require(target.columns.sameElements(source.columns),
      s"MergeInto: target/source schemas differ: " +
        s"${target.columns.mkString(",")} vs ${source.columns.mkString(",")}")
    require(matchedUpdate.keySet.subsetOf(target.columns.toSet -- keys),
      "MergeInto: matchedUpdate must name non-key target columns")

    val valueCols = target.columns.filterNot(keys.contains).toSeq
    val t = target.withColumn("_t_present", lit(true))
    val s = source
      .select(keys.map(col) ++
        valueCols.map(c => col(c).as(s"s_$c")) :+ lit(true).as("_s_present"): _*)
    // using-columns full outer join: Spark coalesces the key columns itself,
    // so key output needs no CASE
    val joined = t.join(s, keys, "full_outer")

    val matched = col("_t_present") && col("_s_present")
    val sourceOnly = col("_s_present") && col("_t_present").isNull
    val targetOnly = col("_t_present") && col("_s_present").isNull
    def truly(c: Column): Column = coalesce(c, lit(false))

    val keep = (matched && !truly(matchedDelete)) ||
      sourceOnly ||
      (targetOnly && !truly(staleDelete))

    val outCols = keys.map(col) ++ valueCols.map { c =>
      when(matched, matchedUpdate.getOrElse(c, col(c)))
        .when(sourceOnly, col(s"s_$c"))
        .otherwise(col(c))
        .as(c)
    }
    joined.filter(keep).select(outCols: _*)
  }
}
