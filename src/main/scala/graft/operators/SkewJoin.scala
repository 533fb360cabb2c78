package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual escape hatch for the one
  * skew shape AQE's runtime skew-join split cannot fix: a *low-cardinality*
  * join key (tens of distinct values over billions of rows), where every
  * partition of the hot key is still one reducer's problem because the key
  * itself, not the partition split, is the bottleneck.
  *
  * Mechanics (standard practice, cf. the AQE design doc's motivation and
  * Spark Summit skew-join folklore): the probe side tags each row with a
  * deterministic salt in [0, salts); the build side is exploded into
  * `salts` replicas, one per salt value; the join key becomes
  * (key…, __salt), multiplying the reduce-side parallelism of every hot key
  * by `salts` at the cost of replicating the (small-per-key) build rows.
  * The salt never leaks: it is dropped before the joined frame is returned,
  * so the rewrite is semantically invisible — same rows, same columns.
  *
  * Scale contract at 100 TB:
  *  - `salts` multiplies the BUILD side's row count — use this when the
  *    build side is per-key metadata (stats, configs, rate tables), not a
  *    second fact table. For fact×fact skew, AQE's skew split is the tool.
  *  - `saltOf` must distribute rows of the SAME key across salts, so it has
  *    to key off a row-level column (an id, a timestamp), never the join
  *    key itself — salting by the join key re-creates the hot partition.
  *    It should also be deterministic (no `rand()`) so retried tasks and
  *    replayed batches produce identical partitioning.
  */
object SkewJoin {

  private val SaltCol = "__salt"

  /** Join `probe` to `build` on `keys`, fanning each hot key across `salts`
    * reducers. `saltOf` derives the probe row's salt (cast to int, taken
    * mod `salts` defensively). Inner and left_outer joins are semantics-safe
    * under build-side replication; other types are rejected because
    * replicating the build side changes their row multiplicity.
    */
  def saltedEquiJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
      saltOf: Column, salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(Set("inner", "left", "left_outer").contains(joinType),
      s"build-side replication is only sound for inner/left joins, got $joinType")
    // pmod BEFORE the int cast: the salt source is typically a 64-bit id,
    // and casting it to int first overflows the moment ids pass 2³¹ — a
    // bug invisible at test scale that the 10× replica bench caught (ids
    // are key-offset per replica). The mod result is < salts, so the cast
    // is always safe. coalesce to 0 for a NULL salt source: pmod(null)
    // is null, and a null never equals any build-side replica's salt, so
    // without the fallback an inner join would silently DROP the row (and
    // a left join null-extend it) — diverging from the unsalted join this
    // operator is documented to be semantically identical to. Salting a
    // null-salt row to bucket 0 is always sound: the salt only spreads
    // rows, it never filters them.
    val p = probe.withColumn(SaltCol,
      coalesce(pmod(saltOf.cast("long"), lit(salts.toLong)), lit(0L)).cast("int"))
    val b = build.withColumn(SaltCol,
      explode(expr(s"sequence(0, ${salts - 1})")))
    p.join(b.hint("shuffle_merge"), keys :+ SaltCol, joinType).drop(SaltCol)
  }
}
