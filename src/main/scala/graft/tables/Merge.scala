package graft.tables

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And => CatAnd, EqualNullSafe => CatEqualNullSafe, EqualTo => CatEqualTo, Expression => CatExpr}

/** Join-classified MERGE: the engine's replacement for Delta Lake's
  * `DeltaTable.merge(...).whenMatchedUpdate/Delete(...).whenNotMatchedInsert(...)
  * .execute()` chain that every mutating reference operator drives
  * (type_2_scd_generic_upsert mack/__init__.py:125-139, kill_duplicates :190-192,
  * drop_duplicates_pkey :253-255, append_without_duplicates :410-412).
  *
  * Semantics (matching Delta):
  *  - clauses are evaluated in declaration order; the first clause whose
  *    condition is satisfied (three-valued logic: NULL = not satisfied)
  *    applies; rows matching no clause pass through unchanged (matched) or
  *    are ignored (not matched);
  *  - a target row matched by more than one source row is an error when any
  *    whenMatched clause exists (Delta's multiple-source-row-match error);
  *  - condition / set-expression strings resolve against the aliases given
  *    with `as(...)` — including sources containing deliberately
  *    non-matching rows, e.g. the SCD2 NULL-mergeKey staging pattern
  *    (mack/__init__.py:107-114).
  *
  * Execution shape (scale rationale): one equi-ish join target⋈source on the
  * merge condition classifies every row as matched / target-only /
  * source-only; the result table is then `unchanged ∪ rewritten ∪ inserted`.
  * Matched rows are found with an inner join (Catalyst picks broadcast when
  * the source — usually a small staged-updates frame — fits, else
  * shuffle-hash/SMJ with AQE), unchanged rows with a left-anti join on the
  * same keys, so the target is scanned at most twice and shuffled on the
  * merge key only — the same asymptotics as Delta's MergeIntoCommand
  * find-touched-files + rewrite, minus file-level pruning.
  */
object Merge {

  /** Outcome of the file-granular pruning analysis ([[Builder.filePrunePlan]]). */
  private[tables] sealed trait FilePrune
  private[tables] object FilePrune {
    /** Empty source: the merge is a no-op, nothing to commit. */
    case object NoOp extends FilePrune
    /** Pruning can't help; caller falls back to a full overwrite. */
    case object Fallback extends FilePrune
    /** Only `touched` files need rewriting; `keyFilters` are the bounds
      * filters that selected them (also the conflict predicate for
      * concurrently-added files).
      */
    final case class Pruned(touched: Seq[FileStat],
                            keyFilters: Seq[Seq[FileStat] => Seq[FileStat]])
      extends FilePrune
  }

  /** Above this many touched partitions a pruned merge falls back to a
    * full overwrite: the per-partition commit bookkeeping and the isin
    * predicate stop paying for themselves when most of the table is
    * touched anyway.
    */
  val maxPrunedPartitions: Int = 1000

  /** Above this many distinct source merge-key values, file pruning falls
    * back from per-value overlap to the source's [min, max] range.
    */
  val maxPrunedMergeKeys: Int = 10000

  sealed trait Clause { def condition: Option[String] }
  final case class Update(condition: Option[String], set: Map[String, String]) extends Clause
  final case class UpdateAll(condition: Option[String]) extends Clause
  final case class Delete(condition: Option[String]) extends Clause
  final case class Insert(condition: Option[String], values: Map[String, String]) extends Clause
  final case class InsertAll(condition: Option[String]) extends Clause

  final case class Builder(
      target: DataFrame, targetAlias: String,
      source: DataFrame, sourceAlias: String,
      mergeCondition: Column,
      matched: Seq[Clause] = Nil, notMatched: Seq[Clause] = Nil,
      notMatchedBySource: Seq[Clause] = Nil,
      evolveSchema: Boolean = false,
      txn: Option[(String, Long)] = None) {

    def whenMatchedUpdate(condition: String, set: Map[String, String]): Builder =
      copy(matched = matched :+ Update(Option(condition), set))
    def whenMatchedUpdate(set: Map[String, String]): Builder =
      copy(matched = matched :+ Update(None, set))
    def whenMatchedUpdateAll(): Builder =
      copy(matched = matched :+ UpdateAll(None))
    def whenMatchedDelete(): Builder =
      copy(matched = matched :+ Delete(None))
    def whenMatchedDelete(condition: String): Builder =
      copy(matched = matched :+ Delete(Option(condition)))
    def whenNotMatchedInsert(values: Map[String, String]): Builder =
      copy(notMatched = notMatched :+ Insert(None, values))
    def whenNotMatchedInsert(condition: String, values: Map[String, String]): Builder =
      copy(notMatched = notMatched :+ Insert(Option(condition), values))
    def whenNotMatchedInsertAll(): Builder =
      copy(notMatched = notMatched :+ InsertAll(None))

    // WHEN NOT MATCHED BY SOURCE (Delta 2.3): clauses over TARGET rows
    // with no source match — the standard way a merge syncs deletions or
    // ages out rows the source no longer carries. Conditions and set
    // expressions may reference target columns only (there is no source
    // row to read).
    def whenNotMatchedBySourceUpdate(set: Map[String, String]): Builder =
      copy(notMatchedBySource = notMatchedBySource :+ Update(None, set))
    def whenNotMatchedBySourceUpdate(condition: String,
                                     set: Map[String, String]): Builder =
      copy(notMatchedBySource = notMatchedBySource :+ Update(Option(condition), set))
    def whenNotMatchedBySourceDelete(): Builder =
      copy(notMatchedBySource = notMatchedBySource :+ Delete(None))
    def whenNotMatchedBySourceDelete(condition: String): Builder =
      copy(notMatchedBySource = notMatchedBySource :+ Delete(Option(condition)))

    /** Opt in to MERGE schema evolution (Delta's
      * `DeltaMergeBuilder.withSchemaEvolution` /
      * `delta.schema.autoMerge`): update/insert clauses may then
      * introduce columns the target lacks — explicit `set`/`values` keys,
      * or any extra source column under `updateAll`/`insertAll` — and the
      * target schema becomes the union (new columns forced nullable,
      * pre-existing rows read back NULL). Without this, an unknown clause
      * column raises, as Delta's analyzer does.
      */
    def withSchemaEvolution(): Builder = copy(evolveSchema = true)

    /** Idempotent-replay protection (the MERGE counterpart of
      * [[ManagedTable.append]]'s `txn`): the (appId, version) marker
      * rides the SAME commit as the merge's data, and a merge whose
      * marker is already recorded at or above `version` is an O(1)
      * property-read no-op — a streaming MERGE sink replaying a
      * micro-batch after a crash between sink commit and checkpoint
      * commit re-lands exactly once.
      */
    def withTxn(appId: String, version: Long): Builder =
      copy(txn = Some((appId, version)))

    /** The columns this merge would ADD to the target under
      * [[withSchemaEvolution]]: extra source fields (when an
      * updateAll/insertAll clause copies the whole source row) plus
      * explicit clause keys not in the target, typed by resolving their
      * expression against the joined aliases (plan-only, no execution).
      */
    private def evolvedFields(): Seq[org.apache.spark.sql.types.StructField] = {
      val have = target.columns.toSet
      val fromAll =
        if (matched.exists(_.isInstanceOf[UpdateAll]) ||
            notMatched.exists(_.isInstanceOf[InsertAll]))
          source.schema.fields.toSeq.filterNot(f => have(f.name))
        else Nil
      val keyed = (matched.collect { case Update(_, set) => set } ++
        notMatchedBySource.collect { case Update(_, set) => set } ++
        notMatched.collect { case Insert(_, values) => values })
        .flatten.filterNot { case (k, _) => have(k) }
      lazy val j = target.alias(targetAlias)
        .join(source.alias(sourceAlias), mergeCondition, "inner")
      val keyedFields = keyed.map { case (k, e) =>
        j.select(expr(e).as(k)).schema.head.copy(nullable = true)
      }
      (fromAll ++ keyedFields)
        .foldLeft(Vector.empty[org.apache.spark.sql.types.StructField]) {
          (acc, f) => if (acc.exists(_.name == f.name)) acc else acc :+ f
        }
    }

    /** CDC sidecar for this merge when the table captures change data
      * (see [[changesFrame]]); Nil otherwise. Called on the PRUNED
      * builder so the capture pass reads only the touched files.
      */
    private def cdcFor(table: ManagedTable,
                       base: ManagedTable.LogEntry): Seq[String] =
      if (!table.cdfEnabled(base)) Nil
      else table.writeCdcSidecar(changesFrame(), base.schema)

    /** Pure core: the post-merge table contents as a DataFrame. */
    def result(): DataFrame =
      if (!evolveSchema) run()
      else {
        val widened = evolvedFields().foldLeft(target)((df, f) =>
          df.withColumn(f.name, lit(null).cast(f.dataType)))
        copy(target = widened, evolveSchema = false).run()
      }

    /** Shell: apply the merge to `table`. When the table is partitioned
      * and the merge condition binds every partition column to the source
      * side (`base.p = src.p`), only the partitions present in the source
      * are recomputed and committed ([[ManagedTable.overwritePartitions]]);
      * untouched partitions keep their existing files — the difference
      * between a 1-row SCD2 upsert rewriting one partition and rewriting
      * 100 TB (Delta's find-touched-files pruning, at partition
      * granularity). Falls back to a full snapshot overwrite whenever
      * pruning can't be proven safe (unbound partition columns, update/
      * insert clauses that could move rows across partitions, or more
      * than [[Merge.maxPrunedPartitions]] touched partitions).
      */
    /** The snapshot version this merge is computed against, captured at
      * [[execute]] entry. Every commit path below passes it down so a
      * concurrent commit landing mid-merge is REBASED over when provably
      * disjoint (other partitions / other files) and raises
      * [[ConcurrentCommitException]] otherwise — never a silent
      * last-writer-wins at the snapshot level.
      */
    def execute(table: ManagedTable): Unit = {
      if (txn.exists { case (app, v) =>
            table.txnVersion(app).exists(_ >= v) }) return
      if (evolveSchema) {
        val extra = evolvedFields()
        if (extra.nonEmpty) {
          // widen FIRST as its own ADD COLUMNS commit, then merge
          // normally against the widened snapshot: the storage layer's
          // null-fill read makes untouched old files correct without a
          // rewrite, and every pruned commit path below keeps working
          // because the schema it aligns to now includes the new columns
          table.addColumns(extra)
          copy(target = table.toDF, evolveSchema = false).execute(table)
          return
        }
      }
      // One snapshot read: the entry the plan is built from IS the commit
      // base, so a commit landing mid-merge can never make the pruning
      // analysis (newer snapshot) disagree with the conflict check (older
      // base) — which would raise a spurious ConcurrentCommitException.
      val base = table.latestEntry
      val baseVersion = base.version
      if (notMatchedBySource.nonEmpty) {
        // pruning is keyed off the MATCHED side; a bySource clause can
        // touch an unmatched row in ANY file or partition, so keeping
        // files/partitions verbatim is unsound — the merge is a full
        // rewrite by semantics (Delta pays the same shape)
        table.overwriteFrom(baseVersion, run(), "MERGE",
          cdc = cdcFor(table, base), txn = txn)
        return
      }
      val parts = base.partitionColumns
      val bindings = parts.flatMap(p => partitionBinding(p).map(p -> _)).toMap
      if (parts.nonEmpty && bindings.size == parts.length &&
          clausesPreservePartitions(parts, bindings)) {
        // partition-path suffix matching relies on toString equalling
        // Spark's written directory names — true for strings, integrals,
        // booleans and dates, NOT timestamps/decimals/floats; fall back
        // rather than risk a (safely-rejected but failing) suffix mismatch.
        // Decided from the table SCHEMA's partition column types, not from
        // collected values: a NULL in the first row would otherwise pass
        // the check and a later non-null timestamp hard-fail a valid merge.
        import org.apache.spark.sql.types._
        val suffixSafe = parts.forall(p => base.schema(p).dataType match {
          case StringType | IntegerType | LongType | ShortType | ByteType |
               BooleanType | DateType => true
          case _ => false
        })
        if (!suffixSafe) {
          // timestamp/decimal partition columns can't partition-prune,
          // but the merge keys' file bounds may still prune
          if (!executeFilePruned(table, base))
            table.overwriteFrom(baseVersion, run(), "MERGE",
              cdc = cdcFor(table, base), txn = txn)
          return
        }
        val valueCols = parts.map(p => GraftColumnBridge.column(bindings(p)).as(p))
        val rows = source.alias(sourceAlias).select(valueCols: _*).distinct()
          .limit(maxPrunedPartitions + 1).collect()
        if (rows.isEmpty) return // empty source: merge is a no-op
        if (rows.length > maxPrunedPartitions) {
          // too many partitions to enumerate; fall to file granularity
          if (!executeFilePruned(table, base))
            table.overwriteFrom(baseVersion, run(), "MERGE",
              cdc = cdcFor(table, base), txn = txn)
          return
        }
        val values = rows.map(r =>
          parts.zipWithIndex.map { case (p, i) => p -> r.get(i) }.toMap).toSeq
        // null-SAFE matching: isin never matches NULL, which would silently
        // drop a null-partition's unmatched target rows from the rewrite
        val pred =
          if (parts.length == 1) {
            val (nulls, nonNulls) = values.map(_(parts.head)).partition(_ == null)
            val in =
              if (nonNulls.isEmpty) lit(false)
              else col(parts.head).isin(nonNulls: _*)
            if (nulls.nonEmpty) in || col(parts.head).isNull else in
          } else
            values.map(m => parts.map(p => col(p) <=> lit(m(p))).reduce(_ && _))
              .reduce(_ || _)
        val pruned = copy(target = target.filter(pred))
        table.overwritePartitions(pruned.run(), values, operation = "MERGE",
          baseVersion = baseVersion, cdc = pruned.cdcFor(table, base),
          txn = txn)
      } else if (executeFilePruned(table, base)) {
        // file-granular path committed (or proved the merge a no-op)
      } else {
        table.overwriteFrom(baseVersion, run(), "MERGE",
              cdc = cdcFor(table, base), txn = txn)
      }
    }

    /** File-granular MERGE (Delta's find-touched-files): files whose
      * min/max bounds on an equi-bound merge-key column are disjoint from
      * every source key cannot hold a matched row, so they are kept
      * verbatim and only the touched files' rows are re-run through the
      * merge. Works on partitioned tables too (partition values
      * contribute bounds, and the rewrite is written back partitioned) —
      * the path a merge takes when its condition does NOT bind the
      * partition columns, where the alternative would be a full-table
      * overwrite. Unlike partition pruning this needs NO clause analysis:
      * untouched rows pass through `run()` unchanged wherever they live,
      * so keeping their files is the same result by construction —
      * updates/inserts always land in new files.
      * Returns false (caller falls back to a full overwrite) when the
      * table has no stats, no conjunct equi-binds a skippable column, the
      * source is too large to enumerate, or pruning removes nothing.
      *
      * Assumes `target` is the table's current snapshot (as every
      * `execute` path does — the pruned target is re-read from the table).
      */
    private def executeFilePruned(table: ManagedTable,
                                  base: ManagedTable.LogEntry): Boolean =
      filePrunePlan(base) match {
        case FilePrune.NoOp => true
        case FilePrune.Fallback => false
        case FilePrune.Pruned(touched, keyFilters) =>
          val touchedSet = touched.map(_.path).toSet
          val pruned = copy(target = table.scanFilesDF(touched, base))
          val result = pruned.run()
          // Delta's ConcurrentAppendException rule, made precise: a
          // concurrently-added file conflicts only if this merge WOULD
          // have read it — i.e. it survives the same key-bounds filters
          // that selected the touched files. A blind append with
          // provably-disjoint key bounds commutes (both commits land).
          table.replaceFiles(touchedSet, result, operation = "MERGE",
            base = base,
            addedMayMatch = added =>
              keyFilters.foldLeft(added)((fs, f) => f(fs)).nonEmpty,
            cdc = pruned.cdcFor(table, base), txn = txn)
          true
      }

    /** The file-granular pruning decision, separated from the commit so the
      * conflict predicate it implies is unit-testable: NoOp (empty source —
      * the merge changes nothing), Fallback (can't prune: no stats, no
      * usable equi-binding, or pruning removed nothing), or Pruned with the
      * surviving files AND the per-binding bounds filters that selected
      * them (reused as `addedMayMatch` against concurrent appends).
      */
    private[tables] def filePrunePlan(base: ManagedTable.LogEntry): FilePrune = {
      val files = base.files
      if (files.size < 2) return FilePrune.Fallback
      val schema = base.schema
      val usable = equiBindings.filter { case (name, _, _) =>
        schema.fields.exists(f => f.name.equalsIgnoreCase(name) &&
          FileStats.skippable(f.dataType))
      }
      if (usable.isEmpty) return FilePrune.Fallback
      var touched = files
      var pruned = false
      val keyFilters = Seq.newBuilder[Seq[FileStat] => Seq[FileStat]]
      // cumulative pruning over the first two usable bindings (each costs
      // one small driver-side collect of the source's key values)
      usable.take(2).foreach { case (name, srcExpr, nullSafe) =>
        val kCol = GraftColumnBridge.column(srcExpr)
        val vals = source.alias(sourceAlias)
          .select(kCol)
          .distinct().limit(maxPrunedMergeKeys + 1).collect().map(_.get(0))
        if (vals.isEmpty) return FilePrune.NoOp // empty source: no-op merge
        // <=> with a NULL source key matches NULL target rows, whose files'
        // min/max bounds cannot locate — such a binding can't prune.
        if (nullSafe && vals.contains(null)) {
          // this binding can't prune (see above)
        } else if (vals.length > maxPrunedMergeKeys) {
          // Too many keys to enumerate: prune by the source's key RANGE.
          // Past the enumeration cap the distinct() sample may MISS a NULL
          // (and min/max ignore NULLs), so under <=> the same aggregation
          // also counts NULL keys — one job answers both questions;
          // otherwise a file holding only NULL-key rows would be pruned
          // and its matched updates silently skipped.
          val r = source.alias(sourceAlias)
            .agg(org.apache.spark.sql.functions.min(kCol),
              org.apache.spark.sql.functions.max(kCol),
              count(when(kCol.isNull, lit(1)))).head()
          val nullSafeNullKey = nullSafe && r.getLong(2) > 0
          if (!nullSafeNullKey && !r.isNullAt(0)) {
            val lo = r.get(0)
            val hi = r.get(1)
            keyFilters += (fs => FileStats.overlappingRange(fs, schema, name, lo, hi))
            val next = FileStats.overlappingRange(touched, schema, name, lo, hi)
            if (next.size < touched.size) { touched = next; pruned = true }
          }
        } else {
          val nonNull = vals.filter(_ != null).toSeq
          keyFilters += (fs => FileStats.overlapping(fs, schema, name, nonNull))
          val next = FileStats.overlapping(touched, schema, name, nonNull)
          if (next.size < touched.size) { touched = next; pruned = true }
        }
      }
      if (!pruned) FilePrune.Fallback
      else FilePrune.Pruned(touched, keyFilters.result())
    }

    /** Every conjunct of the merge condition equi-binding a target column
      * to a source-only expression: (columnName, sourceExpr, viaNullSafe).
      */
    private def equiBindings: Seq[(String, CatExpr, Boolean)] = {
      def targetAttrName(e: CatExpr): Option[String] = e match {
        case a: UnresolvedAttribute
          if a.nameParts.length == 2 &&
            a.nameParts.head.equalsIgnoreCase(targetAlias) =>
          Some(a.nameParts(1))
        case _ => None
      }
      conjuncts(GraftColumnBridge.parsedExpression(mergeCondition)).flatMap {
        case CatEqualTo(l, r) if targetAttrName(l).isDefined && sourceOnly(r) =>
          Some((targetAttrName(l).get, r, false))
        case CatEqualTo(l, r) if targetAttrName(r).isDefined && sourceOnly(l) =>
          Some((targetAttrName(r).get, l, false))
        case CatEqualNullSafe(l, r) if targetAttrName(l).isDefined && sourceOnly(r) =>
          Some((targetAttrName(l).get, r, true))
        case CatEqualNullSafe(l, r) if targetAttrName(r).isDefined && sourceOnly(l) =>
          Some((targetAttrName(r).get, l, true))
        case _ => None
      }
    }

    // -- partition-pruning analysis --------------------------------------

    private def conjuncts(e: CatExpr): Seq[CatExpr] = e match {
      case CatAnd(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    private def isTargetAttr(e: CatExpr, p: String): Boolean = e match {
      case a: UnresolvedAttribute =>
        a.nameParts.length == 2 &&
          a.nameParts.head.equalsIgnoreCase(targetAlias) &&
          a.nameParts(1).equalsIgnoreCase(p)
      case _ => false
    }
    private def isSourceAttr(e: CatExpr, name: String): Boolean = e match {
      case a: UnresolvedAttribute =>
        a.nameParts.length == 2 &&
          a.nameParts.head.equalsIgnoreCase(sourceAlias) &&
          a.nameParts(1).equalsIgnoreCase(name)
      case _ => false
    }
    private def sourceOnly(e: CatExpr): Boolean =
      e.collect { case a: UnresolvedAttribute => a }.forall(a =>
        a.nameParts.length >= 2 && a.nameParts.head.equalsIgnoreCase(sourceAlias))

    /** The source-side expression an equi-conjunct of the merge condition
      * binds target partition column `p` to, if any. Null-safe equality
      * (`<=>`, the natural form for nullable partition keys) binds too.
      */
    private def partitionBinding(p: String): Option[CatExpr] =
      conjuncts(GraftColumnBridge.parsedExpression(mergeCondition)).collectFirst {
        case CatEqualTo(l, r) if isTargetAttr(l, p) && sourceOnly(r) => r
        case CatEqualTo(l, r) if isTargetAttr(r, p) && sourceOnly(l) => l
        case CatEqualNullSafe(l, r) if isTargetAttr(l, p) && sourceOnly(r) => r
        case CatEqualNullSafe(l, r) if isTargetAttr(r, p) && sourceOnly(l) => l
      }

    /** Pruning is only safe when no clause can write a row whose partition
      * value differs from the bound source expression: updates must not
      * touch partition columns; UpdateAll/InsertAll copy `src.p`, which is
      * provably in-scope only when the binding IS `src.p`; explicit insert
      * values must equal the binding. (overwritePartitions additionally
      * hard-fails on any out-of-scope row, so a gap here surfaces as an
      * error, never as silent corruption.)
      */
    private def clausesPreservePartitions(parts: Seq[String],
                                          bindings: Map[String, CatExpr]): Boolean = {
      def bindingIsSourceCopy(p: String) = isSourceAttr(bindings(p), p)
      val matchedOk = matched.forall {
        case Update(_, set) =>
          parts.forall(p => !set.keySet.exists(_.equalsIgnoreCase(p)))
        case UpdateAll(_) => parts.forall(bindingIsSourceCopy)
        case Delete(_) => true
        case _ => false
      }
      val insertOk = notMatched.forall {
        case InsertAll(_) => parts.forall(bindingIsSourceCopy)
        case Insert(_, values) => parts.forall { p =>
          values.collectFirst {
            case (k, v) if k.equalsIgnoreCase(p) => v
          }.exists(v => GraftColumnBridge.parsedExpression(expr(v)) == bindings(p))
        }
        case _ => false
      }
      matchedOk && insertOk
    }

    // -- implementation --------------------------------------------------

    /** Row-identity column. `monotonically_increasing_id` is deterministic
      * for a fixed scan partitioning (partitionId << 33 | offset), which
      * holds within one action over an immutable parquet snapshot; Delta
      * itself identifies touched rows by (file, rowIndex) — the same idea.
      */
    private val RID = "__graft_merge_rid"

    private val mIdx = "__graft_clause"

    // first-matching-clause index over the matched pairs (NULL = no clause)
    private def clauseIdx(clauses: Seq[Clause]): Column =
      clauses.zipWithIndex.foldRight(lit(null).cast("int")) {
        case ((c, i), acc) =>
          c.condition match {
            case Some(cond) => when(expr(cond), lit(i)).otherwise(acc)
            case None       => lit(i) // unconditional: always matches from here
          }
      }

    /** Matched (target, source) pairs classified by first applicable
      * `whenMatched` clause (`mIdx` NULL = pass-through). Multi-match
      * detection (Delta's multiple-source-row-match error) is folded in:
      * a window count per target row id plus an in-plan assertion. One
      * job, no extra scan of the target — the shuffle is only over the
      * matched pairs (≈ the touched rows), which is the small side of a
      * merge at scale. The assertion rides in a filter predicate so
      * column pruning cannot drop it.
      */
    private def classifiedMatches(t: DataFrame, s: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col(RID))
      t.join(s, mergeCondition, "inner")
        .withColumn("__graft_match_n", count(lit(1)).over(w))
        .filter(assert_true(col("__graft_match_n") <= 1,
          lit("MERGE: a target row was matched by multiple source rows; " +
            "the merge condition must identify at most one source row " +
            "per target row")).isNull)
        .drop("__graft_match_n")
        .withColumn(mIdx, clauseIdx(matched))
    }

    // matched rows: per-clause rewrite, unchanged when no clause applies
    private def targetColumn(name: String): Column = {
      val base = col(s"$targetAlias.$name")
      matched.zipWithIndex.foldLeft(base) { case (acc, (cl, i)) =>
        cl match {
          case Update(_, set) =>
            val e = set.get(name).map(expr).getOrElse(base)
            when(col(mIdx) === i, e).otherwise(acc)
          case UpdateAll(_) =>
            when(col(mIdx) === i, col(s"$sourceAlias.$name")).otherwise(acc)
          case Delete(_) => acc // handled by filter in run()
          case _ => acc
        }
      }
    }

    /** Source rows with no target match, projected through the first
      * applicable insert clause.
      */
    private def insertedFrame(t: DataFrame, s: DataFrame,
                              targetCols: Seq[String]): DataFrame =
      if (notMatched.isEmpty) emptyLike(targetCols)
      else {
        val unmatchedSrc = s.join(t, mergeCondition, "left_anti")
        val idx = unmatchedSrc.withColumn(mIdx, clauseIdx(notMatched))
          .filter(col(mIdx).isNotNull)
        val perClause = notMatched.zipWithIndex.map {
          case (Insert(_, values), i) =>
            idx.filter(col(mIdx) === i).select(targetCols.map { c =>
              values.get(c).map(expr).getOrElse(lit(null)).as(c)
            }: _*)
          case (InsertAll(_), i) =>
            idx.filter(col(mIdx) === i).select(targetCols.map { c =>
              col(s"$sourceAlias.$c").as(c)
            }: _*)
          case (other, _) =>
            throw new IllegalArgumentException(
              s"whenNotMatched only supports insert clauses, got $other")
        }
        perClause.reduce(_ unionByName _)
      }

    // align frame types to the target schema
    private def align(df: DataFrame): DataFrame = {
      val schema = target.schema
      df.select(schema.fields.map(f =>
        col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
    }

    private def run(): DataFrame = {
      val targetCols = target.columns.toSeq
      // Delta's analyzer rejects clause columns the target lacks unless
      // schema evolution is on (they would otherwise be silently dropped
      // by the name-keyed projections below)
      val unknown = (matched.collect { case Update(_, set) => set.keys } ++
        notMatchedBySource.collect { case Update(_, set) => set.keys } ++
        notMatched.collect { case Insert(_, values) => values.keys })
        .flatten.filterNot(targetCols.contains).toSeq.distinct
      if (unknown.nonEmpty)
        throw new graft.GraftTypeError(
          s"MERGE clause refers to columns not in the target table: " +
            s"${unknown.mkString(", ")} (use withSchemaEvolution() to add them)")
      val t = target.withColumn(RID, monotonically_increasing_id()).alias(targetAlias)
      val s = source.alias(sourceAlias)

      val rewritten: DataFrame = if (matched.isEmpty) {
        // Insert-only merge: matched target rows pass through unchanged,
        // exactly once each — a left_semi join, NOT the inner-join pairs
        // (which would emit a target row once per matching source row;
        // Delta passes such rows through once and skips the multi-match
        // error when no whenMatched clause exists).
        t.join(s, mergeCondition, "left_semi").select(targetCols.map(col): _*)
      } else {
        val classified = classifiedMatches(t, s)
        val deleteIdxs = matched.zipWithIndex.collect { case (Delete(_), i) => i }
        val kept = deleteIdxs.foldLeft(classified) { (df, i) =>
          df.filter(col(mIdx).isNull || col(mIdx) =!= i)
        }
        kept.select(targetCols.map(c => targetColumn(c).as(c)): _*)
      }

      val untouched = untouchedFrame(t, s, targetCols)

      val inserted = insertedFrame(t, s, targetCols)

      align(untouched).union(align(rewritten)).union(align(inserted))
    }

    /** Target rows with no source match: pass through verbatim, unless
      * `whenNotMatchedBySource` clauses classify them (first applicable
      * clause wins, like the matched side) — deletes drop, updates
      * rewrite from target columns only.
      */
    private def untouchedFrame(t: DataFrame, s: DataFrame,
                               targetCols: Seq[String]): DataFrame = {
      val untouched = t.join(s, mergeCondition, "left_anti")
      if (notMatchedBySource.isEmpty)
        untouched.select(targetCols.map(col): _*)
      else {
        val idx = untouched.withColumn(mIdx, clauseIdx(notMatchedBySource))
        val deleteIdxs = notMatchedBySource.zipWithIndex.collect {
          case (Delete(_), i) => i
        }
        val kept = deleteIdxs.foldLeft(idx) { (df, i) =>
          df.filter(col(mIdx).isNull || col(mIdx) =!= i)
        }
        kept.select(targetCols.map(c => bySourceColumn(c).as(c)): _*)
      }
    }

    // untouched rows: per-bySource-clause rewrite (target columns only)
    private def bySourceColumn(name: String): Column = {
      val base = col(s"$targetAlias.$name")
      notMatchedBySource.zipWithIndex.foldLeft(base) { case (acc, (cl, i)) =>
        cl match {
          case Update(_, set) =>
            val e = set.get(name).map(expr).getOrElse(base)
            when(col(mIdx) === i, e).otherwise(acc)
          case _ => acc // Delete handled by filter in untouchedFrame
        }
      }
    }

    /** The labeled net change rows this merge produces (Delta CDF's MERGE
      * semantics — richer than the snapshot-diff derivation, which can
      * only approximate update rows as delete+insert pairs):
      * Delete-clause matches surface their pre-image as `'delete'`,
      * Update/UpdateAll matches their net pre/post pair as
      * `'update_preimage'`/`'update_postimage'` (value-identical rewrites
      * cancel, the same rule as the DML capture), insert clauses as
      * `'insert'`. Pass-through rows (no clause applies) emit nothing —
      * they cancel in the derivation too, so sidecar ≡ derived feed as
      * multisets modulo the update labels. Built from the same join
      * classification as the result; an extra bounded pass over the
      * (pruned) target, run only when the table captures CDC.
      */
    private def changesFrame(): DataFrame = {
      val targetCols = target.columns.toSeq
      val ct = "_change_type"
      val t = target.withColumn(RID, monotonically_increasing_id()).alias(targetAlias)
      val s = source.alias(sourceAlias)
      val inserted = align(insertedFrame(t, s, targetCols))
        .withColumn(ct, lit("insert"))
      // bySource clauses change UNMATCHED rows — capture their deletes
      // and net pre/post pairs from the same anti-join classification
      val bySource: Seq[DataFrame] =
        if (notMatchedBySource.isEmpty) Nil
        else {
          val idx = t.join(s, mergeCondition, "left_anti")
            .withColumn(mIdx, clauseIdx(notMatchedBySource))
          val delIdxs = notMatchedBySource.zipWithIndex.collect {
            case (Delete(_), i) => i
          }
          val updIdxs = notMatchedBySource.zipWithIndex.collect {
            case (Update(_, _), i) => i
          }
          val dels =
            if (delIdxs.isEmpty) Nil
            else Seq(align(idx.filter(col(mIdx).isin(delIdxs: _*))
                .select(targetCols.map(c => col(s"$targetAlias.$c").as(c)): _*))
              .withColumn(ct, lit("delete")))
          val upds =
            if (updIdxs.isEmpty) Nil
            else {
              val u = idx.filter(col(mIdx).isin(updIdxs: _*))
              val pre = align(u.select(
                targetCols.map(c => col(s"$targetAlias.$c").as(c)): _*))
              val post = align(u.select(
                targetCols.map(c => bySourceColumn(c).as(c)): _*))
              Seq(post.exceptAll(pre).withColumn(ct, lit("update_postimage"))
                .unionByName(
                  pre.exceptAll(post).withColumn(ct, lit("update_preimage"))))
            }
          dels ++ upds
        }
      if (matched.isEmpty)
        return (bySource :+ inserted).reduce(_ unionByName _)
      val classified = classifiedMatches(t, s)
      val deleteIdxs = matched.zipWithIndex.collect { case (Delete(_), i) => i }
      val updateIdxs = matched.zipWithIndex.collect {
        case (Update(_, _), i) => i
        case (UpdateAll(_), i) => i
      }
      val deleted =
        if (deleteIdxs.isEmpty) None
        else Some(align(classified.filter(col(mIdx).isin(deleteIdxs: _*))
            .select(targetCols.map(c => col(s"$targetAlias.$c").as(c)): _*))
          .withColumn(ct, lit("delete")))
      val updated =
        if (updateIdxs.isEmpty) None
        else {
          val upd = classified.filter(col(mIdx).isin(updateIdxs: _*))
          val pre = align(upd.select(
            targetCols.map(c => col(s"$targetAlias.$c").as(c)): _*))
          val post = align(upd.select(
            targetCols.map(c => targetColumn(c).as(c)): _*))
          Some(post.exceptAll(pre).withColumn(ct, lit("update_postimage"))
            .unionByName(pre.exceptAll(post).withColumn(ct, lit("update_preimage"))))
        }
      (deleted.toSeq ++ updated.toSeq ++ bySource :+ inserted)
        .reduce(_ unionByName _)
    }

    private def emptyLike(cols: Seq[String]): DataFrame = {
      import org.apache.spark.sql.Row
      target.sparkSession.createDataFrame(
        target.sparkSession.sparkContext.emptyRDD[Row], target.schema)
    }
  }

  /** Entry point: `Merge.into(targetDf, "base").using(srcDf, "staged_updates",
    * expr("base.pk = mergeKey"))...`
    */
  def into(target: DataFrame, targetAlias: String = "base"): Into =
    Into(target, targetAlias)

  final case class Into(target: DataFrame, targetAlias: String) {
    def using(source: DataFrame, sourceAlias: String, condition: Column): Builder =
      Builder(target, targetAlias, source, sourceAlias, condition)
    def using(source: DataFrame, sourceAlias: String, condition: String): Builder =
      Builder(target, targetAlias, source, sourceAlias, expr(condition))
  }
}
