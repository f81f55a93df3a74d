package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._
import graft.tables.ManagedTable

/** SQL statement surface for the managed-table layer (the delta-spark
  * pattern: a thin delegating parser so `DELETE FROM`, `UPDATE`,
  * `OPTIMIZE … ZORDER BY`, `DESCRIBE HISTORY`, `VACUUM`,
  * `RESTORE … TO VERSION AS OF`, `CLONE … TO` and
  * `CONVERT TO GRAFT` are drivable
  * from `spark.sql`, with the table addressed by path as
  * ``graft.`/path/to/table` `` — mirroring Delta's ``delta.`/path` ``
  * syntax). Anything that doesn't match the graft grammar delegates to
  * the session parser untouched.
  *
  * Injected via `spark.sql.extensions=graft.plans.GraftExtensions`
  * (parsers are fixed at session build — unlike the scalar/table
  * functions, this surface cannot be added to a live session).
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    parseGraft(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parsePlanWithParameters(sqlText: String,
                                       ctx: ParameterContext): LogicalPlan =
    parseGraft(sqlText).getOrElse(delegate.parsePlanWithParameters(sqlText, ctx))

  override def parseExpression(s: String): Expression = delegate.parseExpression(s)
  override def parseTableIdentifier(s: String): TableIdentifier =
    delegate.parseTableIdentifier(s)
  override def parseFunctionIdentifier(s: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(s)
  override def parseMultipartIdentifier(s: String): Seq[String] =
    delegate.parseMultipartIdentifier(s)
  override def parseQuery(s: String): LogicalPlan = delegate.parseQuery(s)
  override def parseRoutineParam(s: String): StructType = delegate.parseRoutineParam(s)
  override def parseTableSchema(s: String): StructType = delegate.parseTableSchema(s)
  override def parseDataType(s: String): DataType = delegate.parseDataType(s)
}

object GraftSqlParser {

  // graft.`/path` — the path is backtick-quoted, `` escapes a backtick
  private val Ref = """(?i)graft\s*\.\s*`((?:[^`]|``)+)`"""
  private val DeleteRe =
    s"""(?is)\\s*DELETE\\s+FROM\\s+$Ref\\s*(?:WHERE\\s+(.+?))?\\s*;?\\s*""".r
  private val UpdateRe =
    s"""(?is)\\s*UPDATE\\s+$Ref\\s+SET\\s+(.+?)\\s*;?\\s*""".r
  // Delta's clause order: OPTIMIZE tbl [WHERE partition-pred]
  // [ZORDER BY (…) | HILBERT BY (…)] — HILBERT picks the Hilbert-curve
  // clustering (same bucketing, better multi-column locality)
  private val OptimizeRe =
    s"""(?is)\\s*OPTIMIZE\\s+$Ref\\s*(?:WHERE\\s+(.+?)\\s*)?(?:(ZORDER|HILBERT)\\s+BY\\s*\\(?\\s*([\\w\\s,]+?)\\s*\\)?)?\\s*;?\\s*""".r
  private val HistoryRe =
    s"""(?is)\\s*DESC(?:RIBE)?\\s+HISTORY\\s+$Ref\\s*;?\\s*""".r
  private val DetailRe =
    s"""(?is)\\s*DESC(?:RIBE)?\\s+DETAIL\\s+$Ref\\s*;?\\s*""".r
  private val VacuumRe =
    s"""(?is)\\s*VACUUM\\s+$Ref\\s*(?:RETAIN\\s+([0-9.]+)\\s+HOURS)?\\s*(DRY\\s+RUN)?\\s*;?\\s*""".r
  private val RestoreRe =
    s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?$Ref\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*""".r
  private val RestoreTsRe =
    s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?$Ref\\s+TO\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'\\s*;?\\s*""".r
  private val CloneRe =
    s"""(?is)\\s*CLONE\\s+$Ref\\s+TO\\s+$Ref\\s*;?\\s*""".r
  // CONVERT TO GRAFT parquet.`/src` AS graft.`/dst` [PARTITIONED BY (p, …)]
  // (Delta's CONVERT TO DELTA, with an explicit target since graft's log
  // lives beside a data/ dir rather than inside the source); a delta.`…`
  // source routes through the Delta log reader instead of a dir walk
  private val SrcRef = """(?i)(parquet|delta)\s*\.\s*`((?:[^`]|``)+)`"""
  private val ConvertRe =
    s"""(?is)\\s*CONVERT\\s+TO\\s+GRAFT\\s+$SrcRef\\s+AS\\s+$Ref\\s*(?:PARTITIONED\\s+BY\\s*\\(\\s*([\\w\\s,]+?)\\s*\\))?\\s*;?\\s*""".r

  private def unq(path: String): String = path.replace("``", "`")

  /** Strip one layer of '…'/"…" quoting from a SQL literal (escaped
    * inner quotes unescaped); bare literals pass through as-is.
    */
  private def unquoteLit(s: String): String =
    if (s.length >= 2 && s.head == '\'' && s.last == '\'')
      s.substring(1, s.length - 1).replace("''", "'")
    else if (s.length >= 2 && s.head == '"' && s.last == '"')
      s.substring(1, s.length - 1).replace("\"\"", "\"")
    else s

  // ALTER TABLE graft.`/p` ADD COLUMNS (c TYPE, …) | SET TBLPROPERTIES
  // (k='v', …) | UNSET TBLPROPERTIES [IF EXISTS] (k, …) | RENAME TO
  // graft.`/q` — the Delta ALTER surface that applies to path tables
  private val AlterAddColsRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$Ref\\s+ADD\\s+COLUMNS?\\s*\\((.+)\\)\\s*;?\\s*""".r
  private val AlterSetPropsRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$Ref\\s+SET\\s+TBLPROPERTIES\\s*\\((.+)\\)\\s*;?\\s*""".r
  private val AlterUnsetPropsRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$Ref\\s+UNSET\\s+TBLPROPERTIES\\s*(IF\\s+EXISTS\\s*)?\\(([\\w\\s.,`'"-]+)\\)\\s*;?\\s*""".r
  private val AlterRenameRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$Ref\\s+RENAME\\s+TO\\s+$Ref\\s*;?\\s*""".r
  private val AlterAddConstraintRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$Ref\\s+ADD\\s+CONSTRAINT\\s+(\\w+)\\s+CHECK\\s*\\((.+)\\)\\s*;?\\s*""".r
  private val AlterDropConstraintRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$Ref\\s+DROP\\s+CONSTRAINT\\s+(IF\\s+EXISTS\\s+)?(\\w+)\\s*;?\\s*""".r
  private val AlterNotNullRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$Ref\\s+ALTER\\s+COLUMN\\s+(\\w+)\\s+(SET|DROP)\\s+NOT\\s+NULL\\s*;?\\s*""".r
  private val AlterDropColRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$Ref\\s+DROP\\s+COLUMN\\s+(\\w+)\\s*;?\\s*""".r
  private val FsckRe =
    s"""(?is)\\s*FSCK\\s+REPAIR\\s+TABLE\\s+$Ref\\s*(DRY\\s+RUN)?\\s*;?\\s*""".r
  private val ShowPartitionsRe =
    s"""(?is)\\s*SHOW\\s+PARTITIONS\\s+$Ref\\s*;?\\s*""".r
  private val ShowTblPropsRe =
    s"""(?is)\\s*SHOW\\s+TBLPROPERTIES\\s+$Ref\\s*;?\\s*""".r

  // MERGE [WITH SCHEMA EVOLUTION] INTO graft.`/path` [AS] t USING <rest>
  // — the rest (source spec, ON condition, WHEN clauses) nests
  // arbitrarily, so it is carved up with the top-level scanners below
  // rather than one regex
  private val MergeHeadRe =
    (s"""(?is)\\s*MERGE\\s+(WITH\\s+SCHEMA\\s+EVOLUTION\\s+)?INTO\\s+$Ref""" +
      s"""\\s*(?:(?:AS\\s+)?(?!USING\\b)([A-Za-z_]\\w*)\\s+)?USING\\s+(.+)""").r
  private val GraftSrcRe = s"""(?is)\\s*$Ref\\s*""".r
  private val ParquetSrcRe = """(?is)\s*parquet\s*\.\s*`((?:[^`]|``)+)`\s*""".r

  // CREATE TABLE graft.`/p` [PARTITIONED BY (c, …)]
  //   [TBLPROPERTIES (k = 'v', …)] AS <select>
  private val CtasRe =
    (s"""(?is)\\s*CREATE\\s+TABLE\\s+$Ref""" +
      """\s*(?:PARTITIONED\s+BY\s*\(\s*([\w\s,]+?)\s*\)\s*)?""" +
      """(?:TBLPROPERTIES\s*\((.*?)\)\s*)?AS\s+(SELECT\b.+)""").r
  // INSERT INTO|OVERWRITE graft.`/p` <select>
  private val InsertRe =
    s"""(?is)\\s*INSERT\\s+(INTO|OVERWRITE)\\s+(?:TABLE\\s+)?$Ref\\s+(SELECT\\b.+|TABLE\\b.+|VALUES\\b.+)""".r

  private[plans] def parseGraft(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case MergeHeadRe(evolve, path, tAlias, rest) =>
        Some(parseMergeTail(unq(path),
          Option(tAlias).getOrElse("target"), rest,
          evolveSchema = evolve != null))
      case CtasRe(path, parts, props, select) =>
        val cols = Option(parts).toSeq
          .flatMap(_.split(',').toSeq).map(_.trim).filter(_.nonEmpty)
        val kvs = Option(props).map(parseProps).getOrElse(Map.empty)
        Some(GraftCtasCommand(unq(path), cols, kvs,
          select.trim.stripSuffix(";")))
      case InsertRe(mode, path, select) =>
        Some(GraftInsertCommand(unq(path),
          overwrite = mode.equalsIgnoreCase("OVERWRITE"),
          select.trim.stripSuffix(";")))
      case DeleteRe(path, where) =>
        Some(GraftDeleteCommand(unq(path), Option(where).map(_.trim)))
      case UpdateRe(path, rest) =>
        val (setPart, where) = splitTopLevelWhere(rest)
        val assignments = splitTopLevel(setPart, ',').map { a =>
          val i = topLevelIndexOf(a, "=")
          require(i > 0, s"UPDATE SET expects col = expr, got: $a")
          (a.substring(0, i).trim.stripPrefix("`").stripSuffix("`"),
            a.substring(i + 1).trim)
        }
        Some(GraftUpdateCommand(unq(path), assignments, where))
      case OptimizeRe(path, where, curveKw, zorder) =>
        val cols = Option(zorder).toSeq
          .flatMap(_.split(',').toSeq).map(_.trim).filter(_.nonEmpty)
        val curve =
          if (Option(curveKw).exists(_.equalsIgnoreCase("HILBERT"))) "hilbert"
          else "zorder"
        // WHERE restricts to partition values: equality conjunctions only
        // (the predicate prunes FILES without reading them, so anything
        // beyond `part = literal AND …` must fail loud, as Delta does)
        val spec: Map[String, String] = Option(where).map { w =>
          val terms = w.split("(?i)\\s+AND\\s+").map { term =>
            val i = term.indexOf('=')
            require(i > 0 && term.indexOf('=', i + 1) < 0 &&
                !term.contains('<') && !term.contains('>'),
              s"OPTIMIZE WHERE supports only `col = literal [AND …]` " +
                s"partition predicates, got: $term")
            val k = term.substring(0, i).trim
            val rawV = term.substring(i + 1).trim
            // the value must be ONE literal — a bare word/number or one
            // quoted string. Trailing SQL ("0 ORDER BY x") must fail loud
            // here, not silently match no partition and no-op.
            require(rawV.matches("[\\w.+-]+") ||
                rawV.matches("'(?:[^']|'')*'") ||
                rawV.matches("\"(?:[^\"]|\"\")*\""),
              s"OPTIMIZE WHERE expects a single literal value, got: $rawV")
            require(k.matches("[\\w]+"), s"bad partition column: $k")
            k -> unquoteLit(rawV)
          }.toSeq
          // `p = 1 AND p = 2` is unsatisfiable — refuse rather than
          // letting Map last-wins rewrite partitions the predicate excludes
          terms.groupBy(_._1).foreach { case (k, vs) =>
            require(vs.map(_._2).distinct.size == 1,
              s"OPTIMIZE WHERE binds partition column `$k` to conflicting " +
                s"values: ${vs.map(_._2).mkString(", ")}")
          }
          terms.toMap
        }.getOrElse(Map.empty)
        Some(GraftOptimizeCommand(unq(path), cols, spec, curve))
      case HistoryRe(path) => Some(GraftHistoryCommand(unq(path)))
      case DetailRe(path) => Some(GraftDetailCommand(unq(path)))
      case RestoreRe(path, v) =>
        Some(GraftRestoreCommand(unq(path), v.toLong))
      case RestoreTsRe(path, ts) =>
        Some(GraftRestoreTimestampCommand(unq(path), ts.trim))
      case CloneRe(src, dst) =>
        Some(GraftCloneCommand(unq(src), unq(dst)))
      case ConvertRe(format, src, dst, parts) =>
        val cols = Option(parts).toSeq
          .flatMap(_.split(',').toSeq).map(_.trim).filter(_.nonEmpty)
        Some(GraftConvertCommand(format.toLowerCase, unq(src), unq(dst), cols))
      case VacuumRe(path, hours, dry) =>
        Some(GraftVacuumCommand(unq(path),
          Option(hours).map(_.toDouble).getOrElse(7 * 24.0),
          dryRun = dry != null))
      case AlterAddColsRe(path, cols) =>
        Some(GraftAddColumnsCommand(unq(path), cols.trim))
      case AlterSetPropsRe(path, props) =>
        Some(GraftSetPropertiesCommand(unq(path), parseProps(props)))
      case AlterUnsetPropsRe(path, ifExists, keys) =>
        Some(GraftUnsetPropertiesCommand(unq(path),
          keys.split(',').toSeq.map(_.trim.stripPrefix("`").stripSuffix("`")
            .stripPrefix("'").stripSuffix("'")
            .stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty),
          ifExists = ifExists != null))
      case AlterRenameRe(src, dst) =>
        Some(GraftRenameCommand(unq(src), unq(dst)))
      case AlterAddConstraintRe(path, name, check) =>
        Some(GraftAddConstraintCommand(unq(path), name, check.trim))
      case AlterDropConstraintRe(path, ifExists, name) =>
        Some(GraftDropConstraintCommand(unq(path), name, ifExists != null))
      case AlterNotNullRe(path, colName, mode) =>
        Some(GraftNotNullCommand(unq(path), colName,
          set = mode.equalsIgnoreCase("SET")))
      case AlterDropColRe(path, colName) =>
        Some(GraftDropColumnCommand(unq(path), colName))
      case FsckRe(path, dryRun) =>
        Some(GraftFsckCommand(unq(path), repair = dryRun == null))
      case ShowPartitionsRe(path) =>
        Some(GraftShowPartitionsCommand(unq(path)))
      case ShowTblPropsRe(path) =>
        Some(GraftShowTblPropertiesCommand(unq(path)))
      case _ => None
    }

  /** Parse everything after `USING` of a MERGE: `<source> [[AS] alias]
    * ON <cond> WHEN [NOT] MATCHED [AND <cond>] THEN <action> …`. The
    * source is a graft/parquet path ref, a table name, or a
    * parenthesized subquery; nested `ON`/`WHEN`/`THEN` (joins, CASE)
    * sit inside parens and are skipped by the top-level scanners.
    */
  private def parseMergeTail(path: String, targetAlias: String,
                             rest: String,
                             evolveSchema: Boolean): LogicalPlan = {
    import graft.tables.Merge
    val onIdx = topLevelWordIndex(rest, "ON")
    require(onIdx > 0, "MERGE INTO expects USING <source> ON <condition>")
    val (sourceText, sourceAlias) = parseMergeSource(rest.substring(0, onIdx))
    val afterOn = rest.substring(onIdx + 2)
    val whenIdx = topLevelMergeWhenIndex(afterOn, 0)
    require(whenIdx >= 0,
      "MERGE INTO expects at least one WHEN [NOT] MATCHED clause")
    val onCond = afterOn.substring(0, whenIdx).trim
    require(onCond.nonEmpty, "MERGE INTO has an empty ON condition")
    // slice the WHEN clauses at top level
    var starts = List(whenIdx)
    var next = topLevelMergeWhenIndex(afterOn, whenIdx + 4)
    while (next >= 0) {
      starts = next :: starts
      next = topLevelMergeWhenIndex(afterOn, next + 4)
    }
    val bounds = starts.reverse :+ afterOn.length
    val clauseTexts = bounds.sliding(2).map {
      case Seq(a, b) => afterOn.substring(a, b).trim }.toSeq
    val parsed = clauseTexts.map(parseMergeClause(_, targetAlias))
    val matched = parsed.collect { case (0, c) => c }
    val notMatched = parsed.collect { case (1, c) => c }
    val notMatchedBySource = parsed.collect { case (2, c) => c }
    GraftMergeCommand(path, targetAlias, sourceText, sourceAlias,
      onCond, matched, notMatched, notMatchedBySource, evolveSchema)
  }

  /** The USING source region: `(subquery) [[AS] alias]` or
    * `ref-or-name [[AS] alias]`.
    */
  private def parseMergeSource(region: String): (String, String) = {
    val sr = region.trim
    val (text, tail) =
      if (sr.startsWith("(")) {
        val close = matchingParen(sr)
        (sr.substring(0, close + 1), sr.substring(close + 1))
      } else {
        val ws = scanTopLevel(sr, (s, i) => Character.isWhitespace(s.charAt(i)))
        if (ws < 0) (sr, "") else (sr.substring(0, ws), sr.substring(ws))
      }
    val alias = tail.trim match {
      case "" => "source"
      case a =>
        val bare = a.replaceFirst("(?is)^AS\\s+", "").trim
        require(bare.matches("[A-Za-z_]\\w*"),
          s"MERGE USING: cannot parse source alias from '$a'")
        bare
    }
    (text, alias)
  }

  /** Index of the closing paren matching `s(0) == '('`. */
  private def matchingParen(s: String): Int = {
    var depth = 0; var inStr = false; var inDq = false; var inTick = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\\') i += 1 else if (c == '\'') inStr = false }
      else if (inDq) { if (c == '\\') i += 1 else if (c == '"') inDq = false }
      else if (inTick) { if (c == '`') inTick = false }
      else c match {
        case '\'' => inStr = true
        case '"' => inDq = true
        case '`' => inTick = true
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i
        case _ => ()
      }
      i += 1
    }
    sys.error(s"MERGE USING: unbalanced parentheses in source: $s")
  }

  /** First top-level `WHEN` at/after `from` that is followed by
    * `MATCHED` or `NOT` (so a top-level CASE WHEN in the ON condition
    * does not end it).
    */
  private def topLevelMergeWhenIndex(s: String, from: Int): Int = {
    val sub = s.substring(from)
    var off = 0
    while (off < sub.length) {
      val i = topLevelWordIndex(sub.substring(off), "WHEN")
      if (i < 0) return -1
      val after = sub.substring(off + i + 4).dropWhile(_.isWhitespace)
      if (after.regionMatches(true, 0, "MATCHED", 0, 7) ||
          after.regionMatches(true, 0, "NOT", 0, 3))
        return from + off + i
      off += i + 4
    }
    -1
  }

  /** One `WHEN [NOT] MATCHED [BY SOURCE|BY TARGET] [AND cond] THEN
    * action` clause → (kind, clause): 0 = matched, 1 = not-matched (by
    * target), 2 = not-matched-by-source (Delta 2.3 semantics: target
    * rows with no source match).
    */
  private def parseMergeClause(text: String,
                               targetAlias: String): (Int, graft.tables.Merge.Clause) = {
    import graft.tables.Merge
    val HeadRe = """(?is)\s*WHEN\s+(NOT\s+)?MATCHED\b(.*)""".r
    val (isNotRaw, rest0) = text match {
      case HeadRe(not, r) => (not != null, r)
      case _ => sys.error(s"MERGE: cannot parse clause: $text")
    }
    val bySource = isNotRaw &&
      rest0.trim.toUpperCase.startsWith("BY SOURCE")
    val rest =
      if (bySource) rest0.trim.substring("BY SOURCE".length)
      else if (isNotRaw && rest0.trim.toUpperCase.startsWith("BY TARGET"))
        rest0.trim.substring("BY TARGET".length) // explicit default form
      else rest0
    require(!rest.trim.toUpperCase.startsWith("BY "),
      s"MERGE: cannot parse clause qualifier in: $text")
    val kind = if (bySource) 2 else if (isNotRaw) 1 else 0
    val isNot = isNotRaw && !bySource // bySource acts on TARGET rows:
                                      // update/delete legal, insert not
    val thenIdx = topLevelWordIndex(rest, "THEN")
    require(thenIdx >= 0, s"MERGE clause is missing THEN: $text")
    val condPart = rest.substring(0, thenIdx).trim
    val cond: Option[String] =
      if (condPart.isEmpty) None
      else {
        require(condPart.toUpperCase.startsWith("AND"),
          s"MERGE clause condition must start with AND: $condPart")
        Some(condPart.substring(3).trim)
      }
    val action = rest.substring(thenIdx + 4).trim.stripSuffix(";").trim
    def unalias(c: String): String = {
      val t = c.trim.stripPrefix("`").stripSuffix("`")
      val p = targetAlias + "."
      if (t.toLowerCase.startsWith(p.toLowerCase)) t.substring(p.length)
        .stripPrefix("`").stripSuffix("`")
      else t
    }
    val UpdateAllRe = """(?is)UPDATE\s+SET\s+\*\s*""".r
    val UpdateRe = """(?is)UPDATE\s+SET\s+(.+)""".r
    val DeleteRe = """(?is)DELETE\s*""".r
    val InsertAllRe = """(?is)INSERT\s+\*\s*""".r
    val InsertRe = """(?is)INSERT\s*\((.+?)\)\s*VALUES\s*\((.+)\)\s*""".r
    val clause: Merge.Clause = action match {
      case UpdateAllRe() =>
        require(!isNot, "MERGE: WHEN NOT MATCHED cannot UPDATE")
        require(kind != 2,
          "MERGE: WHEN NOT MATCHED BY SOURCE cannot UPDATE SET * (no " +
            "source row to copy)")
        Merge.UpdateAll(cond)
      case DeleteRe() =>
        require(!isNot, "MERGE: WHEN NOT MATCHED cannot DELETE"); Merge.Delete(cond)
      case UpdateRe(assigns) =>
        require(!isNot, "MERGE: WHEN NOT MATCHED cannot UPDATE")
        val set = splitTopLevel(assigns, ',').map { a =>
          val i = topLevelIndexOf(a, "=")
          require(i > 0, s"MERGE UPDATE SET expects col = expr, got: $a")
          unalias(a.substring(0, i)) -> a.substring(i + 1).trim
        }.toMap
        Merge.Update(cond, set)
      case InsertAllRe() =>
        require(isNot, "MERGE: only WHEN NOT MATCHED [BY TARGET] can INSERT")
        Merge.InsertAll(cond)
      case InsertRe(cols, vals) =>
        require(isNot, "MERGE: only WHEN NOT MATCHED [BY TARGET] can INSERT")
        val cs = splitTopLevel(cols, ',').map(unalias)
        val vs = splitTopLevel(vals, ',')
        require(cs.length == vs.length,
          s"MERGE INSERT: ${cs.length} columns but ${vs.length} values")
        Merge.Insert(cond, cs.zip(vs).toMap)
      case other => sys.error(s"MERGE: cannot parse clause action: $other")
    }
    (kind, clause)
  }

  /** `k = 'v', k2 = "v2"` TBLPROPERTIES pairs (quotes optional). */
  private def parseProps(s: String): Map[String, String] =
    splitTopLevel(s, ',').map { kv =>
      val i = topLevelIndexOf(kv, "=")
      require(i > 0, s"TBLPROPERTIES expects k = 'v' pairs, got: $kv")
      def strip(x: String) = {
        val t = x.trim
        if ((t.startsWith("'") && t.endsWith("'") && t.length >= 2) ||
            (t.startsWith("\"") && t.endsWith("\"") && t.length >= 2))
          t.substring(1, t.length - 1)
        else t.stripPrefix("`").stripSuffix("`")
      }
      strip(kv.substring(0, i)) -> strip(kv.substring(i + 1))
    }.toMap

  /** Resolve a MERGE USING source spec to a DataFrame at run time. */
  private[plans] def resolveMergeSource(spark: SparkSession,
                                        text: String): org.apache.spark.sql.DataFrame =
    text match {
      case GraftSrcRe(p) => ManagedTable.forPath(spark, unq(p)).toDF
      case ParquetSrcRe(p) => spark.read.parquet(unq(p))
      case s if s.trim.startsWith("(") =>
        spark.sql(s"SELECT * FROM ${s.trim} __graft_merge_src")
      case name => spark.table(name.trim)
    }

  /** Split off a trailing top-level `WHERE` (outside quotes/parens) from
    * an UPDATE's tail — `SET a = f(x, 'WHERE'), b = 2 WHERE id < 3`.
    */
  private def splitTopLevelWhere(s: String): (String, Option[String]) = {
    val i = topLevelWordIndex(s, "WHERE")
    if (i < 0) (s.trim, None)
    else (s.substring(0, i).trim, Some(s.substring(i + 5).trim))
  }

  /** Index of `sep` at paren/quote depth zero, or -1. */
  private def topLevelIndexOf(s: String, sep: String): Int =
    scanTopLevel(s, (str, i) => str.startsWith(sep, i))

  /** Index of the keyword at depth zero with identifier boundaries. */
  private def topLevelWordIndex(s: String, word: String): Int =
    scanTopLevel(s, (str, i) =>
      str.regionMatches(true, i, word, 0, word.length) &&
        (i == 0 || !Character.isJavaIdentifierPart(str.charAt(i - 1))) &&
        (i + word.length >= str.length ||
          !Character.isJavaIdentifierPart(str.charAt(i + word.length))))

  private def scanTopLevel(s: String, hit: (String, Int) => Boolean): Int = {
    var depth = 0; var i = 0
    // Spark SQL (ANSI off) string literals come single- OR double-quoted,
    // with backslash escapes — track all three states, else a WHERE or
    // comma INSIDE a literal mis-splits the statement
    var inStr = false; var inDq = false; var inTick = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (c == '\\') i += 1 else if (c == '\'') inStr = false
      } else if (inDq) {
        if (c == '\\') i += 1 else if (c == '"') inDq = false
      } else if (inTick) { if (c == '`') inTick = false }
      else c match {
        case '\'' => inStr = true
        case '"' => inDq = true
        case '`' => inTick = true
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case _ => if (depth == 0 && hit(s, i)) return i
      }
      i += 1
    }
    -1
  }

  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val parts = Vector.newBuilder[String]
    var depth = 0; var inStr = false; var inDq = false; var inTick = false
    var start = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (c == '\\') i += 1 else if (c == '\'') inStr = false
      } else if (inDq) {
        if (c == '\\') i += 1 else if (c == '"') inDq = false
      } else if (inTick) { if (c == '`') inTick = false }
      else c match {
        case '\'' => inStr = true
        case '"' => inDq = true
        case '`' => inTick = true
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case x if x == sep && depth == 0 =>
          parts += s.substring(start, i); start = i + 1
        case _ => ()
      }
      i += 1
    }
    parts += s.substring(start)
    parts.result().map(_.trim).filter(_.nonEmpty)
  }
}

/** `DELETE FROM graft.`path`` [WHERE cond] → rows deleted. */
final case class GraftDeleteCommand(path: String, where: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("num_affected_rows", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(ManagedTable.forPath(spark, path).delete(where.getOrElse("true"))))
}

/** `UPDATE graft.`path` SET c = e, … [WHERE cond]` → rows updated. */
final case class GraftUpdateCommand(path: String,
                                    set: Seq[(String, String)],
                                    where: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("num_affected_rows", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(ManagedTable.forPath(spark, path).update(set.toMap, where)))
}

/** `OPTIMIZE graft.`path` [WHERE part = v [AND …]] [ZORDER BY (c, …)]`
  * → resulting file count. The WHERE spec scopes the rewrite to matching
  * partitions (Delta's partition-predicate OPTIMIZE).
  */
final case class GraftOptimizeCommand(path: String, zorderBy: Seq[String],
                                      where: Map[String, String] = Map.empty,
                                      curve: String = "zorder")
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("num_files", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = ManagedTable.forPath(spark, path)
    t.optimize(zorderBy = zorderBy,
      partitions = if (where.isEmpty) Nil else Seq(where),
      curve = curve)
    Seq(Row(path, t.detail.numFiles))
  }
}

/** `DESCRIBE HISTORY graft.`path`` → the table's commit history. */
final case class GraftHistoryCommand(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("timestamp", TimestampType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("operationMetrics",
      MapType(StringType, StringType), nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    ManagedTable.forPath(spark, path).history.collect().toSeq
}

/** `DESCRIBE DETAIL graft.`path`` → one row of table-level metadata
  * (Delta's DESCRIBE DETAIL): location, partitioning, properties, file
  * count, bytes, and the metadata-only row count.
  */
final case class GraftDetailCommand(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("partition_columns",
      ArrayType(StringType, containsNull = false), nullable = false)(),
    AttributeReference("properties",
      MapType(StringType, StringType), nullable = false)(),
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("size_in_bytes", LongType, nullable = false)(),
    AttributeReference("num_rows", LongType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = ManagedTable.forPath(spark, path)
    val d = t.detail
    Seq(Row(d.location, d.partitionColumns, d.properties, d.numFiles,
      d.sizeInBytes, t.numRows, t.latestVersion))
  }
}

/** `RESTORE [TABLE] graft.`path` TO TIMESTAMP AS OF 'ts'` → the version
  * live at that instant is restored (timestamp resolution as in
  * [[ManagedTable.versionAsOf]]).
  */
final case class GraftRestoreTimestampCommand(path: String, ts: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("restored_version", LongType, nullable = false)(),
    AttributeReference("new_version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = ManagedTable.forPath(spark, path)
    val norm = if (ts.length == 10) ts + " 00:00:00" else ts.replace("T", " ")
    val v = t.versionAsOf(java.sql.Timestamp.valueOf(norm).getTime)
    t.restore(v)
    Seq(Row(v, t.latestVersion))
  }
}

/** `RESTORE [TABLE] graft.`path` TO VERSION AS OF n` → restored version. */
final case class GraftRestoreCommand(path: String, version: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("restored_version", LongType, nullable = false)(),
    AttributeReference("new_version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = ManagedTable.forPath(spark, path)
    t.restore(version)
    Seq(Row(version, t.latestVersion))
  }
}

/** `CLONE graft.`src` TO graft.`dst`` → zero-copy clone (cloneTo). */
final case class GraftCloneCommand(src: String, dst: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("cloned_files", LongType, nullable = false)(),
    AttributeReference("source_version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val s = ManagedTable.forPath(spark, src)
    val v = s.latestVersion
    val c = s.cloneTo(dst)
    Seq(Row(c.detail.numFiles, v))
  }
}

/** `ALTER TABLE graft.`path` ADD COLUMNS (c TYPE, …)` → schema widens
  * (new columns nullable; existing rows read back NULL), DDL parsed with
  * Spark's own `StructType.fromDDL`.
  */
final case class GraftAddColumnsCommand(path: String, colsDdl: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("num_columns", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = ManagedTable.forPath(spark, path)
    t.addColumns(org.apache.spark.sql.types.StructType.fromDDL(colsDdl).fields
      .toIndexedSeq)
    Seq(Row(t.latestVersion, t.schema.fields.length.toLong))
  }
}

/** `ALTER TABLE graft.`path` SET TBLPROPERTIES (k = 'v', …)`. */
final case class GraftSetPropertiesCommand(path: String,
                                           props: Map[String, String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = ManagedTable.forPath(spark, path)
    t.setProperties(props)
    Seq(Row(t.latestVersion))
  }
}

/** `ALTER TABLE graft.`path` UNSET TBLPROPERTIES [IF EXISTS] (k, …)` —
  * without IF EXISTS an absent key raises (Delta/Spark semantics); with
  * it, absent keys no-op and a commit lands only when something changes.
  */
final case class GraftUnsetPropertiesCommand(path: String, keys: Seq[String],
                                             ifExists: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = ManagedTable.forPath(spark, path)
    if (!ifExists) {
      val missing = keys.filterNot(t.properties.contains)
      require(missing.isEmpty,
        s"UNSET TBLPROPERTIES: keys ${missing.mkString(", ")} do not " +
          s"exist in $path (use IF EXISTS to ignore)")
    }
    t.unsetProperties(keys)
    Seq(Row(t.latestVersion))
  }
}

/** `ALTER TABLE graft.`src` RENAME TO graft.`dst`` — the reference's
  * rename_delta_table as SQL: a directory move, history intact.
  */
final case class GraftRenameCommand(src: String, dst: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = ManagedTable.forPath(spark, src).rename(dst)
    Seq(Row(t.location, t.latestVersion))
  }
}

/** `ALTER TABLE graft.`path` ADD CONSTRAINT name CHECK (expr)` —
  * validates existing rows, then every later write enforces per row.
  */
final case class GraftAddConstraintCommand(path: String, name: String,
                                           check: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("name", StringType, nullable = false)(),
    AttributeReference("check", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    ManagedTable.forPath(spark, path).addCheckConstraint(name, check)
    Seq(Row(name, check))
  }
}

/** `ALTER TABLE graft.`path` DROP COLUMN c` — logical drop (schema-only
  * commit, tombstoned name; see ManagedTable.dropColumn).
  */
final case class GraftDropColumnCommand(path: String, colName: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("column", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    ManagedTable.forPath(spark, path).dropColumn(colName)
    Seq(Row(colName))
  }
}

/** `FSCK REPAIR TABLE graft.`path` [DRY RUN]` — one row per missing file
  * entry; without DRY RUN the missing data entries are dropped from the
  * snapshot (missing deletion vectors always refuse repair).
  */
final case class GraftFsckCommand(path: String, repair: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("missing", StringType, nullable = false)(),
    AttributeReference("repaired", BooleanType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val missing = ManagedTable.forPath(spark, path).fsck(repair)
    missing.map(Row(_, repair))
  }
}

/** `ALTER TABLE graft.`path` ALTER COLUMN c SET|DROP NOT NULL`. */
final case class GraftNotNullCommand(path: String, colName: String,
                                     set: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("column", StringType, nullable = false)(),
    AttributeReference("nullable", BooleanType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = ManagedTable.forPath(spark, path)
    if (set) t.setNotNull(colName) else t.dropNotNull(colName)
    Seq(Row(colName, !set))
  }
}

/** `ALTER TABLE graft.`path` DROP CONSTRAINT [IF EXISTS] name`. */
final case class GraftDropConstraintCommand(path: String, name: String,
                                            ifExists: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("name", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    ManagedTable.forPath(spark, path).dropCheckConstraint(name, ifExists)
    Seq(Row(name))
  }
}

/** `SHOW PARTITIONS graft.`path`` → one `k=v[/k2=w]` row per live
  * partition, from the snapshot's leaf directories — metadata-only, no
  * file listing or scan (Spark's SHOW PARTITIONS output shape).
  */
final case class GraftShowPartitionsCommand(path: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("partition", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = ManagedTable.forPath(spark, path)
    require(t.partitionColumns.nonEmpty,
      s"SHOW PARTITIONS is not allowed on a table that is not " +
        s"partitioned: $path")
    t.partitionSpecs.map(Row(_))
  }
}

/** `SHOW TBLPROPERTIES graft.`path`` → (key, value) rows, sorted. */
final case class GraftShowTblPropertiesCommand(path: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("key", StringType, nullable = false)(),
    AttributeReference("value", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    ManagedTable.forPath(spark, path).properties.toSeq.sortBy(_._1)
      .map { case (k, v) => Row(k, v) }
}

/** `CONVERT TO GRAFT parquet.`src` AS graft.`dst` [PARTITIONED BY (…)]`
  * → zero-copy adoption ([[ManagedTable.convert]]); a `delta.`src``
  * source imports through the Delta log ([[graft.sources.DeltaImport]],
  * where partitioning comes from the log and PARTITIONED BY is
  * rejected as conflicting).
  */
final case class GraftConvertCommand(format: String, src: String,
                                     dst: String, partitionBy: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("size_in_bytes", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = format match {
      case "parquet" => ManagedTable.convert(spark, src, dst, partitionBy)
      case "delta" =>
        require(partitionBy.isEmpty,
          "PARTITIONED BY conflicts with a delta source: partitioning " +
            "comes from the Delta log")
        graft.sources.DeltaImport.importTable(spark, src, dst)
    }
    val d = t.detail
    Seq(Row(d.numFiles, d.sizeInBytes))
  }
}

/** `MERGE [WITH SCHEMA EVOLUTION] INTO graft.`path` [AS] t USING src
  * [AS] s ON cond WHEN [NOT] MATCHED [AND c] THEN …` — the SQL form of
  * [[graft.tables.Merge]] (delta-spark's MERGE INTO). The source may be
  * a table name, ``graft.`/path` ``/``parquet.`/path` `` ref, or a
  * parenthesized subquery (resolved through the session at run time, so
  * temp views work). Returns the committed version and the table's
  * metadata row count after the merge.
  */
final case class GraftMergeCommand(path: String, targetAlias: String,
                                   sourceText: String, sourceAlias: String,
                                   onCond: String,
                                   matched: Seq[graft.tables.Merge.Clause],
                                   notMatched: Seq[graft.tables.Merge.Clause],
                                   notMatchedBySource:
                                     Seq[graft.tables.Merge.Clause],
                                   evolveSchema: Boolean)
    extends LeafRunnableCommand {
  import graft.tables.Merge
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("num_rows", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = ManagedTable.forPath(spark, path)
    val src = GraftSqlParser.resolveMergeSource(spark, sourceText)
    val b = Merge.into(t.toDF, targetAlias)
      .using(src, sourceAlias, onCond)
      .copy(matched = matched, notMatched = notMatched,
        notMatchedBySource = notMatchedBySource,
        evolveSchema = evolveSchema)
    b.execute(t)
    Seq(Row(t.latestVersion, t.numRows))
  }
}

/** `CREATE TABLE graft.`path` [PARTITIONED BY (…)] [TBLPROPERTIES (…)]
  * AS SELECT …` → a new managed table from the query result.
  */
final case class GraftCtasCommand(path: String, partitionBy: Seq[String],
                                  properties: Map[String, String],
                                  select: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("num_rows", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = ManagedTable.create(spark.sql(select), path, partitionBy,
      properties)
    Seq(Row(t.detail.numFiles, t.numRows))
  }
}

/** `INSERT INTO|OVERWRITE [TABLE] graft.`path` SELECT …` → append (or
  * snapshot overwrite) of the query result; returns the committed
  * version and rows written.
  */
final case class GraftInsertCommand(path: String, overwrite: Boolean,
                                    select: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("num_inserted_rows", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = ManagedTable.forPath(spark, path)
    val df = spark.sql(select)
    val before = if (overwrite) 0L else t.numRows
    if (overwrite) t.overwrite(df) else t.append(df)
    Seq(Row(t.latestVersion, t.numRows - before))
  }
}

/** `VACUUM graft.`path` [RETAIN n HOURS] [DRY RUN]` (default 168,
  * Delta's default retention) → (directories/files deleted, bytes
  * freed). The staged-write age floor always applies, as in the API
  * form; DRY RUN reports the reclaim without deleting anything.
  */
final case class GraftVacuumCommand(path: String, retainHours: Double,
                                    dryRun: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("num_reclaimed", LongType, nullable = false)(),
    AttributeReference("bytes_freed", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (n, b) = ManagedTable.forPath(spark, path).vacuum(retainHours,
      graft.tables.ManagedTable.defaultVacuumMinAgeMillis, dryRun)
    Seq(Row(n, b))
  }
}
