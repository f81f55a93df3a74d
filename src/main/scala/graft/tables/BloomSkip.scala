package graft.tables

import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.{
  EqualNullSafe => CatEqualNullSafe, EqualTo => CatEqualTo,
  Expression => CatExpr, In => CatIn, Literal => CatLit}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import java.nio.file.Path
import scala.jdk.CollectionConverters._

/** Bloom-filter file skipping for point lookups — the complement of
  * [[FileStats]] min/max pruning. Range bounds prune SORTED columns
  * ([[ManagedTable.optimize]]`(sortBy/zorderBy)`); they are useless for
  * the high-cardinality hash/id/uuid columns a lookup-heavy workload
  * probes, where every file's `[min, max]` spans essentially the whole
  * domain. For those, the table property `graft.bloom.columns` makes
  * every writer emit PARQUET-NATIVE bloom filters (format ≥ 2.9 footer
  * metadata — no sidecar format of our own, and any parquet reader,
  * including Spark's own row-group filter pushdown, benefits too), and
  * filtered reads test equality literals against each candidate file's
  * filter: a file whose every row group PROVES the probed value absent
  * is never scanned.
  *
  * Scale shape: the check is a driver-side footer read per candidate
  * file — the same O(candidate files) metadata cost as stats pruning,
  * run in parallel, and only AFTER min/max pruning has already cut the
  * candidate set. False positives cost a wasted scan, never a wrong
  * row; absence proofs are bloom-guaranteed.
  *
  * Delta Lake's bloom-filter index stores separate `_delta_index` files;
  * parquet-native filters were chosen here instead because they ride the
  * existing footer fetch and need no extra lifecycle (OPTIMIZE rewrites
  * regenerate them with the data they index, vacuuming needs no special
  * case).
  *
  * Supported probe shapes: `col = lit`, `lit = col`, `col <=> lit`
  * (non-null), `col IN (lits)` on integral, string, and date columns.
  * Timestamp columns are deliberately excluded: the parquet physical
  * value's unit depends on the writer's output-timestamp configuration,
  * and hashing the wrong unit would prove absence of values that ARE
  * present (same trap [[FileStats]] documents for footer bounds).
  * Float/double are excluded for NaN/-0.0 equality ambiguity.
  */
object BloomSkip {

  /** Table property: comma-separated columns to bloom-index on write. */
  val columnsPropKey = "graft.bloom.columns"
  /** Expected distinct values per file (sizes the filter; ~1.2 MB/file
    * at the parquet default of 1M — far too big for small files, so we
    * default lower and let the property override globally or per
    * column (`graft.bloom.ndv.<col>`).
    */
  val ndvPropKey = "graft.bloom.ndv"
  private val defaultNdv = 100000L

  private[tables] def bloomColumns(props: Map[String, String]): Seq[String] =
    props.get(columnsPropKey).toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)

  /** Parquet writer options realizing the table's bloom properties —
    * applied to every data write (append, DML rewrite, OPTIMIZE), so
    * filters stay in lockstep with the files they index.
    */
  private[tables] def writeOptions(props: Map[String, String]): Map[String, String] =
    bloomColumns(props).flatMap { c =>
      val ndv = props.getOrElse(s"$ndvPropKey.$c",
        props.getOrElse(ndvPropKey, defaultNdv.toString))
      Seq(s"parquet.bloom.filter.enabled#$c" -> "true",
        s"parquet.bloom.filter.expected.ndv#$c" -> ndv)
    }.toMap

  /** One provable equality probe: the schema field and the literal
    * values (any present ⇒ file must be read).
    */
  private final case class Probe(field: StructField, values: Seq[Any])

  /** Files that may contain rows satisfying `predicate`, by bloom
    * proof. Keeps everything unless the table declares bloom columns
    * AND the predicate carries an equality conjunct on one of them;
    * files a conjunct proves value-free across ALL row groups drop.
    * Always run AFTER [[FileStats.prune]] — bounds are free (already
    * in the log), footers cost a read.
    */
  def prune(conf: org.apache.hadoop.conf.Configuration, dataRoot: Path,
            files: Seq[FileStat], schema: StructType, predicate: CatExpr,
            props: Map[String, String]): Seq[FileStat] = {
    val indexed = bloomColumns(props)
    if (indexed.isEmpty || files.isEmpty) return files
    val probes = FileStats.conjuncts(predicate).flatMap(probeOf(_, schema))
      .filter(p => indexed.exists(_.equalsIgnoreCase(p.field.name)))
    if (probes.isEmpty) return files
    // Configuration lazily loads its property map; force it before
    // parallel tasks share the instance (same guard as FileStats)
    conf.size()
    import scala.collection.parallel.CollectionConverters._
    files.par.filter(f =>
      mayContain(conf, dataRoot.resolve(f.path), probes)).seq
  }

  /** The conjunct as a bloom probe, if it has a provable shape. The
    * literal must RE-ENCODE exactly into the column's domain — a probe
    * value outside it (wrong type, out of range) yields no proof and
    * the conjunct is left for the row-level filter.
    */
  private def probeOf(conjunct: CatExpr, schema: StructType): Option[Probe] = {
    def field(e: CatExpr): Option[StructField] = e match {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          if a.nameParts.length == 1 =>
        schema.fields.find(_.name == a.nameParts.head)
          .orElse(schema.fields.find(_.name.equalsIgnoreCase(a.nameParts.head)))
      case _ => None
    }
    def probe(a: CatExpr, lits: Seq[CatLit]): Option[Probe] = for {
      f <- field(a)
      vs <- traverse(lits.map(l => hashableValue(f.dataType, l)))
    } yield Probe(f, vs)
    conjunct match {
      case CatEqualTo(a, l: CatLit) => probe(a, Seq(l))
      case CatEqualTo(l: CatLit, a) => probe(a, Seq(l))
      case CatEqualNullSafe(a, l: CatLit) if l.value != null => probe(a, Seq(l))
      case CatEqualNullSafe(l: CatLit, a) if l.value != null => probe(a, Seq(l))
      case CatIn(a, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[CatLit]) =>
        probe(a, vs.map(_.asInstanceOf[CatLit]))
      case _ => None
    }
  }

  private def traverse[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None

  /** Literal → the exact JVM value the parquet writer hashed for this
    * column type; None when unprovable (null, type mismatch, overflow,
    * excluded type).
    */
  private def hashableValue(dt: DataType, l: CatLit): Option[Any] =
    (dt, l.dataType, l.value) match {
      case (_, _, null) => None
      case (IntegerType | ShortType | ByteType,
            IntegerType | ShortType | ByteType, n) =>
        Some(n.asInstanceOf[Number].intValue)
      case (DateType, DateType, n) => Some(n.asInstanceOf[Number].intValue)
      case (LongType, IntegerType | ShortType | ByteType | LongType, n) =>
        Some(n.asInstanceOf[Number].longValue)
      case (StringType, StringType, s: UTF8String) => Some(s.toString)
      case _ => None
    }

  /** Could `file` contain any probed value? True unless SOME probe's
    * values are proven absent by EVERY row group's filter. Missing
    * filters, missing columns (schema evolution), or physical types
    * that don't line up all read as "may contain".
    */
  private def mayContain(conf: org.apache.hadoop.conf.Configuration,
                         file: Path, probes: Seq[Probe]): Boolean = {
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.toUri), conf)
    val reader = ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val provenAbsent = probes.exists { p =>
        blocks.nonEmpty && blocks.forall { b =>
          b.getColumns.asScala.find(_.getPath.toDotString == p.field.name)
            .exists { cm =>
              val bf = reader.getBloomFilterDataReader(b).readBloomFilter(cm)
              bf != null && p.values.forall { v =>
                hashIn(bf, cm.getPrimitiveType.getPrimitiveTypeName, v)
                  .exists(h => !bf.findHash(h))
              }
            }
        }
      }
      !provenAbsent
    } finally reader.close()
  }

  /** Hash `v` the way the writer hashed the column's physical values;
    * None when the physical type doesn't match the expectation (evolved
    * or foreign file — no proof possible).
    */
  private def hashIn(bf: org.apache.parquet.column.values.bloomfilter.BloomFilter,
                     phys: PrimitiveTypeName, v: Any): Option[Long] =
    (phys, v) match {
      case (PrimitiveTypeName.INT32, i: Int) => Some(bf.hash(i))
      case (PrimitiveTypeName.INT64, l: Long) => Some(bf.hash(l))
      case (PrimitiveTypeName.BINARY, s: String) =>
        Some(bf.hash(Binary.fromString(s)))
      case _ => None
    }
}
