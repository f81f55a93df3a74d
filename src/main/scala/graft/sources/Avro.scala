package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.io.{ByteArrayOutputStream, EOFException, InputStream, OutputStream}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Minimal Apache Avro — the published Object Container File format and
  * binary encoding (avro.apache.org/docs/current/specification), the way
  * [[Tfrecord]] hand-codes protobuf: no Avro jars are on the classpath,
  * and Iceberg's manifest/manifest-list files are Avro containers, so
  * the spec subset those files use is implemented directly —
  *
  *  - container: `Obj\1` magic, file-metadata map (`avro.schema` JSON,
  *    `avro.codec`), 16-byte sync marker, then blocks of
  *    `(count, byteSize, data, sync)`; codecs `null` and `deflate`
  *    (raw, nowrap) on read, `null` on write;
  *  - encoding: zigzag-varint int/long, little-endian IEEE float/double,
  *    length-prefixed UTF-8 strings / bytes, 1-byte boolean, index-then-
  *    value unions, field-sequential records, block-sequenced arrays and
  *    maps (negative block counts carry a byte size, per spec), enum as
  *    int index, `fixed` as raw width bytes;
  *  - schemas: the JSON grammar with named-type definitions and
  *    references (Iceberg reuses record names like `r102` for partition
  *    structs), plus attribute passthrough (`field-id`, `logicalType`
  *    are carried but not interpreted — Iceberg keys columns by
  *    field-id; this layer keys by NAME, which the Iceberg layer maps).
  *
  * Values decode to plain Scala: records → `Map[String, Any]`, arrays →
  * `Vector[Any]`, maps → `Map[String, Any]`, bytes/fixed →
  * `Array[Byte]`, enum → symbol `String`, union → the branch value
  * (null included). The writer takes the same shapes.
  *
  * Scale shape: manifests are METADATA (file-granular, not row-mass) —
  * a manifest list is O(manifests) and a manifest O(files); both parse
  * driver-side exactly like Delta's `_delta_log` JSON actions do in
  * [[DeltaImport]]. Row-mass data stays in parquet.
  */
object Avro {

  // ---- schema model ------------------------------------------------

  sealed trait Schema
  case object SNull extends Schema
  case object SBoolean extends Schema
  case object SInt extends Schema
  case object SLong extends Schema
  case object SFloat extends Schema
  case object SDouble extends Schema
  case object SBytes extends Schema
  case object SString extends Schema
  final case class SFixed(name: String, size: Int) extends Schema
  final case class SEnum(name: String, symbols: Vector[String]) extends Schema
  final case class SArray(items: Schema) extends Schema
  final case class SMap(values: Schema) extends Schema
  final case class SUnion(branches: Vector[Schema]) extends Schema
  final case class SField(name: String, schema: Schema,
                          hasDefault: Boolean = false)
  final case class SRecord(name: String, fields: Vector[SField])
      extends Schema

  private val mapper = new ObjectMapper()

  /** Parse a schema JSON string (named types registered and resolvable
    * by reference, per the spec's named-type rule).
    */
  def parseSchema(json: String): Schema =
    parseNode(mapper.readTree(json), mutable.Map.empty)

  private def parseNode(n: JsonNode,
                        named: mutable.Map[String, Schema]): Schema = {
    if (n.isTextual) return primitiveOrRef(n.asText(), named)
    if (n.isArray)
      return SUnion(n.elements().asScala.map(parseNode(_, named)).toVector)
    require(n.isObject, s"unsupported Avro schema node: $n")
    n.path("type").asText() match {
      case "record" =>
        val name = n.path("name").asText()
        // registered AFTER its fields parse: EARLIER-defined named
        // types resolve by reference (all Iceberg manifests need);
        // self-referential records fail loud as an unresolved
        // named-type reference rather than looping
        val fields = n.path("fields").elements().asScala.map { f =>
          SField(f.path("name").asText(),
            parseNode(f.get("type"), named), f.has("default"))
        }.toVector
        val r = SRecord(name, fields)
        named(name) = r
        r
      case "array" => SArray(parseNode(n.get("items"), named))
      case "map" => SMap(parseNode(n.get("values"), named))
      case "fixed" =>
        val f = SFixed(n.path("name").asText(), n.path("size").asInt())
        named(f.name) = f
        f
      case "enum" =>
        val e = SEnum(n.path("name").asText(),
          n.path("symbols").elements().asScala.map(_.asText()).toVector)
        named(e.name) = e
        e
      case other => primitiveOrRef(other, named)
    }
  }

  private def primitiveOrRef(t: String,
                             named: mutable.Map[String, Schema]): Schema =
    t match {
      case "null" => SNull
      case "boolean" => SBoolean
      case "int" => SInt
      case "long" => SLong
      case "float" => SFloat
      case "double" => SDouble
      case "bytes" => SBytes
      case "string" => SString
      case ref => named.getOrElse(ref,
        throw new IllegalArgumentException(
          s"unresolved Avro named-type reference: $ref"))
    }

  // ---- binary decoder ----------------------------------------------

  final class Decoder(buf: Array[Byte], var pos: Int = 0) {
    def hasMore: Boolean = pos < buf.length
    private def byte(): Int = {
      if (pos >= buf.length) throw new EOFException("Avro decode past end")
      val b = buf(pos) & 0xff; pos += 1; b
    }
    def readLong(): Long = {
      var shift = 0; var acc = 0L; var b = 0
      do {
        b = byte()
        acc |= (b & 0x7fL) << shift
        shift += 7
        require(shift <= 70, "varint too long")
      } while ((b & 0x80) != 0)
      (acc >>> 1) ^ -(acc & 1) // zigzag
    }
    def readInt(): Int = readLong().toInt
    def readBoolean(): Boolean = byte() != 0
    def readFloat(): Float = {
      val v = byte() | (byte() << 8) | (byte() << 16) | (byte() << 24)
      java.lang.Float.intBitsToFloat(v)
    }
    def readDouble(): Double = {
      var v = 0L
      var i = 0
      while (i < 8) { v |= (byte().toLong << (8 * i)); i += 1 }
      java.lang.Double.longBitsToDouble(v)
    }
    def readFixed(n: Int): Array[Byte] = {
      require(pos + n <= buf.length, "Avro fixed past end")
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n
      out
    }
    def readBytes(): Array[Byte] = {
      val n = readLong()
      require(n >= 0 && n <= Int.MaxValue, s"bad bytes length $n")
      readFixed(n.toInt)
    }
    def readString(): String =
      new String(readBytes(), java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Decode one datum of `schema`. */
  def decode(d: Decoder, schema: Schema): Any = schema match {
    case SNull => null
    case SBoolean => d.readBoolean()
    case SInt => d.readInt()
    case SLong => d.readLong()
    case SFloat => d.readFloat()
    case SDouble => d.readDouble()
    case SBytes => d.readBytes()
    case SString => d.readString()
    case SFixed(_, n) => d.readFixed(n)
    case SEnum(_, symbols) => symbols(d.readInt())
    case SUnion(branches) =>
      val i = d.readInt()
      require(i >= 0 && i < branches.length, s"union branch $i of ${branches.length}")
      decode(d, branches(i))
    case SRecord(_, fields) =>
      fields.iterator.map(f => f.name -> decode(d, f.schema)).toMap
    case SArray(items) =>
      val out = Vector.newBuilder[Any]
      var n = d.readLong()
      while (n != 0) {
        if (n < 0) { d.readLong(); n = -n } // block byte size, skipped
        var i = 0L
        while (i < n) { out += decode(d, items); i += 1 }
        n = d.readLong()
      }
      out.result()
    case SMap(values) =>
      val out = Map.newBuilder[String, Any]
      var n = d.readLong()
      while (n != 0) {
        if (n < 0) { d.readLong(); n = -n }
        var i = 0L
        while (i < n) { out += (d.readString() -> decode(d, values)); i += 1 }
        n = d.readLong()
      }
      out.result()
  }

  // ---- binary encoder ----------------------------------------------

  final class Encoder(val out: ByteArrayOutputStream = new ByteArrayOutputStream()) {
    def writeLong(v: Long): Unit = {
      var n = (v << 1) ^ (v >> 63) // zigzag
      while ((n & ~0x7fL) != 0) {
        out.write(((n & 0x7f) | 0x80).toInt)
        n >>>= 7
      }
      out.write(n.toInt)
    }
    def writeInt(v: Int): Unit = writeLong(v.toLong)
    def writeBoolean(v: Boolean): Unit = out.write(if (v) 1 else 0)
    def writeFloat(v: Float): Unit = {
      val b = java.lang.Float.floatToIntBits(v)
      var i = 0
      while (i < 4) { out.write((b >>> (8 * i)) & 0xff); i += 1 }
    }
    def writeDouble(v: Double): Unit = {
      val b = java.lang.Double.doubleToLongBits(v)
      var i = 0
      while (i < 8) { out.write(((b >>> (8 * i)) & 0xff).toInt); i += 1 }
    }
    def writeFixed(b: Array[Byte]): Unit = out.write(b, 0, b.length)
    def writeBytes(b: Array[Byte]): Unit = { writeLong(b.length.toLong); writeFixed(b) }
    def writeString(s: String): Unit =
      writeBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def toBytes: Array[Byte] = out.toByteArray
  }

  /** Encode one datum of `schema`. Unions pick the first branch the
    * value fits (`null` → the null branch) — sufficient for the
    * optional-field `["null", T]` unions interop schemas use.
    */
  def encode(e: Encoder, schema: Schema, v: Any): Unit = schema match {
    case SNull => require(v == null, s"expected null, got $v")
    case SBoolean => e.writeBoolean(v.asInstanceOf[Boolean])
    case SInt => e.writeInt(v.asInstanceOf[Number].intValue())
    case SLong => e.writeLong(v.asInstanceOf[Number].longValue())
    case SFloat => e.writeFloat(v.asInstanceOf[Number].floatValue())
    case SDouble => e.writeDouble(v.asInstanceOf[Number].doubleValue())
    case SBytes => e.writeBytes(v.asInstanceOf[Array[Byte]])
    case SString => e.writeString(v.asInstanceOf[String])
    case SFixed(name, n) =>
      val b = v.asInstanceOf[Array[Byte]]
      require(b.length == n, s"fixed $name needs $n bytes, got ${b.length}")
      e.writeFixed(b)
    case SEnum(name, symbols) =>
      val i = symbols.indexOf(v.asInstanceOf[String])
      require(i >= 0, s"enum $name has no symbol $v")
      e.writeInt(i)
    case SUnion(branches) =>
      val i =
        if (v == null) branches.indexWhere(_ == SNull)
        else branches.indexWhere(_ != SNull)
      require(i >= 0, s"no union branch for $v")
      e.writeInt(i)
      encode(e, branches(i), v)
    case SRecord(name, fields) =>
      val m = v.asInstanceOf[Map[String, Any]]
      fields.foreach { f =>
        require(m.contains(f.name), s"record $name missing field ${f.name}")
        encode(e, f.schema, m(f.name))
      }
    case SArray(items) =>
      val xs = v.asInstanceOf[Seq[Any]]
      if (xs.nonEmpty) {
        e.writeLong(xs.length.toLong)
        xs.foreach(encode(e, items, _))
      }
      e.writeLong(0L)
    case SMap(values) =>
      val m = v.asInstanceOf[Map[String, Any]]
      if (m.nonEmpty) {
        e.writeLong(m.size.toLong)
        m.foreach { case (k, x) => e.writeString(k); encode(e, values, x) }
      }
      e.writeLong(0L)
  }

  // ---- object container file -----------------------------------------

  private val Magic = Array[Byte]('O', 'b', 'j', 1)

  final case class Container(schemaJson: String, schema: Schema,
                             meta: Map[String, Array[Byte]],
                             records: Vector[Any])

  /** Read a whole container file (metadata-sized by contract — Iceberg
    * manifests are file-granular).
    */
  def readContainer(in: InputStream): Container = {
    val all = {
      val bo = new ByteArrayOutputStream()
      val buf = new Array[Byte](1 << 16)
      var k = in.read(buf)
      while (k >= 0) { if (k > 0) bo.write(buf, 0, k); k = in.read(buf) }
      bo.toByteArray
    }
    require(all.length > 20 && java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(all, 0, 4), Magic),
      "not an Avro object container file (bad magic)")
    val d = new Decoder(all, 4)
    // file metadata: a map<string, bytes>
    val meta = Map.newBuilder[String, Array[Byte]]
    var n = d.readLong()
    while (n != 0) {
      if (n < 0) { d.readLong(); n = -n }
      var i = 0L
      while (i < n) { meta += (d.readString() -> d.readBytes()); i += 1 }
      n = d.readLong()
    }
    val metaMap = meta.result()
    val schemaJson = new String(metaMap.getOrElse("avro.schema",
      throw new IllegalArgumentException("Avro container lacks avro.schema")),
      java.nio.charset.StandardCharsets.UTF_8)
    val codec = metaMap.get("avro.codec")
      .map(new String(_, java.nio.charset.StandardCharsets.UTF_8))
      .getOrElse("null")
    require(codec == "null" || codec == "deflate",
      s"unsupported Avro codec: $codec (null and deflate are supported)")
    val schema = parseSchema(schemaJson)
    val sync = d.readFixed(16)
    val records = Vector.newBuilder[Any]
    while (d.hasMore) {
      val count = d.readLong()
      val size = d.readLong()
      require(size >= 0 && size <= Int.MaxValue, s"bad block size $size")
      val raw = d.readFixed(size.toInt)
      val data =
        if (codec == "null") raw
        else { // raw deflate, nowrap per spec
          val inf = new java.util.zip.Inflater(true)
          try {
            inf.setInput(raw)
            val bo = new ByteArrayOutputStream(raw.length * 4)
            val buf = new Array[Byte](1 << 16)
            while (!inf.finished()) {
              val k = inf.inflate(buf)
              if (k == 0 && inf.needsInput())
                throw new java.util.zip.DataFormatException("truncated deflate block")
              bo.write(buf, 0, k)
            }
            bo.toByteArray
          } finally inf.end()
        }
      val bd = new Decoder(data)
      var i = 0L
      while (i < count) { records += decode(bd, schema); i += 1 }
      val blockSync = d.readFixed(16)
      require(java.util.Arrays.equals(blockSync, sync),
        "Avro block sync marker mismatch (corrupt container)")
    }
    Container(schemaJson, schema, metaMap, records.result())
  }

  /** Write a container file (null codec, one block — manifests are
    * metadata-sized).
    */
  def writeContainer(out: OutputStream, schemaJson: String,
                     records: Seq[Any],
                     extraMeta: Map[String, String] = Map.empty): Unit = {
    val schema = parseSchema(schemaJson)
    val e = new Encoder()
    e.writeFixed(Magic)
    val meta: Map[String, Array[Byte]] =
      (extraMeta.map { case (k, v) =>
        k -> v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      }) ++ Map(
        "avro.schema" -> schemaJson.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        "avro.codec" -> "null".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    e.writeLong(meta.size.toLong)
    meta.foreach { case (k, v) => e.writeString(k); e.writeBytes(v) }
    e.writeLong(0L)
    // deterministic sync marker: derived from the schema+record count so
    // identical writes are byte-identical (reruns must not churn bytes)
    val sync = java.security.MessageDigest.getInstance("MD5")
      .digest(s"graft-avro:$schemaJson:${records.size}"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    e.writeFixed(sync)
    if (records.nonEmpty) {
      val be = new Encoder()
      records.foreach(encode(be, schema, _))
      val data = be.toBytes
      e.writeLong(records.size.toLong)
      e.writeLong(data.length.toLong)
      e.writeFixed(data)
      e.writeFixed(sync)
    }
    out.write(e.toBytes)
  }
}
