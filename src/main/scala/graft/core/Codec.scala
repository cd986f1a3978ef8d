package graft.core

import java.nio.charset.StandardCharsets.UTF_8

/** Encode/decode between a typed value and the wire bytes of a topic.
  *
  * Mirrors the reference's codec contract (`/root/reference/codec.go:4-7`).
  * Shipped codecs follow `/root/reference/codec/codec.go`: Bytes, String,
  * and Int64 — note Int64 is encoded as a *decimal string*
  * (`codec/codec.go:56`), which we reproduce for wire compatibility.
  *
  * `null` bytes and `null` values round-trip as tombstones and never
  * reach `encode`/`decode` — the executor short-circuits them.
  */
trait Codec[T] extends Serializable {
  def encode(value: T): Array[Byte]
  def decode(data: Array[Byte]): T
}

object Codecs {

  object BytesCodec extends Codec[Array[Byte]] {
    def encode(value: Array[Byte]): Array[Byte] = value
    def decode(data: Array[Byte]): Array[Byte] = data
  }

  object StringCodec extends Codec[String] {
    def encode(value: String): Array[Byte] = value.getBytes(UTF_8)
    def decode(data: Array[Byte]): String = new String(data, UTF_8)
  }

  /** Decimal-string encoding per `/root/reference/codec/codec.go:47-66`. */
  object Int64Codec extends Codec[Long] {
    def encode(value: Long): Array[Byte] = value.toString.getBytes(UTF_8)
    def decode(data: Array[Byte]): Long = new String(data, UTF_8).toLong
  }

  object DoubleCodec extends Codec[Double] {
    def encode(value: Double): Array[Byte] =
      java.nio.ByteBuffer.allocate(8).putDouble(value).array()
    def decode(data: Array[Byte]): Double =
      java.nio.ByteBuffer.wrap(data).getDouble
  }

  /** Deterministic codec for flat string maps — the reference's real
    * apps use JSON struct codecs
    * (`/root/reference/examples/2-clicks/main.go:41-59`). Length-prefixed
    * (`<len>:<utf8>` per key and value, keys sorted) so arbitrary
    * content round-trips without escaping ambiguity. */
  object StringMapCodec extends Codec[Map[String, String]] {
    def encode(value: Map[String, String]): Array[Byte] = {
      val sb = new StringBuilder
      value.toSeq.sortBy(_._1).foreach { case (k, v) =>
        sb.append(k.length).append(':').append(k)
        sb.append(v.length).append(':').append(v)
      }
      sb.toString.getBytes(UTF_8)
    }
    def decode(data: Array[Byte]): Map[String, String] = {
      val s = new String(data, UTF_8)
      val out = Map.newBuilder[String, String]
      var i = 0
      def readOne(): String = {
        val colon = s.indexOf(':', i)
        val len = s.substring(i, colon).toInt
        val v = s.substring(colon + 1, colon + 1 + len)
        i = colon + 1 + len
        v
      }
      while (i < s.length) out += (readOne() -> readOne())
      out.result()
    }
  }

  /** Typed JSON codec for (possibly nested) case classes — the engine's
    * analogue of the reference's JSON struct codecs
    * (`/root/reference/examples/2-clicks/main.go:41-59`,
    * `examples/3-messaging/message.go:21-40`): goka's real apps marshal
    * their state/messages as JSON, and so can ours. jackson-module-scala
    * ships with Spark, so no extra dependency; the mapper is rebuilt
    * lazily per executor (ObjectMapper is not serializable). Field order
    * follows constructor declaration — deterministic bytes for
    * hash-exact oracles. */
  def json[T](implicit ct: scala.reflect.ClassTag[T]): Codec[T] =
    new Codec[T] {
      def encode(value: T): Array[Byte] =
        JsonMapper.mapper.writeValueAsBytes(value)
      def decode(data: Array[Byte]): T =
        JsonMapper.mapper.readValue(data,
          ct.runtimeClass.asInstanceOf[Class[T]])
    }

  /** Fixed-width binary codec for two-long state records: 16 bytes
    * big-endian, no parse or allocation churn beyond the output array.
    * Built for per-message hot state folds (streaming dedup st08/st10)
    * where a JSON struct codec's ser/de dominated the micro-batch cost
    * — the reference makes the same move when a topic gets hot: swap
    * the convenience JSON codec for a hand-rolled binary one behind the
    * identical interface (`/root/reference/codec.go:4-7`). */
  def twoLongs[T](pack: T => (Long, Long))(unpack: (Long, Long) => T): Codec[T] =
    new Codec[T] {
      def encode(value: T): Array[Byte] = {
        val (a, b) = pack(value)
        java.nio.ByteBuffer.allocate(16).putLong(a).putLong(b).array()
      }
      def decode(data: Array[Byte]): T = {
        val buf = java.nio.ByteBuffer.wrap(data)
        unpack(buf.getLong, buf.getLong)
      }
    }

  /** Fixed-width 24-byte codec for three-long states — same hot-fold
    * rationale as [[twoLongs]]. */
  def threeLongs[T](pack: T => (Long, Long, Long))(
      unpack: (Long, Long, Long) => T): Codec[T] =
    new Codec[T] {
      def encode(value: T): Array[Byte] = {
        val (a, b, c) = pack(value)
        java.nio.ByteBuffer.allocate(24).putLong(a).putLong(b).putLong(c)
          .array()
      }
      def decode(data: Array[Byte]): T = {
        val buf = java.nio.ByteBuffer.wrap(data)
        unpack(buf.getLong, buf.getLong, buf.getLong)
      }
    }

  /** Packed big-endian long array — variable-length fixed-stride state
    * (e.g. a sliding-window deque of (ts, value) pairs) without any
    * per-element framing. 8·len bytes. */
  object LongArrayCodec extends Codec[Array[Long]] {
    def encode(value: Array[Long]): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(8 * value.length)
      value.foreach(buf.putLong)
      buf.array()
    }
    def decode(data: Array[Byte]): Array[Long] = {
      val buf = java.nio.ByteBuffer.wrap(data)
      Array.fill(data.length / 8)(buf.getLong)
    }
  }

  /** Untyped JSON value codec (Long/Double/Boolean/String/Map/List,
    * integers always decode as Long) — used for visitor meta payloads,
    * which are schemaless by contract (`processor.go:954-996` passes an
    * opaque `interface{}`). */
  object JsonValueCodec extends Codec[Any] {
    def encode(value: Any): Array[Byte] =
      JsonMapper.mapper.writeValueAsBytes(value)
    def decode(data: Array[Byte]): Any =
      JsonMapper.mapper.readValue(data, classOf[Object])
  }

  private object JsonMapper {
    @transient lazy val mapper: com.fasterxml.jackson.databind.ObjectMapper = {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      m.registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
      // ints -> Long, floats -> Double: stable types for callback matches
      m.enable(com.fasterxml.jackson.databind.DeserializationFeature.USE_LONG_FOR_INTS)
      m
    }
  }

  /** Columnar twin of [[json]]: decode a JSON-codec'd BINARY value
    * column into a typed struct column with Catalyst `from_json` — the
    * relational fast path for reading a goka table as a DataFrame
    * (codegen'd, no per-row codec object). `CodecSpec`/`g17` assert it
    * decodes exactly what [[json]] encodes. */
  def fromJsonValue[T](value: org.apache.spark.sql.Column)(
      implicit enc: org.apache.spark.sql.Encoder[T]): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.from_json(
      value.cast("string"), enc.schema)

  /** Java-serialization codec for arbitrary case classes — convenient in
    * tests; real deployments should define an explicit codec. */
  def javaSer[T <: Serializable]: Codec[T] = new Codec[T] {
    def encode(value: T): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(value); oos.close(); bos.toByteArray
    }
    def decode(data: Array[Byte]): T = {
      val ois = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(data))
      ois.readObject().asInstanceOf[T]
    }
  }
}
