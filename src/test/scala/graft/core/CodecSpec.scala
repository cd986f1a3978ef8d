package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Codecs._

final case class Inner(tags: Seq[String], score: Double)
final case class Outer(id: Long, name: String, inner: Inner,
    attrs: Map[String, Long])

class CodecSpec extends AnyFunSuite {
  test("Int64 is decimal-string encoded (codec/codec.go:56)") {
    assert(new String(Int64Codec.encode(42L), "UTF-8") == "42")
    assert(Int64Codec.decode("-7".getBytes("UTF-8")) == -7L)
    assert(Int64Codec.decode(Int64Codec.encode(Long.MaxValue)) == Long.MaxValue)
  }

  test("String roundtrip incl. unicode") {
    val s = "héllo → 世界"
    assert(StringCodec.decode(StringCodec.encode(s)) == s)
  }

  test("StringMap roundtrip with separator chars in values") {
    val m = Map("a" -> "1", "k:2" -> "v\\1x", "" -> "", "u" -> "7:")
    assert(StringMapCodec.decode(StringMapCodec.encode(m)) == m)
  }

  test("Double binary roundtrip") {
    assert(DoubleCodec.decode(DoubleCodec.encode(3.14159)) == 3.14159)
  }

  test("javaSer roundtrip for case classes") {
    val c = javaSer[SerProbe]
    assert(c.decode(c.encode(SerProbe(1, "x"))) == SerProbe(1, "x"))
  }

  test("json codec round-trips a nested case class") {
    val codec = Codecs.json[Outer]
    val v = Outer(42L, "abc", Inner(Seq("x", "y"), 1.5), Map("k" -> 7L))
    val bytes = codec.encode(v)
    // bytes are an actual JSON document with declaration field order
    assert(new String(bytes, "UTF-8") ==
      """{"id":42,"name":"abc","inner":{"tags":["x","y"],"score":1.5},"attrs":{"k":7}}""")
    assert(codec.decode(bytes) == v)
  }

  test("json codec bytes are deterministic (oracle-hashable)") {
    val codec = Codecs.json[Outer]
    val v = Outer(1L, "n", Inner(Nil, 0.0), Map.empty)
    assert(codec.encode(v).toSeq == codec.encode(v).toSeq)
  }

  test("twoLongs codec is 16 fixed bytes and round-trips the extremes") {
    val codec = Codecs.twoLongs[(Long, Long)](identity)(Tuple2.apply)
    for (v <- Seq((0L, 0L), (Long.MinValue, Long.MaxValue), (-1L, 42L))) {
      val bytes = codec.encode(v)
      assert(bytes.length == 16)
      assert(codec.decode(bytes) == v)
    }
    // deterministic bytes — the streaming last-upsert-wins collapse
    // and any changelog hashing rely on encode being a pure function
    assert(codec.encode((7L, 9L)).toSeq == codec.encode((7L, 9L)).toSeq)
  }

  test("longArray codec is 8·len bytes, round-trips, and handles empty") {
    val c = Codecs.LongArrayCodec
    for (v <- Seq(Array.empty[Long], Array(1L), Array(Long.MinValue, -1L,
        0L, Long.MaxValue))) {
      val bytes = c.encode(v)
      assert(bytes.length == 8 * v.length)
      assert(c.decode(bytes).toSeq == v.toSeq)
    }
  }

  test("threeLongs codec is 24 fixed bytes and round-trips the extremes") {
    val codec = Codecs.threeLongs[(Long, Long, Long)](identity)(Tuple3.apply)
    for (v <- Seq((0L, 0L, 0L), (Long.MinValue, 0L, Long.MaxValue),
        (-1L, 42L, 7L))) {
      val bytes = codec.encode(v)
      assert(bytes.length == 24)
      assert(codec.decode(bytes) == v)
    }
  }

  test("json value codec decodes integers as Long and nests maps") {
    val roundtrip = JsonValueCodec.decode(JsonValueCodec.encode(
      Map("a" -> 2L, "b" -> List(1L, 2L), "c" -> "s")))
    val m = roundtrip.asInstanceOf[Map[String, Any]]
    assert(m("a") == 2L)
    assert(m("a").isInstanceOf[Long])
    assert(m("b") == List(1L, 2L))
    assert(JsonValueCodec.decode(JsonValueCodec.encode(5L)) == 5L)
    assert(JsonValueCodec.decode(JsonValueCodec.encode(null)) == null)
  }
}

case class SerProbe(a: Int, b: String)
