package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Codecs._

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
}

case class SerProbe(a: Int, b: String)
