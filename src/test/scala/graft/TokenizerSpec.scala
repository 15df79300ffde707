package graft

import graft.functions.Tokenizer

import scala.util.Random

/** Pins the exact byte semantics of the reference tokenizer
  * (reference src/main.cpp:59-74; fixtures from FIXTURES.md §1). */
class TokenizerSpec extends SparkSpec {

  private def tok(s: String) = Tokenizer.tokenizeBytes(s)

  test("basic words") {
    assert(tok("hello world hello") == Seq("hello", "world", "hello"))
  }

  test("case-sensitive: Han != han != HAN") {
    assert(tok("Han han HAN") == Seq("Han", "han", "HAN"))
  }

  test("hyphen is a delimiter") {
    assert(tok("well-known") == Seq("well", "known"))
  }

  test("digits delimit and are never tokens") {
    assert(tok("abc123def 42") == Seq("abc", "def"))
  }

  test("bytes >= 0x80 are word-chars (Finnish letters kept)") {
    assert(tok("äiti ÅBO öljy") == Seq("äiti", "ÅBO", "öljy"))
  }

  test("ASCII punctuation delimits") {
    assert(tok("foo.bar,baz!") == Seq("foo", "bar", "baz"))
  }

  test("no empty tokens") {
    assert(tok("") == Seq.empty)
    assert(tok("   ") == Seq.empty)
    assert(tok(" .,! ") == Seq.empty)
    assert(tok(null) == Seq.empty)
  }

  test("multi-byte UTF-8 punctuation glues words (documented ref delta)") {
    // Every byte of '…' (E2 80 A6) is >= 0x80, so the reference keeps it
    // inside the word; the regex product path would split here.
    assert(tok("a…b") == Seq("a…b"))
  }

  test("word flushed at end of line") {
    assert(tok("ending") == Seq("ending"))
  }

  private val rnd = new Random(42)
  private def randomAsciiLine(): String =
    (0 until rnd.nextInt(60)).map(_ => (32 + rnd.nextInt(95)).toChar).mkString

  test("property: tokens are non-empty and all word-bytes (100 random lines)") {
    (1 to 100).foreach { _ =>
      val s = randomAsciiLine()
      tok(s).foreach { w =>
        assert(w.nonEmpty)
        assert(w.forall(c => c.isLetter || c >= 0x80), s"line=$s tok=$w")
      }
    }
  }

  test("property: sum of counts == token count (agg conservation)") {
    val lines = (1 to 50).map(_ => randomAsciiLine())
    val toks = lines.flatMap(tok)
    val counted = toks.groupBy(identity).view.mapValues(_.size)
    assert(counted.values.sum == toks.size)
  }

  test("regex path and byte path agree on ASCII text (100 random lines)") {
    (1 to 100).foreach { _ =>
      val line = randomAsciiLine()
      val regexToks =
        line.split(Tokenizer.DelimiterRegex).filter(_.nonEmpty).toSeq
      assert(tok(line) == regexToks, s"line=$line")
    }
  }
}
