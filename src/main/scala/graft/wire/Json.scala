package graft.wire

import scala.collection.mutable

/** Minimal dependency-free JSON reader/writer for the wire format
  * (reference serializes every object to versioned JSON,
  * serializable.py:10-15; zero-egress build means no JSON library). AST:
  * Map[String, Any] | List[Any] | String | Double | Long | Boolean | null.
  */
object Json {

  def write(v: Any): String = {
    val sb = new StringBuilder
    writeTo(v, sb)
    sb.toString
  }

  private def writeTo(v: Any, sb: StringBuilder): Unit = v match {
    case null => sb.append("null")
    case s: String => writeString(s, sb)
    case b: Boolean => sb.append(b.toString)
    case i: Int => sb.append(i.toString)
    case l: Long => sb.append(l.toString)
    case d: Double =>
      if (d.isNaN || d.isInfinite)
        throw new IllegalArgumentException(s"non-finite number: $d")
      sb.append(d.toString)
    case m: collection.Map[_, _] =>
      sb.append('{')
      var first = true
      m.foreach { case (k, value) =>
        if (!first) sb.append(',')
        first = false
        writeString(k.toString, sb); sb.append(':'); writeTo(value, sb)
      }
      sb.append('}')
    case xs: Iterable[_] =>
      sb.append('[')
      var first = true
      xs.foreach { x =>
        if (!first) sb.append(',')
        first = false
        writeTo(x, sb)
      }
      sb.append(']')
    case other =>
      throw new IllegalArgumentException(s"not JSON-encodable: $other")
  }

  private def writeString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  def parse(s: String): Any = {
    val p = new Parser(s)
    val v = p.parseValue()
    p.skipWs()
    require(p.eof, s"trailing content at offset ${p.pos}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    private def expect(c: Char): Unit = {
      require(!eof && s.charAt(pos) == c, s"expected '$c' at $pos")
      pos += 1
    }

    def parseValue(): Any = {
      skipWs()
      require(!eof, "unexpected end of input")
      s.charAt(pos) match {
        case '{' => parseObject()
        case '[' => parseArray()
        case '"' => parseString()
        case 't' => literal("true", true)
        case 'f' => literal("false", false)
        case 'n' => literal("null", null)
        case _   => parseNumber()
      }
    }

    private def literal(text: String, v: Any): Any = {
      require(s.regionMatches(pos, text, 0, text.length), s"bad literal at $pos")
      pos += text.length
      v
    }

    private def parseObject(): Map[String, Any] = {
      expect('{'); skipWs()
      val m = mutable.LinkedHashMap.empty[String, Any]
      if (!eof && s.charAt(pos) == '}') { pos += 1; return m.toMap }
      var done = false
      while (!done) {
        skipWs()
        val k = parseString()
        skipWs(); expect(':')
        m(k) = parseValue()
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect('}'); done = true }
      }
      m.toMap
    }

    private def parseArray(): List[Any] = {
      expect('['); skipWs()
      val xs = mutable.ListBuffer.empty[Any]
      if (!eof && s.charAt(pos) == ']') { pos += 1; return xs.toList }
      var done = false
      while (!done) {
        xs += parseValue()
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect(']'); done = true }
      }
      xs.toList
    }

    private def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s.charAt(pos) != '"') {
        s.charAt(pos) match {
          case '\\' =>
            pos += 1
            s.charAt(pos) match {
              case '"'  => sb.append('"')
              case '\\' => sb.append('\\')
              case '/'  => sb.append('/')
              case 'n'  => sb.append('\n')
              case 'r'  => sb.append('\r')
              case 't'  => sb.append('\t')
              case 'b'  => sb.append('\b')
              case 'f'  => sb.append('\f')
              case 'u' =>
                sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
                pos += 4
              case other => throw new IllegalArgumentException(s"bad escape \\$other")
            }
          case c => sb.append(c)
        }
        pos += 1
      }
      pos += 1
      sb.toString
    }

    private def parseNumber(): Any = {
      val start = pos
      while (!eof && "+-0123456789.eE".indexOf(s.charAt(pos)) >= 0) pos += 1
      val text = s.substring(start, pos)
      if (text.exists(c => c == '.' || c == 'e' || c == 'E')) text.toDouble
      else text.toLong
    }
  }
}
