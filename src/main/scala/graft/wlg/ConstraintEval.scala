package graft.wlg

/** Safe evaluator for the reference's workload-spec constraint strings —
  * the reference uses Python `eval` on expressions like `"hi >= lo"`,
  * `"x not in {a, b}"`, `"a and b"` (reference: wlg/cli/main.py:286-296).
  * This is a tiny recursive-descent parser over exactly that grammar.
  *
  * Values resolve from the param row; bare identifiers not in the row are
  * treated as string literals (matching Python-spec usage in the specs).
  */
object ConstraintEval {

  sealed trait V
  case class Num(v: Double) extends V
  case class Str(v: String) extends V
  case class Bool(v: Boolean) extends V

  def evaluate(expr: String, params: Map[String, V]): Boolean = {
    val p = new Parser(expr, params)
    val r = p.parseOr()
    p.skipWs()
    require(p.eof, s"trailing input in constraint: '$expr' at ${p.pos}")
    toBool(r)
  }

  private def toBool(v: V): Boolean = v match {
    case Bool(b) => b
    case Num(n) => n != 0.0
    case Str(s) => s.nonEmpty
  }

  private class Parser(s: String, params: Map[String, V]) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit = while (!eof && s(pos).isWhitespace) pos += 1

    private def peekWord(w: String): Boolean = {
      skipWs()
      s.regionMatches(true, pos, w, 0, w.length) &&
      (pos + w.length >= s.length || !s(pos + w.length).isLetterOrDigit)
    }
    private def eatWord(w: String): Boolean =
      if (peekWord(w)) { pos += w.length; true } else false

    def parseOr(): V = {
      var l = parseAnd()
      while (eatWord("or")) l = Bool(toBool(l) || toBool(parseAnd()))
      l
    }
    def parseAnd(): V = {
      var l = parseNot()
      while (eatWord("and")) l = Bool(toBool(l) && toBool(parseNot()))
      l
    }
    def parseNot(): V =
      if (eatWord("not")) Bool(!toBool(parseNot())) else parseCmp()

    def parseCmp(): V = {
      val l = parseOperand()
      skipWs()
      if (eatWord("not")) {
        require(eatWord("in"), s"expected 'in' after 'not' at $pos")
        Bool(!inSet(l, parseSet()))
      } else if (peekWord("in") && !peekWord("inf")) {
        eatWord("in"); Bool(inSet(l, parseSet()))
      } else {
        val ops = Seq(">=", "<=", "!=", "==", ">", "<", "=")
        ops.find(op => s.startsWith(op, pos)) match {
          case Some(op) =>
            pos += op.length
            val r = parseOperand()
            Bool(compare(l, r, op))
          case None => l
        }
      }
    }

    private def inSet(v: V, set: Seq[V]): Boolean =
      set.exists(e => compare(v, e, "=="))

    private def parseSet(): Seq[V] = {
      skipWs()
      require(!eof && (s(pos) == '{' || s(pos) == '('), s"expected set at $pos")
      val close = if (s(pos) == '{') '}' else ')'
      pos += 1
      val items = scala.collection.mutable.ArrayBuffer.empty[V]
      skipWs()
      while (!eof && s(pos) != close) {
        items += parseOperand()
        skipWs()
        if (!eof && s(pos) == ',') { pos += 1; skipWs() }
      }
      require(!eof, s"unterminated set in '$s'")
      pos += 1
      items.toSeq
    }

    private def parseOperand(): V = {
      skipWs()
      require(!eof, s"unexpected end of constraint '$s'")
      val c = s(pos)
      if (c == '\'' || c == '"') {
        pos += 1
        val start = pos
        while (!eof && s(pos) != c) pos += 1
        require(!eof, "unterminated string")
        val v = s.substring(start, pos); pos += 1
        Str(v)
      } else if (c.isDigit || c == '-' || c == '+' || c == '.') {
        val start = pos
        pos += 1
        while (!eof && (s(pos).isDigit || s(pos) == '.' || s(pos) == 'e' ||
          s(pos) == 'E' || ((s(pos) == '-' || s(pos) == '+') &&
            (s(pos - 1) == 'e' || s(pos - 1) == 'E')))) pos += 1
        Num(s.substring(start, pos).toDouble)
      } else if (c == '(') {
        pos += 1
        val v = parseOr()
        skipWs()
        require(!eof && s(pos) == ')', s"expected ) at $pos")
        pos += 1
        v
      } else {
        val start = pos
        while (!eof && (s(pos).isLetterOrDigit || s(pos) == '_')) pos += 1
        require(pos > start, s"cannot parse operand at $pos in '$s'")
        val name = s.substring(start, pos)
        name.toLowerCase match {
          case "true" => Bool(true)
          case "false" => Bool(false)
          case _ => params.getOrElse(name, Str(name))
        }
      }
    }

    private def compare(l: V, r: V, op: String): Boolean = (l, r) match {
      case (Num(a), Num(b)) => cmpD(a, b, op)
      case (Str(a), Str(b)) => cmpS(a, b, op)
      case (Bool(a), Bool(b)) => cmpD(if (a) 1 else 0, if (b) 1 else 0, op)
      case (Num(a), Str(b)) => b.toDoubleOption.exists(cmpD(a, _, op))
      case (Str(a), Num(b)) => a.toDoubleOption.exists(cmpD(_, b, op))
      case _ => false
    }
    private def cmpD(a: Double, b: Double, op: String): Boolean = op match {
      case ">=" => a >= b; case "<=" => a <= b; case ">" => a > b
      case "<" => a < b; case "!=" => a != b; case "==" | "=" => a == b
    }
    private def cmpS(a: String, b: String, op: String): Boolean = op match {
      case ">=" => a >= b; case "<=" => a <= b; case ">" => a > b
      case "<" => a < b; case "!=" => a != b; case "==" | "=" => a == b
    }
  }
}
