package graft.wlg

import graft.wlg.WorkloadGen._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** YAML workload-spec parse + emit (G8; reference: workload specs are
  * YAML documents like workload_spec/spec_tpch_Q1.yaml and the emitter
  * is wlg/emit/yaml_emit.py — the reference round-trips YAML on both
  * ends of the pipeline, where round 3 only had Scala case classes and
  * JSON out).
  *
  * No YAML library resolves offline, so this implements the subset the
  * spec documents actually use: indentation-nested block maps, `- ` list
  * items (scalar, flow, or inline-map with indented continuation), flow
  * maps `{k: v, ...}` and lists `[a, b]`, literal block scalars `|`,
  * single/double-quoted scalars, and `#` comments. Anchors, aliases,
  * multi-docs, and folded scalars are out of scope and rejected rather
  * than misparsed.
  */
object YamlSpec {

  // ---- generic YAML subset ------------------------------------------

  sealed trait Y {
    def asMap: Map[String, Y] = this match {
      case YMap(e) => e.toMap
      case other => throw new IllegalArgumentException(s"expected map, got $other")
    }
    def asSeq: Seq[Y] = this match {
      case YSeq(items) => items
      case other => throw new IllegalArgumentException(s"expected list, got $other")
    }
    def str: String = this match {
      case YScalar(v) => v
      case other => throw new IllegalArgumentException(s"expected scalar, got $other")
    }
  }
  case class YMap(entries: Vector[(String, Y)]) extends Y
  case class YSeq(items: Vector[Y]) extends Y
  case class YScalar(value: String) extends Y

  private case class Line(indent: Int, text: String, raw: String)

  def parse(text: String): Y = {
    val lines = text.split("\n", -1).toVector.zipWithIndex.flatMap { case (raw, _) =>
      val t = raw.dropWhile(_ == ' ')
      if (t.isEmpty || t.startsWith("#")) None
      else Some(Line(raw.length - t.length, stripTrailingComment(t).trim, raw))
    }
    require(lines.nonEmpty, "empty YAML document")
    val (v, rest) = parseBlock(lines, 0, lines.head.indent)
    require(rest >= lines.length, s"trailing content at '${lines(rest).text}'")
    v
  }

  /** Drop a ` # comment` tail outside quotes. */
  private def stripTrailingComment(s: String): String = {
    var inS = false; var inD = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'' && !inD) inS = !inS
      else if (c == '"' && !inS) inD = !inD
      else if (c == '#' && !inS && !inD && i > 0 && s.charAt(i - 1) == ' ')
        return s.substring(0, i)
      i += 1
    }
    s
  }

  private def parseBlock(lines: Vector[Line], start: Int, indent: Int): (Y, Int) = {
    val first = lines(start)
    if (first.text == "-" || first.text.startsWith("- ")) parseSeq(lines, start, indent)
    else parseMap(lines, start, indent)
  }

  private def parseMap(lines: Vector[Line], start: Int, indent: Int): (Y, Int) = {
    var i = start
    val entries = Vector.newBuilder[(String, Y)]
    while (i < lines.length && lines(i).indent == indent && !lines(i).text.startsWith("- ")) {
      val l = lines(i).text
      val ci = topLevelColon(l)
      require(ci >= 0, s"expected 'key: value', got '$l'")
      val key = unquote(l.substring(0, ci).trim)
      val rest = l.substring(ci + 1).trim
      if (rest.isEmpty) {
        // nested block (map or list) at deeper indent, or empty value
        if (i + 1 < lines.length && lines(i + 1).indent > indent) {
          val (v, ni) = parseBlock(lines, i + 1, lines(i + 1).indent)
          entries += key -> v
          i = ni
        } else { entries += key -> YScalar(""); i += 1 }
      } else if (rest == "|") {
        val (s, ni) = blockScalar(lines, i + 1, indent)
        entries += key -> YScalar(s)
        i = ni
      } else {
        entries += key -> parseFlow(rest)
        i += 1
      }
    }
    (YMap(entries.result()), i)
  }

  private def parseSeq(lines: Vector[Line], start: Int, indent: Int): (Y, Int) = {
    var i = start
    val items = Vector.newBuilder[Y]
    while (i < lines.length && lines(i).indent == indent
      && (lines(i).text == "-" || lines(i).text.startsWith("- "))) {
      val rest = lines(i).text.drop(1).trim
      if (rest.isEmpty) {
        val (v, ni) = parseBlock(lines, i + 1, lines(i + 1).indent)
        items += v; i = ni
      } else {
        val ci = topLevelColon(rest)
        if (ci >= 0 && !rest.startsWith("{") && !rest.startsWith("[")
          && !rest.startsWith("\"") && !rest.startsWith("'")) {
          // inline first entry of a block map; continuation entries sit at
          // the indent of the inline key (reference style: `- id: X`)
          val itemIndent = lines(i).indent + (lines(i).text.length - rest.length)
          val synthetic = Line(itemIndent, rest, rest)
          val tail = lines.patch(i, Seq(synthetic), 1)
          val (v, ni) = parseMap(tail, i, itemIndent)
          items += v; i = ni
        } else { items += parseFlow(rest); i += 1 }
      }
    }
    (YSeq(items.result()), i)
  }

  /** Literal block scalar `|`: lines more indented than the key, common
    * indent stripped, joined with newlines.
    */
  private def blockScalar(lines: Vector[Line], start: Int, keyIndent: Int): (String, Int) = {
    var i = start
    val collected = Vector.newBuilder[String]
    var common = Int.MaxValue
    while (i < lines.length && lines(i).indent > keyIndent) {
      common = math.min(common, lines(i).indent)
      collected += lines(i).raw
      i += 1
    }
    val body = collected.result().map(r => r.drop(math.min(common, r.length)))
    (body.mkString("\n") + "\n", i)
  }

  /** First `:` that separates key from value (followed by space/EOL,
    * outside quotes and brackets).
    */
  private def topLevelColon(s: String): Int = {
    var depth = 0; var inS = false; var inD = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'' && !inD) inS = !inS
      else if (c == '"' && !inS) inD = !inD
      else if (!inS && !inD) c match {
        case '{' | '[' => depth += 1
        case '}' | ']' => depth -= 1
        case ':' if depth == 0 && (i + 1 == s.length || s.charAt(i + 1) == ' ') => return i
        case _ => ()
      }
      i += 1
    }
    -1
  }

  private def parseFlow(s: String): Y = {
    val t = s.trim
    if (t.startsWith("{")) {
      require(t.endsWith("}"), s"unterminated flow map: $t")
      val inner = t.substring(1, t.length - 1).trim
      if (inner.isEmpty) YMap(Vector.empty)
      else YMap(splitFlow(inner).map { e =>
        val ci = topLevelColon(e)
        require(ci >= 0, s"expected 'k: v' in flow map, got '$e'")
        unquote(e.substring(0, ci).trim) -> parseFlow(e.substring(ci + 1))
      }.toVector)
    } else if (t.startsWith("[")) {
      require(t.endsWith("]"), s"unterminated flow list: $t")
      val inner = t.substring(1, t.length - 1).trim
      if (inner.isEmpty) YSeq(Vector.empty)
      else YSeq(splitFlow(inner).map(parseFlow).toVector)
    } else {
      require(t != "|" && !t.startsWith("&") && !t.startsWith("*") && t != ">",
        s"unsupported YAML construct: $t")
      YScalar(unquote(t))
    }
  }

  /** Split on top-level commas (outside quotes/brackets). */
  private def splitFlow(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var inS = false; var inD = false
    var last = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'' && !inD) inS = !inS
      else if (c == '"' && !inS) inD = !inD
      else if (!inS && !inD) c match {
        case '{' | '[' => depth += 1
        case '}' | ']' => depth -= 1
        case ',' if depth == 0 => out += s.substring(last, i).trim; last = i + 1
        case _ => ()
      }
      i += 1
    }
    out += s.substring(last).trim
    out.result()
  }

  private def unquote(s: String): String =
    if (s.length >= 2 && s.startsWith("\"") && s.endsWith("\""))
      s.substring(1, s.length - 1).replace("\\\"", "\"").replace("\\n", "\n").replace("\\\\", "\\")
    else if (s.length >= 2 && s.startsWith("'") && s.endsWith("'"))
      s.substring(1, s.length - 1).replace("''", "'")
    else s

  // ---- spec schema <-> case classes ---------------------------------

  /** Parse a spec document:
    * {{{
    * generation: {n: 10, mode: copula, seed: 42, rho: 0.4}
    * templates:
    *   - name: q1
    *     sql: |
    *       SELECT ... WHERE x BETWEEN :a_lo AND :a_hi
    *     params:
    *       - {rule: range, name: a, column: x, selectivity: 0.1}
    *     constraints:
    *       - "a_lo <= a_hi"
    * }}}
    */
  def parseSpec(text: String): Seq[TemplateSpec] = {
    val doc = parse(text).asMap
    val gen = doc.get("generation").map(_.asMap).getOrElse(Map.empty)
    def gi(k: String, d: Long): Long = gen.get(k).map(_.str.toLong).getOrElse(d)
    def gd(k: String, d: Double): Double = gen.get(k).map(_.str.toDouble).getOrElse(d)
    val mode = gen.get("mode").map(_.str).getOrElse("random")
    doc.getOrElse("templates",
      throw new IllegalArgumentException("spec has no 'templates' list")).asSeq.map { t =>
      val m = t.asMap
      TemplateSpec(
        name = m("name").str,
        sql = m("sql").str.stripLineEnd,
        params = m.get("params").map(_.asSeq).getOrElse(Nil).map(paramFromYaml),
        constraints = m.get("constraints").map(_.asSeq.map(_.str)).getOrElse(Nil),
        n = gi("n", 10).toInt,
        mode = mode,
        seed = gi("seed", 42L),
        rho = gd("rho", 0.4))
    }
  }

  private def paramFromYaml(y: Y): ParamRule = {
    val m = y.asMap
    def s(k: String) = m(k).str
    def oi(k: String, d: Int) = m.get(k).map(_.str.toInt).getOrElse(d)
    def ob(k: String) = m.get(k).exists(_.str.toBoolean)
    s("rule") match {
      case "range" => RangeParam(s("name"), s("column"), s("selectivity").toDouble)
      case "interval" => IntervalParam(s("name"), s("column"),
        s("width_ratio").toDouble, ob("int_align"),
        m.get("width_ratio_hi").map(_.str.toDouble),
        m.get("out").map(_.str).getOrElse("num"))
      case "int" => UniformIntParam(s("name"), s("lo").toInt, s("hi").toInt)
      case "eq" => EqParam(s("name"), s("column"))
      case "date_lag" => DateLagParam(s("name"), s("column"), s("anchor"),
        oi("lag_days", 0), oi("width_days", 1), oi("max_start_gap_days", 0))
      case "cat_window" => CatWindowParam(s("name"), s("column"), oi("k", 1))
      case other => throw new IllegalArgumentException(s"unknown param rule $other")
    }
  }

  /** Emit specs back to the same YAML shape (parseSpec . toYaml == id;
    * generation settings come from the first spec — one document is one
    * generation run, like the reference's per-spec files).
    */
  def toYaml(specs: Seq[TemplateSpec]): String = {
    require(specs.nonEmpty, "no specs to emit")
    val g = specs.head
    val sb = new StringBuilder
    sb ++= s"generation: {n: ${g.n}, mode: ${g.mode}, seed: ${g.seed}, rho: ${g.rho}}\n"
    sb ++= "templates:\n"
    specs.foreach { t =>
      sb ++= s"  - name: ${t.name}\n"
      sb ++= "    sql: |\n"
      t.sql.split("\n", -1).foreach(l => sb ++= s"      $l\n")
      if (t.params.nonEmpty) {
        sb ++= "    params:\n"
        t.params.foreach(p => sb ++= s"      - ${paramToFlow(p)}\n")
      }
      if (t.constraints.nonEmpty) {
        sb ++= "    constraints:\n"
        t.constraints.foreach(c => sb ++= s"      - ${quote(c)}\n")
      }
    }
    sb.result()
  }

  private def paramToFlow(p: ParamRule): String = p match {
    case RangeParam(n, c, sel) =>
      s"{rule: range, name: $n, column: $c, selectivity: $sel}"
    case IntervalParam(n, c, r, a, rh, ofmt) =>
      s"{rule: interval, name: $n, column: $c, width_ratio: $r, int_align: $a" +
        rh.map(v => s", width_ratio_hi: $v").getOrElse("") +
        (if (ofmt != "num") s", out: $ofmt" else "") + "}"
    case UniformIntParam(n, lo, hi) =>
      s"{rule: int, name: $n, lo: $lo, hi: $hi}"
    case EqParam(n, c) => s"{rule: eq, name: $n, column: $c}"
    case DateLagParam(n, c, anchor, lag, w, gap) =>
      s"{rule: date_lag, name: $n, column: $c, anchor: $anchor, " +
        s"lag_days: $lag, width_days: $w, max_start_gap_days: $gap}"
    case CatWindowParam(n, c, k) => s"{rule: cat_window, name: $n, column: $c, k: $k}"
  }

  private def quote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  // ---- workload emission (yaml_emit.py equivalent) -------------------

  /** Write the generated workload as YAML (wlg/emit/yaml_emit.py:11-16
    * write_workload: a `workload:` list of query documents).
    */
  def writeWorkloadYaml(path: String, instances: Seq[QueryInstance]): Unit = {
    val sb = new StringBuilder
    sb ++= "workload:\n"
    instances.foreach { q =>
      sb ++= s"  - tpl: ${q.template}\n"
      sb ++= "    sql: |\n"
      q.sql.split("\n", -1).foreach(l => sb ++= s"      $l\n")
      if (q.params.nonEmpty) {
        sb ++= "    params:\n"
        q.params.toSeq.sortBy(_._1).foreach { case (k, v) =>
          sb ++= s"      $k: ${quote(v)}\n"
        }
      }
    }
    Files.write(Paths.get(path), sb.result().getBytes(StandardCharsets.UTF_8))
  }

  /** Read a workload document back (tpl, sql, params). */
  def readWorkloadYaml(path: String): Seq[QueryInstance] = {
    val text = new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
    parse(text).asMap.getOrElse("workload", YSeq(Vector.empty)).asSeq.map { y =>
      val m = y.asMap
      QueryInstance(
        template = m("tpl").str,
        sql = m("sql").str.stripLineEnd,
        params = m.get("params").map(_.asMap.map { case (k, v) => k -> v.str })
          .getOrElse(Map.empty))
    }
  }
}
