package graft.profile

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.json4s._
import org.json4s.jackson.Serialization

/** Stats document round-trip — the reference persists profiler output as
  * a YAML stats doc (wlg/profiler/dist_store.py:63-90: `columns:` map of
  * per-column stat dicts + `metadata:`). Both formats round-trip: JSON
  * (json4s) and the reference's YAML shape (via graft.wlg.YamlSpec).
  */
object StatsIO {
  private implicit val fmts: Formats = Serialization.formats(NoTypeHints)

  def write(path: String, stats: Profiler.TableStats): Unit =
    Files.write(Paths.get(path),
      Serialization.writePretty(stats).getBytes(StandardCharsets.UTF_8))

  def read(path: String): Profiler.TableStats =
    Serialization.read[Profiler.TableStats](
      new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8))

  // ---- stats.yaml (dist_store.py:63-90 shape) -----------------------

  private def q(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
  private def key(s: String): String =
    if (s.nonEmpty && s.forall(c => c.isLetterOrDigit || c == '_')) s else q(s)

  def writeYaml(path: String, stats: Profiler.TableStats): Unit = {
    val sb = new StringBuilder
    sb ++= "columns:\n"
    stats.columns.foreach { c =>
      sb ++= s"  ${key(c.name)}:\n"
      sb ++= s"    kind: ${c.kind}\n"
      sb ++= s"    count: ${c.count}\n"
      sb ++= s"    nulls: ${c.nulls}\n"
      c.min.foreach(v => sb ++= s"    min: $v\n")
      c.max.foreach(v => sb ++= s"    max: $v\n")
      sb ++= s"    cardinality: ${c.cardinality}\n"
      if (c.quantiles.nonEmpty)
        sb ++= "    quantiles: {" + c.quantiles.toSeq.sortBy(_._1)
          .map { case (p, v) => s"${q(p)}: $v" }.mkString(", ") + "}\n"
      if (c.topk.nonEmpty) {
        sb ++= "    topk:\n"
        c.topk.foreach { case (v, f) => sb ++= s"      - {v: ${q(v)}, f: $f}\n" }
      }
      c.histogram.foreach { case (edges, counts) =>
        sb ++= "    histogram:\n"
        sb ++= "      edges: [" + edges.mkString(", ") + "]\n"
        sb ++= "      counts: [" + counts.mkString(", ") + "]\n"
      }
    }
    sb ++= "metadata:\n"
    sb ++= s"  rows: ${stats.rows}\n"
    if (stats.correlations.nonEmpty) {
      sb ++= "  correlations:\n"
      stats.correlations.foreach { case (a, b, r) =>
        sb ++= s"    - {c1: ${q(a)}, c2: ${q(b)}, corr: $r}\n"
      }
    }
    Files.write(Paths.get(path), sb.result().getBytes(StandardCharsets.UTF_8))
  }

  def readYaml(path: String): Profiler.TableStats = {
    import graft.wlg.YamlSpec
    val doc = YamlSpec.parse(new String(
      Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)).asMap
    val meta = doc.get("metadata").map(_.asMap).getOrElse(Map.empty)
    val columns = doc.get("columns") match {
      case Some(m: YamlSpec.YMap) => m.entries.map { case (name, y) =>
        val c = y.asMap
        def os(k: String): Option[Double] = c.get(k).map(_.str.toDouble)
        Profiler.ColumnStats(
          name = name,
          kind = c("kind").str,
          count = c("count").str.toLong,
          nulls = c("nulls").str.toLong,
          min = os("min"),
          max = os("max"),
          quantiles = c.get("quantiles").map(_.asMap.map {
            case (p, v) => p -> v.str.toDouble
          }).getOrElse(Map.empty),
          cardinality = c("cardinality").str.toLong,
          topk = c.get("topk").map(_.asSeq.map { t =>
            val m = t.asMap; (m("v").str, m("f").str.toLong)
          }).getOrElse(Nil),
          histogram = c.get("histogram").map { h =>
            (h.asMap("edges").asSeq.map(_.str.toDouble),
              h.asMap("counts").asSeq.map(_.str.toLong))
          })
      }
      case _ => Seq.empty
    }
    Profiler.TableStats(
      rows = meta.get("rows").map(_.str.toLong).getOrElse(0L),
      columns = columns,
      correlations = meta.get("correlations").map(_.asSeq.map { e =>
        val m = e.asMap
        (m("c1").str, m("c2").str, m("corr").str.toDouble)
      }).getOrElse(Nil))
  }
}
