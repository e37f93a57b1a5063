package graft.profile

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.json4s._
import org.json4s.jackson.Serialization

/** Stats document round-trip — the reference persists profiler output as
  * a YAML stats doc (wlg/profiler/dist_store.py:63-90); we use JSON with
  * the same shape (columns + metadata.correlations).
  */
object StatsIO {
  private implicit val fmts: Formats = Serialization.formats(NoTypeHints)

  def write(path: String, stats: Profiler.TableStats): Unit =
    Files.write(Paths.get(path),
      Serialization.writePretty(stats).getBytes(StandardCharsets.UTF_8))

  def read(path: String): Profiler.TableStats =
    Serialization.read[Profiler.TableStats](
      new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8))
}
