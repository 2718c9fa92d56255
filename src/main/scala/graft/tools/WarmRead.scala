package graft.tools

import java.nio.file.{FileVisitOption, Files, Paths}

/** Untimed input warm-read (round-11 verdict #3). The first timed read
  * against a freshly-built probe dir — or against an sf dir whose pages a
  * probe build just evicted — pays a recurring 3–6× first-touch artifact
  * (measured: q152 21.2 s first vs 5.3 s warm; 10 over-2× bench readings
  * clustered on documents-table queries right after probe builds, all
  * normal warm). min-of-reps only partially absorbs it because writeback
  * of a just-built dir contends with the first re-read. Streaming every
  * byte of the input dir once, untimed, before the timing loop makes the
  * artifact a tooling non-event instead of a standing per-round
  * adjudication paragraph in BASELINE.md. FOLLOW_LINKS on purpose: probe
  * dirs symlink their unscaled tables back to the source sf dir. */
object WarmRead {
  def warm(dir: String): Unit = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) return
    val buf = new Array[Byte](1 << 20)
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(Files.walk(root, FileVisitOption.FOLLOW_LINKS)) { walk =>
      walk.iterator().asScala.filter(Files.isRegularFile(_)).foreach { p =>
        scala.util.Using.resource(Files.newInputStream(p)) { in =>
          while (in.read(buf) >= 0) ()
        }
      }
    }
  }
}
