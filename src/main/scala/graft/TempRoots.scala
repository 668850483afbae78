package graft

import java.nio.file.{Files, Path}

/** Temp roots (topic stores, checkpoints) for fixture-driven queries,
  * deleted on JVM exit. Without the hook every Verify/Bench/soak
  * iteration leaves ~15 full fixture copies in /tmp — a repeated soak
  * loop fills the host's disk. Deletion is best-effort (exit path). */
object TempRoots {
  private val created =
    java.util.Collections.synchronizedList(new java.util.ArrayList[Path]())

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.forEach { root =>
      // close the walk stream per root — it holds a dirfd, and a long
      // soak accumulates enough roots to hit the fd limit mid-cleanup
      try {
        val st = Files.walk(root)
        try st.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => try Files.deleteIfExists(p) catch { case _: Throwable => () })
        finally st.close()
      } catch { case _: Throwable => () }
    }
  }, "graft-temp-roots-cleanup"))

  def create(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }
}
