package graft
import java.time.Instant
import java.time.temporal.ChronoUnit

/** Artifact provenance shared by Bench and Verify: commit SHA, wall
  * timestamp, and machine load. One definition — the duplicated inline
  * snippets drifted (the old `toString.takeWhile(_ != '.') + "Z"` emitted
  * an invalid double-Z whenever the instant had zero fractional seconds,
  * since Instant.toString then omits the '.' and already ends in Z). */
object Provenance {
  /** Short git SHA of the repo the artifact was produced from. */
  def gitSha: String = try {
    val p = new ProcessBuilder("git", "rev-parse", "--short", "HEAD")
      .directory(new java.io.File(sys.env.getOrElse("SPARK_GRAFT_REPO", "/root/repo")))
      .start()
    val out = new String(p.getInputStream.readAllBytes()).trim
    if (p.waitFor() == 0 && out.nonEmpty) out else "unknown"
  } catch { case _: Throwable => "unknown" }

  /** Second-precision UTC timestamp, always a single trailing Z. */
  def timestamp: String = Instant.now().truncatedTo(ChronoUnit.SECONDS).toString

  /** 1-minute load average from /proc/loadavg ("-1" off Linux). Recorded
    * in bench artifacts so co-tenant noise is visible in the numbers
    * instead of re-adjudicated from scratch every round. */
  def loadAvg1m: String = try {
    val s = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg"))).split("\\s+")
    s.headOption.getOrElse("-1")
  } catch { case _: Throwable => "-1" }
}
