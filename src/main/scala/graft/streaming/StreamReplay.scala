package graft.streaming

import scala.jdk.CollectionConverters._

/** Deterministic epoch-replay forcing for delivery-semantics gates.
  *
  * Structured Streaming's recovery contract: on (re)start, if the
  * offsets log contains batch N but the commits log does not, batch N
  * re-executes with the SAME epochId over the SAME checkpointed offset
  * range — exactly what happens after a crash between the sink's write
  * and the checkpoint's commit. Deleting the newest commit marker forces
  * that scenario on demand, which is how the exactly-once producer gates
  * (m13/m14, SinkExactlyOnceSpec) prove a replayed epoch does not
  * duplicate in the topic store.
  */
object StreamReplay {

  /** Delete the checkpoint's most recent commit marker; the next restart
    * of the same checkpoint replays that micro-batch. Returns the epoch
    * id that will replay. */
  def forceLastEpochReplay(ckpt: String): Long = {
    val commits = java.nio.file.Paths.get(ckpt, "commits")
    val st = java.nio.file.Files.list(commits)
    val last = try st.iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.nonEmpty && n.forall(_.isDigit))
      .map(_.toLong).max
    finally st.close()
    java.nio.file.Files.delete(commits.resolve(last.toString))
    // Hadoop's checksummed local FS keeps a `.N.crc` sidecar; left
    // behind it makes the replayed commit's rename look like a
    // concurrent writer (SparkConcurrentModificationException)
    java.nio.file.Files.deleteIfExists(commits.resolve(s".$last.crc"))
    last
  }
}
