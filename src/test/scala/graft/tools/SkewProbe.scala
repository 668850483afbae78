package graft

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Ad-hoc task-skew probe (not part of the driver contract): runs the
  * named queries and reports, for the heaviest stages by total task
  * time, max vs median task duration — the empirical check that a
  * blocked/banded join's stragglers are bounded (d04's length-band
  * guard, d02's LSH band join). A guard that works shows max/median
  * within a small constant; an unguarded skew shows one task dominating
  * the stage.
  *
  * Usage: Test/runMain graft.SkewProbe <sfDir> <queryName>...
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stageTasks = TrieMap.empty[Int, ArrayBuffer[Long]]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        if (t.taskInfo != null && t.taskInfo.successful) {
          stageTasks.getOrElseUpdate(t.stageId, ArrayBuffer.empty)
            .synchronized {
              stageTasks(t.stageId) += t.taskInfo.duration
            }
        }
      }
    })

    names.foreach { name =>
      stageTasks.clear()
      val t0 = System.nanoTime()
      QueryRegistry.byName(name).run(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // settle listener events (the bus is async and private — a short
      // sleep is enough for an ad-hoc probe)
      Thread.sleep(2000)
      val heavy = stageTasks.toSeq
        .map { case (sid, ds) => (sid, ds.toVector.sorted) }
        .filter(_._2.nonEmpty)
        .sortBy { case (_, ds) => -ds.sum }
        .take(3)
      println(f"[skew] $name wall=$wall%.2fs")
      heavy.foreach { case (sid, ds) =>
        val median = ds(ds.size / 2)
        val max = ds.last
        val ratio = if (median > 0) max.toDouble / median else Double.NaN
        println(f"[skew]   stage=$sid%-5d tasks=${ds.size}%-4d " +
          f"sum=${ds.sum / 1000.0}%7.2fs median=${median}%6dms " +
          f"max=${max}%6dms max/median=$ratio%5.2f")
      }
    }
    spark.stop()
  }
}
