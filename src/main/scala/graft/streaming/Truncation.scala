package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K5: topic-depth retention (SURVEY §2.7).
  *
  * The reference checks every 5000th consumed record per partition and
  * truncates the partition to the consumer's current offset when depth
  * (latest - earliest) >= maxTopicDepth
  * (reference: DataGenerator.java:541-545, :553-575;
  * `max-topic-depth=5000` application.properties:15).
  *
  * There is no sink API for truncation, so the *decision* is a DataFrame
  * computation (testable, below) and the *action* is an Admin
  * `deleteRecords(beforeOffset)` issued from `foreachBatch` — the
  * `TruncateAction` hook stands in for the Admin client here (no broker in
  * this environment).
  */
object Truncation {

  val defaultMaxDepth: Long = 5000L
  val checkEvery: Long = 5000L

  /** F3: the sampling trigger — act only on every `checkEvery`-th record
    * per partition (reference :541).
    */
  def sampled(consumed: DataFrame, countCol: String = "cnt"): DataFrame =
    consumed.filter(pmod(col(countCol), lit(checkEvery)) === 0)

  /** F4 + K5 decision: given per-partition (earliest, latest,
    * currentOffset), emit the partitions to truncate with the
    * before-offset — truncation is keyed to the consumer's *current*
    * offset, exactly like the reference (:566-571).
    */
  def plan(offsets: DataFrame, maxDepth: Long = defaultMaxDepth): DataFrame =
    offsets
      .filter(col("latest") - col("earliest") >= maxDepth)
      .select(col("topic"), col("partition"),
        col("currentOffset").as("beforeOffset"))

  /** The side-effect boundary: production wires this to
    * `Admin.deleteRecords`; tests pass a recorder.
    */
  trait TruncateAction extends Serializable {
    def deleteRecords(topic: String, partition: Int, beforeOffset: Long): Unit
  }

  /** Apply the plan through the action hook (driver-side, small row set). */
  def execute(plan: DataFrame, action: TruncateAction): Unit =
    plan.collect().foreach { r =>
      action.deleteRecords(r.getAs[String]("topic"),
        r.getAs[Int]("partition"), r.getAs[Long]("beforeOffset"))
    }
}
