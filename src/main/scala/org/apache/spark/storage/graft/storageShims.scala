package org.apache.spark.storage.graft

/** Bridge into the block manager's `private[storage]` per-task read-lock
  * registry (same extension-library technique as
  * [[org.apache.spark.sql.graft.ColumnBridge]]): a driver-side block running
  * under a synthetic `TaskContext` must register its attempt id before any
  * broadcast read, and release its locks after.
  */
object BlockBridge {
  private def infoManager =
    org.apache.spark.SparkEnv.get.blockManager.blockInfoManager

  def registerTask(taskAttemptId: Long): Unit =
    infoManager.registerTask(taskAttemptId)

  def releaseAllLocksForTask(taskAttemptId: Long): Unit =
    infoManager.releaseAllLocksForTask(taskAttemptId)
}
