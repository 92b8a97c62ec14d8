package graft.table

/** Event listener hooks (ref `api/.../events/Listeners.java`, `ScanEvent`,
  * `CreateSnapshotEvent`): synchronous, type-keyed notification of scans and
  * commits for metrics/auditing integrations. */
object Listeners {
  final case class ScanEvent(tableLocation: String, snapshotId: Long,
      filter: String, plannedFiles: Int)
  final case class CreateSnapshotEvent(tableLocation: String, operation: String,
      snapshotId: Long, sequenceNumber: Long, summary: Map[String, String])

  private val listeners =
    new java.util.concurrent.ConcurrentHashMap[Class[_], List[Any => Unit]]()

  def register[E](eventType: Class[E])(listener: E => Unit): Unit =
    listeners.merge(eventType, List(listener.asInstanceOf[Any => Unit]), _ ++ _)

  def notifyAll[E <: AnyRef](event: E): Unit = {
    val ls = listeners.get(event.getClass)
    if (ls != null) ls.foreach(l => l(event))
  }

  def clear(): Unit = listeners.clear()
}
