package graft.mgmt

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Open-instance coordination — the reference's
  * `ManagementSystem.getOpenInstances` / `forceCloseInstance`
  * (tc/graphdb/database/management/ManagementSystem.java:177-202, pinned by
  * TitanGraphTest.java:1611-1622): every graph instance registers a unique
  * id with its registration time in the SHARED store (the reference writes
  * it into the system configuration; here a `_instances/` sidecar next to
  * the persisted frames), management lists them with the current instance
  * suffixed `(current)`, and a stale instance left by a crashed process can
  * be force-closed — but never the current one, and never an instance that
  * registered AFTER this management handle opened (a later registration
  * time indicates a successful restart, ManagementSystem.java:198-200).
  *
  * Registration is one tiny file per instance: create/list/delete are
  * metadata-only operations against the store's filesystem, no data reads —
  * the same cost profile as the reference's one-row system-config writes. */
final class InstanceRegistry(val storePath: String, val instanceId: String) {
  import InstanceRegistry._

  private val openedAt: Long = {
    register(storePath, instanceId)
    readTime(storePath, instanceId)
  }

  /** All registered instance ids, the current one suffixed `(current)`. */
  def getOpenInstances(): Set[String] = {
    val all = list(storePath)
    require(all.contains(instanceId),
      s"current instance [$instanceId] not listed as an open instance: $all")
    (all - instanceId) + (instanceId + CurrentSuffix)
  }

  /** Force-deregister a stale instance (crash cleanup). */
  def forceCloseInstance(id: String): Unit = {
    require(id != instanceId,
      s"cannot force close this current instance [$id]; properly shut down the graph instead")
    require(list(storePath).contains(id), s"instance [$id] is not currently open")
    require(readTime(storePath, id) <= openedAt,
      s"the to-be-closed instance [$id] was started after this management handle, " +
        "which indicates a successful restart and can hence not be closed")
    fs(storePath).delete(entry(storePath, id), false)
  }

  /** Orderly shutdown of the current instance. */
  def close(): Unit = fs(storePath).delete(entry(storePath, instanceId), false)
}

object InstanceRegistry {
  val CurrentSuffix = "(current)"

  private def fs(store: String) =
    new Path(store).getFileSystem(new Configuration())
  private def dir(store: String) = new Path(store, "_instances")
  private def entry(store: String, id: String) = new Path(dir(store), id)

  private def register(store: String, id: String): Unit = {
    val f = fs(store)
    val p = entry(store, id)
    if (!f.exists(p)) {
      val out = f.create(p, true)
      try out.write(System.currentTimeMillis().toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  private def readTime(store: String, id: String): Long = {
    val in = fs(store).open(entry(store, id))
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8).trim.toLong
    finally in.close()
  }

  private def list(store: String): Set[String] = {
    val f = fs(store)
    val d = dir(store)
    if (!f.exists(d)) Set.empty
    else f.listStatus(d).map(_.getPath.getName).toSet
  }

  /** Open a registry handle for `storePath`, registering `instanceId`
    * (auto-derived from host + process when not given — the reference's
    * unique graph id is hostname + a random suffix). */
  def open(storePath: String, instanceId: String = defaultId()): InstanceRegistry =
    new InstanceRegistry(storePath, instanceId)

  private def defaultId(): String = {
    val host = try java.net.InetAddress.getLocalHost.getHostName
      catch { case _: Exception => "localhost" }
    s"$host-${java.lang.management.ManagementFactory.getRuntimeMXBean.getName}" +
      s"-${java.util.UUID.randomUUID().toString.take(8)}"
  }
}
