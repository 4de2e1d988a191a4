package graft.tools

/** Reflective object-graph BFS used by [[LeakProbe]] to print the strong
  * reference path from a Spark driver root to a pinned RDD (round-17
  * shuffle-envelope diagnosis). Weak/soft references are never traversed
  * (crossing one would report a non-pinning path), nor are row payloads,
  * listener stores, classes, or threads. Diagnostic-only code. */
object HeapPath {
  private val SkipPrefixes = Seq(
    "java.lang.invoke", "jdk.", "sun.", "com.sun.",
    "org.sparkproject.guava.collect.MapMaker", // weak-values map internals
    "org.apache.logging", "org.slf4j")

  def find(roots: Seq[(String, AnyRef)], target: AnyRef,
      skipOwners: Seq[AnyRef] = Nil, maxSteps: Int = 30000000,
      skipFields: Set[String] = Set("SparkContext.persistentRdds")): Option[Seq[String]] = {
    val visited = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[AnyRef, java.lang.Boolean]())
    val parent = new java.util.IdentityHashMap[AnyRef, (AnyRef, String)]()
    val queue = new java.util.ArrayDeque[AnyRef]()
    skipOwners.foreach(o => visited.add(o))

    // ThreadLocalMap.Entry extends WeakReference (to the ThreadLocal key)
    // but holds its VALUE strongly — the one Reference subtype whose value
    // edge must be traversed (pool threads + ThreadLocals is a classic pin)
    def isTlEntry(o: AnyRef): Boolean =
      o.getClass.getName.endsWith("ThreadLocalMap$Entry")
    def admissible(o: AnyRef): Boolean = o match {
      case null => false
      case r: java.lang.ref.Reference[_] => isTlEntry(r)
      case _: Class[_] => false
      case _: ClassLoader => false
      case _: Thread => false
      case _: String => false
      case _: java.lang.Number => false
      case _: java.lang.Boolean => false
      case _: java.lang.Character => false
      case _ => !SkipPrefixes.exists(o.getClass.getName.startsWith)
    }
    def enqueue(o: AnyRef, par: AnyRef, via: String): Unit =
      if (admissible(o) && !visited.contains(o)) {
        visited.add(o)
        parent.put(o, (par, via))
        queue.add(o)
      }

    roots.foreach { case (n, r) => enqueue(r, null, n) }
    var steps = 0
    var found = false
    while (!queue.isEmpty && !found && steps < maxSteps) {
      val o = queue.poll()
      steps += 1
      if (o eq target) found = true
      else if (isTlEntry(o)) {
        try {
          val f = o.getClass.getDeclaredField("value")
          f.setAccessible(true)
          enqueue(f.get(o), o, "ThreadLocalMap$Entry.value")
        } catch { case _: Throwable => () }
      }
      else if (o.getClass.isArray) {
        if (!o.getClass.getComponentType.isPrimitive) {
          val arr = o.asInstanceOf[Array[AnyRef]]
          var i = 0
          while (i < arr.length) { enqueue(arr(i), o, s"[$i]"); i += 1 }
        }
      } else {
        var c: Class[_] = o.getClass
        while (c != null) {
          c.getDeclaredFields.foreach { f =>
            if (!f.getType.isPrimitive &&
                !java.lang.reflect.Modifier.isStatic(f.getModifiers) &&
                !skipFields.contains(s"${c.getSimpleName}.${f.getName}")) {
              try {
                f.setAccessible(true)
                enqueue(f.get(o), o, s"${c.getSimpleName}.${f.getName}")
              } catch { case _: Throwable => () }
            }
          }
          c = c.getSuperclass
        }
      }
    }
    System.err.println(s"[HeapPath] steps=$steps queueLeft=${queue.size} found=$found")
    if (!found) None
    else {
      var path = List.empty[String]
      var cur: AnyRef = target
      while (cur != null) {
        val p = parent.get(cur)
        if (p == null) { path = s"<root> (${cur.getClass.getName})" :: path; cur = null }
        else {
          path = s"${p._2} -> ${cur.getClass.getSimpleName}" :: path
          cur = p._1
        }
      }
      Some(path)
    }
  }
}
