package graft.lake

import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.UUID

/** Object-store-shaped implementation for contract testing: the slot
  * is arbitrated by an in-memory compare-and-set (standing in for the
  * store's conditional-put arbiter), and the winner's content becomes
  * visible only after an injected delay, via temp-file + atomic MOVE —
  * deliberately NOT link(2). This widens the window in which a slot is
  * taken but its content is not yet readable (real on any HTTP store:
  * the 200 of a conditional put and the first successful GET are
  * separate events), so any protocol reliance on POSIX link semantics
  * or on instant read-your-win visibility fails loudly under the chaos
  * specs. Scoped to one JVM + one table dir, which is all the tests
  * need. */
class RacyCommitStore(maxDelayMs: Int = 5) extends CommitStore {
  private val slots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val rnd = new java.util.Random(42)
  private def nap(): Unit = {
    val ms = rnd.synchronized(rnd.nextInt(maxDelayMs + 1))
    if (ms > 0) Thread.sleep(ms)
  }
  def putIfAbsent(path: Path, content: String): Boolean = {
    val key = path.toAbsolutePath.toString
    // a slot whose winner crashed before move() would deadlock the
    // in-memory arbiter vs the real store (where the object simply
    // never appears and the condition stays winnable) — tests don't
    // kill threads mid-put, so plain CAS is faithful enough here
    if (!slots.add(key)) return false
    nap() // won the slot; content not yet visible to anyone
    val tmp = path.getParent.resolve(s".tmp-${UUID.randomUUID()}.json")
    Files.writeString(tmp, content)
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE)
    true
  }
}
