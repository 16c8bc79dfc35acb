package graft.sources

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

/** Race-safe routing of subscription push frames to handlers that may
  * register AFTER pushes start arriving (a node can push on the listener
  * thread immediately after its subscribe response, before the caller has
  * stored its handler).
  *
  * The naive buffer-then-drain-at-registration scheme has a TOCTOU hole:
  * the push side reads "no handler", the register side drains an empty
  * buffer, then the push side buffers — stranding the frame forever. This
  * router closes it by double-checking on BOTH sides: the push side
  * re-reads the handler after buffering and self-drains if registration
  * won the race; draining uses queue poll semantics, so each frame is
  * delivered exactly once no matter which side wins.
  *
  * ==Handler contract==
  * When registration races an in-flight push, the handler can be invoked
  * CONCURRENTLY from the listener thread (direct delivery) and the
  * registering thread (drain), and a queued older frame can be delivered
  * after a newer direct-delivered one. Handlers MUST therefore be
  * thread-safe and tolerate out-of-order delivery — fine for
  * latest-wins/set semantics like `newHeads` (see the chain-tip call
  * site), wrong for a handler that assumes strict arrival order.
  */
final class PushRouter[T] {
  private val handlers = new ConcurrentHashMap[String, T => Unit]()
  private val early = new ConcurrentHashMap[String, ConcurrentLinkedQueue[T]]()

  /** Listener side: deliver directly if a handler is registered, else
    * buffer — then re-check and self-drain so a concurrent register
    * cannot strand the frame. */
  def push(sub: String, v: T): Unit = {
    val h = handlers.get(sub)
    if (h != null) h(v)
    else {
      val q = early.computeIfAbsent(sub, _ => new ConcurrentLinkedQueue[T]())
      q.add(v)
      val h2 = handlers.get(sub)
      if (h2 != null) drain(q, h2)
    }
  }

  /** Caller side: register, then drain anything buffered. The (possibly
    * emptied) queue deliberately stays in the map — once the handler is
    * visible the push side delivers directly or self-drains, and the
    * entry is reclaimed by [[remove]]. */
  def register(sub: String, h: T => Unit): Unit = {
    handlers.put(sub, h)
    val q = early.get(sub)
    if (q != null) drain(q, h)
  }

  def remove(sub: String): Unit = {
    handlers.remove(sub)
    early.remove(sub)
    ()
  }

  private def drain(q: ConcurrentLinkedQueue[T], h: T => Unit): Unit = {
    var n = q.poll()
    while (n != null) { h(n); n = q.poll() }
  }
}
