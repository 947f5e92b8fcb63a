package graft.llm

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Tracks the frames an llm operator persists so a long-lived session can
  * release them once the operator's output has been consumed. The dedup /
  * ANN detectors persist their feature frames (tokenized shingles, LSH
  * buckets, centroid assignments) because both sides of a self-join read
  * them; those persists must outlive the RETURNED lazy DataFrame, so the
  * operator itself can never unpersist them. Callers that embed the
  * operators in a long-lived session pass a scope and call [[release]]
  * after materializing results; one-shot drivers can use [[CacheScope.global]]
  * (the session-lifetime default).
  */
final class CacheScope {
  private val frames = ArrayBuffer.empty[DataFrame]
  private val memo = scala.collection.mutable.Map.empty[Any, DataFrame]

  /** Persist `df` (MEMORY_AND_DISK) and register it for later release.
    * Idempotent per frame: re-registering an already-tracked frame is a
    * no-op persist (Spark warns), so operators persist exactly once.
    * Synchronized: the shared [[CacheScope.global]] default may be hit
    * from concurrent driver threads. */
  def cache(df: DataFrame): DataFrame = synchronized {
    frames += df
    df.persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** [[cache]] with structural sharing: the first call for a `key` builds
    * and persists the frame; later calls return the SAME DataFrame object,
    * so downstream plans read one InMemoryRelation instead of re-deriving
    * (and re-persisting) an identical projection. Used by the llm
    * operators to share the (id, vector, norm) feature frame between a
    * k-means fit and its serving/dedup consumer — at corpus scale that is
    * a whole saved scan+norm pass per consumer. Keys must capture the full
    * derivation (canonicalized input plan + parameters); [[release]]
    * clears the memo along with the persists. */
  def cacheKeyed(key: Any)(build: => DataFrame): DataFrame = synchronized {
    memo.getOrElseUpdate(key, cache(build))
  }

  /** Unpersist every tracked frame (non-blocking) and forget them. Safe to
    * call repeatedly; only frames cached since the last release are
    * touched. CAUTION on the shared global scope: release() drops OTHER
    * in-flight queries' feature frames too (they recompute, correctly but
    * slowly) — a multi-threaded driver should give each query its own
    * scope and only release the global between quiescent points, which is
    * exactly how Verify/Bench use it. */
  def release(): Unit = synchronized {
    frames.foreach(_.unpersist(blocking = false))
    frames.clear()
    memo.clear()
  }
}

object CacheScope {
  /** Session-lifetime scope for one-shot drivers (verify/bench mains call
    * `release()` between queries to keep executor storage bounded).
    *
    * CONVENTION: only the driver MAIN releases this scope, and only at a
    * quiescent point (no queries in flight) — a release() from one thread
    * unpersists OTHER in-flight queries' feature frames mid-computation
    * (results stay correct, the features silently recompute). A
    * long-lived multi-threaded session should pass each operator its own
    * scope (every llm operator takes one) and release per query, or use
    * [[withScope]] around fully-materializing work. */
  val global = new CacheScope

  /** Run `f` with a fresh scope and release its persists afterwards. Only
    * correct when `f` MATERIALIZES everything it needs (collect/write)
    * before returning — a lazy DataFrame escaping the scope would silently
    * recompute its unpersisted inputs. */
  def withScope[A](f: CacheScope => A): A = {
    val scope = new CacheScope
    try f(scope)
    finally scope.release()
  }
}
