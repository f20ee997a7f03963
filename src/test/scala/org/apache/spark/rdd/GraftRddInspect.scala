package org.apache.spark.rdd

/** Test-only visibility shim: `RDD.isLocallyCheckpointed` is
  * `private[spark]`, but the Traceability cache-leak spec needs to tell a
  * result's legitimate localCheckpoint blocks apart from a leaked
  * `cache()` — this exposes exactly that one bit, nothing else. */
object GraftRddInspect {
  def isLocalCheckpoint(r: RDD[_]): Boolean = r.isLocallyCheckpointed
}
