package graft.index

/** Shared pieces of the `Model.merge` family — the cross-job/cross-day
  * index compaction path (two builds over disjoint corpus slices combine
  * into one servable index without a full rebuild; the lifecycle gap the
  * reference's add-only `Index::add` contract leaves open, base.rs:28).
  *
  * Merge semantics across all index types: the RECEIVER is the surviving
  * model — its centroids/codebooks/params win; the argument contributes
  * rows. Caller contract (same as add): the two id sets are disjoint.
  */
private[graft] object MergeOps {

  /** Bitwise equality of two centroid/codebook grids. */
  def sameGrid(a: Array[Array[Float]], b: Array[Array[Float]]): Boolean =
    a.length == b.length &&
      a.indices.forall(i => java.util.Arrays.equals(a(i), b(i)))

  def sameBooks(a: Array[Array[Array[Float]]], b: Array[Array[Array[Float]]]): Boolean =
    a.length == b.length && a.indices.forall(i => sameGrid(a(i), b(i)))

  /** Element-wise saturating sum of per-cell sizes. Saturation matters:
    * the oracle lanes pin sizes to Long.MaxValue to force exact nprobe,
    * and a wrapped negative size would corrupt adaptive probe widening. */
  def satAdd(a: Array[Long], b: Array[Long]): Array[Long] = {
    require(a.length == b.length,
      s"merge: cell count mismatch (${a.length} vs ${b.length})")
    Array.tabulate(a.length) { i =>
      val s = a(i) + b(i)
      if (s < 0) Long.MaxValue else s
    }
  }
}
