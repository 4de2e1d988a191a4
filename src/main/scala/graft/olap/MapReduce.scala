package graft.olap

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Row}

/** The OLAP MapReduce stage adapter — reference:
  * FulgoraGraphComputer.java:192-246 (map over all vertices → shuffle by key →
  * reduce → into Memory), emitters FulgoraMapEmitter/FulgoraReduceEmitter.
  *
  * Spark formulation: `flatMap` (the map emitter) → `groupByKey` (the shuffle
  * the reference simulates in-memory) → `mapGroups` (the reduce emitter).
  * For decomposable reductions prefer plain `groupBy().agg()` (map-side
  * partial aggregation); this adapter exists for arbitrary reduce functions,
  * matching the reference's contract. */
object MapReduce {

  def run[K: Encoder, V, OUT: Encoder](vertices: DataFrame)(
      mapF: Row => IterableOnce[(K, V)])(
      reduceF: (K, Iterator[V]) => OUT)(
      implicit kvEnc: Encoder[(K, V)]): Dataset[OUT] =
    vertices.flatMap(mapF)(kvEnc)
      .groupByKey(_._1)
      .mapGroups((k, vs) => reduceF(k, vs.map(_._2)))
}
