package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.util.sketch.BloomFilter

/** Bounded-state streaming dedup. Exact streaming dedup
  * (`dropDuplicatesWithinWatermark`) stores every key inside the
  * watermark — state grows with the key domain, and UNBOUNDED dedup
  * (no watermark) grows forever. The bloom variant caps state at
  * numBits/8 bytes PER SHARD for the stream's whole lifetime: each
  * shard's state is one bloom filter, probed and updated per
  * micro-batch. No false negatives — a true duplicate is ALWAYS
  * dropped; ~fpp of genuinely-new keys are falsely dropped, the safe
  * direction for corpus dedup (state that can never OOM costs a few
  * lost docs, not correctness of the dedup guarantee).
  *
  * Keys hash-shard across `nShards` groups so filter updates
  * parallelize and each filter stays small enough for the state store.
  */
object BloomDedup {

  /** Deduplicate a keyed stream: exactly ONE occurrence of each key
    * passes; duplicates in the same or any later micro-batch are
    * dropped. Across micro-batches the EARLIER batch's occurrence wins
    * (its insert is already in state); within one micro-batch the
    * survivor is whichever row the post-shuffle group iterator presents
    * first — partition-order dependent, NOT guaranteed to be the
    * stream-order first. Works identically on a batch Dataset (one
    * "micro-batch"). */
  def dedupKeyed[T](ds: Dataset[(String, T)], nShards: Int = 64,
      expectedItemsPerShard: Long = 1L << 20, fpp: Double = 0.01)
      (implicit te: Encoder[T]): Dataset[(String, T)] = {
    require(nShards > 0, s"nShards: $nShards")
    implicit val rowEnc: Encoder[(Int, String, T)] =
      Encoders.tuple(Encoders.scalaInt, Encoders.STRING, te)
    implicit val outEnc: Encoder[(String, T)] =
      Encoders.tuple(Encoders.STRING, te)
    implicit val stateEnc: Encoder[Array[Byte]] = Encoders.BINARY
    implicit val intEnc: Encoder[Int] = Encoders.scalaInt

    ds.map { case (k, v) =>
      ((scala.util.hashing.MurmurHash3.stringHash(k) % nShards
        + nShards) % nShards, k, v)
    }
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (_: Int, rows: Iterator[(Int, String, T)],
            state: GroupState[Array[Byte]]) =>
          val bloom =
            if (state.exists)
              BloomFilter.readFrom(new ByteArrayInputStream(state.get))
            else BloomFilter.create(expectedItemsPerShard, fpp)
          // materialize BEFORE serializing state: the iterator must be
          // fully consumed while the filter is still being updated
          val out = rows.collect {
            case (_, k, v) if !bloom.mightContainString(k) =>
              bloom.putString(k); (k, v)
          }.toVector
          val bos = new ByteArrayOutputStream()
          bloom.writeTo(bos)
          state.update(bos.toByteArray)
          out.iterator
      }
  }
}
