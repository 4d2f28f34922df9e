"""P5 streaming dynamic epochs: per-micro-batch boundary re-learning
(EpochCurvePartitioner + StreamingCurveIngest), own-epoch data routing and
fresh-epoch query pruning (LSHashSpaceFillingPartitioner.java:118-145,314-355)."""

import numpy as np
import pandas as pd

from vstream_spark.config import PartitionerConf
from vstream_spark.partitioners.epochs import EpochCurvePartitioner
from vstream_spark.streaming.pipeline import StreamingCurveIngest

SCHEMA = "id bigint, emb array<float>, event_time bigint"
INTERVAL = 1000


def _batch(spark, lo, hi, t0, n=200, seed=0):
    """n vectors uniform in [lo, hi)^4 with event_time in [t0, t0+INTERVAL)."""
    rng = np.random.RandomState(seed)
    rows = [
        (
            t0 * 10 + i,
            (rng.rand(4) * (hi - lo) + lo).astype(np.float32).tolist(),
            t0 + (i % INTERVAL),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _conf(**kw):
    base = dict(
        kind="lsh+hilbert", num_partitions=4, num_hashes=4, bucket_width=1.0,
        sfc_bits=7, update_interval=INTERVAL, replication_factor=1,
    )
    base.update(kw)
    return PartitionerConf(**base)


def test_epochs_learned_per_batch_and_data_routed_by_own_epoch(spark):
    part = EpochCurvePartitioner(_conf(), curve="hilbert", use_lsh=True)
    # epoch 0: vectors around [0,1); epoch 1: distribution SHIFTED to [50,51)
    b0 = _batch(spark, 0.0, 1.0, t0=0, seed=1)
    b1 = _batch(spark, 50.0, 51.0, t0=INTERVAL, seed=2)
    assert part.update(b0) == [0]
    assert part.update(b1) == [1]
    assert set(part.epochs) == {0, 1}
    # the two epochs learned DIFFERENT normalizations (distribution shift)
    assert not np.allclose(part.epochs[0].lo, part.epochs[1].lo)

    # each epoch's data spreads across partitions by its OWN boundaries;
    # a stale-boundary routing would clip every shifted vector to one side
    for b, ep in ((b0, 0), (b1, 1)):
        routed = part.partition_data(b).groupBy("partition_id").count().collect()
        counts = {r["partition_id"]: r["count"] for r in routed}
        assert len(counts) == 4, f"epoch {ep} collapsed to {counts}"
        # curve values are discrete (ties straddle quantile cuts) — require
        # no partition hoards the epoch rather than perfect equi-depth
        assert max(counts.values()) <= 200 * 0.6, f"epoch {ep} skewed: {counts}"

    # re-update with an already-learned epoch is a no-op
    assert part.update(b0) == []


def test_queries_prune_stale_epochs_by_max_ttl(spark):
    part = EpochCurvePartitioner(_conf(max_ttl=INTERVAL), curve="hilbert")
    part.update(_batch(spark, 0.0, 1.0, t0=0, seed=3))
    part.update(_batch(spark, 50.0, 51.0, t0=INTERVAL, seed=4))

    # query at t=1999 with max_ttl=1000 -> window [999, 1999]: epoch 0
    # ([0,1000)) only overlaps at 999 -> fresh; epoch 1 fresh
    rng = np.random.RandomState(9)
    q_fresh = spark.createDataFrame(
        [(1, rng.rand(4).astype(np.float32).tolist(), 2 * INTERVAL + 500)],
        "qid bigint, emb array<float>, event_time bigint",
    )
    # t=2500, window [1500, 2500]: epoch 0 ends at 1000 < 1500 -> STALE,
    # epoch 1 ([1000,2000)) still overlaps -> only epoch 1 visited
    fanned = part.partition_queries(q_fresh).collect()
    assert len(fanned) >= 1
    # with replication_factor=1, one partition per fresh epoch (epoch 1 only)
    assert all(r["num_partitions_sent"] == len(fanned) for r in fanned)
    assert len(fanned) <= 2  # never more than one pid per fresh epoch

    q_both = spark.createDataFrame(
        [(2, rng.rand(4).astype(np.float32).tolist(), INTERVAL + 999)],
        "qid bigint, emb array<float>, event_time bigint",
    )
    # t=1999, window [999,1999]: BOTH epochs fresh -> fan-out covers both
    fanned_both = part.partition_queries(q_both).collect()
    assert len(fanned_both) >= len(fanned)

    # no-max_ttl conf fans to every learned epoch, never fewer
    part_all = EpochCurvePartitioner(_conf(), curve="hilbert")
    part_all.epochs = part.epochs
    fanned_all = part_all.partition_queries(q_fresh).collect()
    assert len(fanned_all) >= len(fanned)


def test_streaming_ingest_relearns_and_partitions(spark, tmp_path):
    """End-to-end foreachBatch: two micro-batches with shifted distributions;
    after the drain both epochs are learned and the sink holds both epochs'
    rows partitioned by partition_id (routed by their own boundaries)."""
    src = tmp_path / "src"
    src.mkdir()
    _batch(spark, 0.0, 1.0, t0=0, seed=5).coalesce(1).write.parquet(str(src / "b000"))
    _batch(spark, 50.0, 51.0, t0=INTERVAL, seed=6).coalesce(1).write.parquet(
        str(src / "b001")
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    part = EpochCurvePartitioner(_conf(), curve="zorder")
    out_dir = str(tmp_path / "routed")
    ingest = StreamingCurveIngest(part, out_dir)
    q = ingest.start(stream, str(tmp_path / "ckpt"))
    q.awaitTermination()

    assert set(part.epochs) == {0, 1}
    routed = spark.read.parquet(out_dir)
    assert routed.count() == 400
    pdf = (
        routed.withColumn("epoch", (routed["event_time"] / INTERVAL).cast("long"))
        .groupBy("epoch", "partition_id")
        .count()
        .toPandas()
    )
    spread = pdf.groupby("epoch")["partition_id"].nunique()
    assert spread.loc[0] == 4 and spread.loc[1] == 4
