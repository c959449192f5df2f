"""DataFrame-native Bloom filter (ops/bloom.py): construction, probe
guarantees (superset, no false negatives), and output-identity of the
bloom-prefiltered decontamination against the exact path."""

from pyspark.sql import functions as F

from snowav_spark.ops import bloom, dedup


def _vals(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("gram-"), F.col("id")).alias("s")
    )


def test_probe_is_superset_with_no_false_negatives(spark):
    members = _vals(spark, 0, 2000)
    bf = bloom.bloom_build(members, "s", num_bits=1 << 15, num_hashes=5)
    probe = _vals(spark, 0, 8000)
    kept = bloom.bloom_might_contain(probe, "s", bf, 1 << 15, 5)
    # every true member survives (no false negatives)
    assert members.join(kept, "s", "left_anti").count() == 0
    # fp rate at m/n=16, k=5 is ~0.1%; assert an order-of-magnitude bound
    n_kept = kept.count()
    assert 2000 <= n_kept < 2000 + 0.05 * 6000


def test_tiny_bitmap_still_correct_just_dense(spark):
    """A saturated filter (m/n < 1) keeps everything — degraded pruning,
    never lost members."""
    members = _vals(spark, 0, 500)
    bf = bloom.bloom_build(members, "s", num_bits=64, num_hashes=3)
    kept = bloom.bloom_might_contain(_vals(spark, 0, 600), "s", bf, 64, 3)
    assert members.join(kept, "s", "left_anti").count() == 0


def test_bitmap_shape(spark):
    bf = bloom.bloom_build(_vals(spark, 0, 100), "s", num_bits=1 << 12)
    row = bf.collect()[0]
    assert len(row.bf) == (1 << 12) // 64


def test_decontaminate_bloom_identical_to_exact(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta"),
            (1, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (2, "one two three four five six seven eight nine ten"),
            (3, "completely different words with no overlap at all here"),
            (4, "one two three four five unrelated tail words here now"),
        ],
        ["doc_id", "text"],
    )
    train = docs.filter(F.col("doc_id") >= 2)
    ev = docs.filter(F.col("doc_id") < 2)
    exact = dedup.decontaminate(train, ev, "doc_id", "text", n=5)
    bloomed = dedup.decontaminate_bloom(
        train, ev, "doc_id", "text", n=5, num_bits=1 << 12
    )
    assert sorted(map(tuple, exact.collect())) == sorted(
        map(tuple, bloomed.collect())
    )
