"""Round-5 additions: pluggable gram-sample hash (xxhash64 production
path vs md5 oracle path), and the body-fingerprint short-doc guard."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from broadway_spark.operators import dedup as D


def _docs(spark):
    text = " ".join(f"w{i}" for i in range(120))
    rows = [
        Row(doc_id=1, text=text),
        Row(doc_id=2, text=text + " tail"),
        Row(doc_id=3, text="short one"),
    ]
    return spark.createDataFrame(rows)


def test_gram_sampler_both_hashes_run_and_sample(spark):
    docs = _docs(spark)
    for h in ("xxhash64", "md5"):
        sets = D.char_ngram_gram_sets(
            docs, "doc_id", "text", n=16, mod=8, sample_hash=h
        ).collect()
        by_id = {r["doc_id"]: set(r["grams"]) for r in sets}
        # doc 3 has <16 chars' worth of sampled grams either way; docs
        # 1/2 share almost all grams (same text + tail)
        assert 1 in by_id and 2 in by_id
        total_grams = len(_docs(spark).collect()[0]["text"]) - 15
        # mod-8 sampling keeps roughly 1/8 (loose bound: < half)
        assert 0 < len(by_id[1]) < total_grams / 2
        assert len(by_id[1] & by_id[2]) >= len(by_id[1]) - 2


def test_gram_sampler_unknown_hash_rejected(spark):
    with pytest.raises(ValueError, match="unknown sample_hash"):
        D.char_ngram_gram_sets(
            _docs(spark), "doc_id", "text", sample_hash="sha1"
        )


def test_body_fingerprint_excludes_short_docs(spark, tmp_path):
    """Docs with <=10 tokens must NOT collapse into one md5('') group
    (round-4 ADVICE): they are excluded from body-fingerprint dedup."""
    import __spark_entry__ as entry

    rows = [
        Row(doc_id=1, text="a b", lang="en", source="s"),
        Row(doc_id=2, text="c d", lang="en", source="s"),
        Row(
            doc_id=3,
            text="hdr1 hdr2 hdr3 hdr4 hdr5 hdr6 hdr7 hdr8 hdr9 hdr10 "
            "body body2",
            lang="en",
            source="s",
        ),
        Row(
            doc_id=4,
            text="x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 body body2",
            lang="en",
            source="s",
        ),
    ]
    p = str(tmp_path / "documents.parquet")
    spark.createDataFrame(rows).write.parquet(p)
    out = entry.q_dedup_body_fingerprint(spark, str(tmp_path)).collect()
    # short docs 1/2 excluded; 3 and 4 share the same body -> one group
    assert len(out) == 1
    assert out[0]["keeper_id"] == 3 and out[0]["n_copies"] == 2


def test_put_routing_annotation_helpers(spark, tmp_path):
    """The reference's per-row routing annotations (put_batcher /
    put_batch_key / put_batch_mode, message.ex:94-144) as column
    helpers — conditional forms leave other rows untouched, and the
    batch-mode guard rejects unknown modes."""
    from broadway_spark import message as M

    df = M.normalize(
        spark.range(4).withColumnRenamed("id", "event_id"),
        source_name="t",
        ack_ref="t#x",
        ack_data=F.col("event_id").cast("string"),
    )
    out = M.put_batcher(df, "hot", when=F.col("event_id") % 2 == 0)
    out = M.put_batch_key(out, F.col("event_id") % 2)
    out = M.put_batch_mode(out, "flush", when=F.col("event_id") == 3)
    rows = {
        r["event_id"]: (r["batcher"], r["batch_key"], r["batch_mode"])
        for r in out.collect()
    }
    assert rows[0] == ("hot", "0", "bulk")
    assert rows[1] == ("default", "1", "bulk")
    assert rows[3] == ("default", "1", "flush")
    with pytest.raises(ValueError, match="unknown batch_mode"):
        M.put_batch_mode(df, "sometimes")
