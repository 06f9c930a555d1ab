"""Multimodal plumbing + streaming incremental indexing tests."""

import math
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from ocaml_lucene_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (0, mm.encode_fake_image(0, 32, 16, 1)),
        (1, mm.encode_fake_image(1, 64, 32, 6)),  # video, 6 frames
        (2, b"not-a-media-blob"),
        (3, mm.encode_fake_image(3, 8, 8, 1)),
    ]
    return spark.createDataFrame(rows, "media_id long, blob binary")


class TestMultimodal:
    def test_metadata(self, spark, media_df):
        got = {r.media_id: r for r in mm.media_metadata(media_df).collect()}
        assert got[0].kind == "image" and (got[0].width, got[0].height) == (32, 16)
        assert got[1].kind == "video" and got[1].n_frames == 6
        assert got[2].valid is False and got[2].kind == "unknown"

    def test_frame_sampling(self, spark, media_df):
        frames = mm.sample_frames(media_df, every_k=2).collect()
        by_id = {}
        for r in frames:
            by_id.setdefault(r.media_id, []).append(r.frame_no)
        assert sorted(by_id[1]) == [0, 2, 4]
        # each sampled frame decodes as a single-frame image
        f0 = next(bytes(r.frame) for r in frames if r.media_id == 1 and r.frame_no == 2)
        w, h, f, px = mm.decode_fake_image(f0)
        assert (w, h, f) == (64, 32, 1)
        # and matches the source frame exactly
        _, _, _, src = mm.decode_fake_image(mm.encode_fake_image(1, 64, 32, 6))
        assert (px[0] == src[2]).all()

    def test_resize(self, spark, media_df):
        out = {r.media_id: bytes(r.blob) for r in mm.resize_stub(media_df, 16, 8).collect()}
        w, h, f, _ = mm.decode_fake_image(out[0])
        assert (w, h, f) == (16, 8, 1)
        assert 2 not in out  # invalid blob dropped

    def test_features(self, spark, media_df):
        feats = {r.media_id: r.features for r in mm.byte_histogram_features(media_df).collect()}
        assert len(feats[0]) == 64
        assert math.isclose(sum(feats[0]), 1.0, rel_tol=1e-5)
        # deterministic: same blob -> same features
        again = {r.media_id: r.features for r in mm.byte_histogram_features(media_df).collect()}
        assert feats[0] == again[0]

    def test_vectorized_kernels_equal_per_row_reference(self, spark):
        """The grouped/batched numpy kernels (frames/resize/features)
        produce exactly the per-row reference results on a mixed batch
        (several dim groups, invalid blobs, header-only blob)."""
        rows = [
            (0, mm.encode_fake_image(0, 32, 16, 1)),
            (1, mm.encode_fake_image(1, 64, 32, 6)),
            (2, b"junk"),
            (3, mm.encode_fake_image(3, 8, 8, 1)),
            (4, mm.encode_fake_image(4, 64, 32, 6, seed=7)),  # same dims as 1
            (5, mm.encode_fake_image(5, 8, 8, 4)),
        ]
        # 0-pixel blob: only features handles it (resize/frames cannot
        # sample an empty axis — same contract as the per-row reference)
        zero_px = (6, mm.FAKE_MAGIC + np.array([0, 8, 2], dtype="<i4").tobytes())
        df = spark.createDataFrame(rows, "media_id long, blob binary")
        df_feat = spark.createDataFrame(rows + [zero_px], "media_id long, blob binary")

        # reference: per-row loops over decode_fake_image
        ref_frames, ref_resize, ref_feats = [], {}, {}
        for mid, blob in rows + [zero_px]:
            dec = mm.decode_fake_image(bytes(blob))
            if dec is None:
                continue
            w, h, f, px = dec
            hist, _ = np.histogram(px.ravel(), bins=64, range=(0, 256))
            total = hist.sum() or 1
            ref_feats[mid] = (hist / total).astype(np.float32).tolist()
            if px.size == 0:
                continue
            for fno in range(0, f, 2):
                head = mm.FAKE_MAGIC + np.array([w, h, 1], dtype="<i4").tobytes()
                ref_frames.append((mid, fno, head + px[fno].tobytes()))
            yi = (np.arange(8) * h // 8).astype(int)
            xi = (np.arange(16) * w // 16).astype(int)
            head = mm.FAKE_MAGIC + np.array([16, 8, f], dtype="<i4").tobytes()
            ref_resize[mid] = head + px[:, yi][:, :, xi].tobytes()

        got_frames = sorted(
            (r.media_id, r.frame_no, bytes(r.frame))
            for r in mm.sample_frames(df, every_k=2).collect()
        )
        assert got_frames == sorted(ref_frames)
        got_resize = {
            r.media_id: bytes(r.blob) for r in mm.resize_stub(df, 16, 8).collect()
        }
        assert got_resize == ref_resize
        got_feats = {
            r.media_id: r.features
            for r in mm.byte_histogram_features(df_feat).collect()
        }
        assert got_feats == ref_feats

    def test_real_decoder_is_marked(self):
        with pytest.raises(NotImplementedError):
            mm.decode_real_image(b"\x89PNG...")


class TestStreamingIncremental:
    def test_stream_batches_equal_batch_build(self, spark, tiny_corpus, tmp_path_factory):
        import glob
        import shutil

        from ocaml_lucene_spark.index.build import assign_doc_ids
        from ocaml_lucene_spark.oracle import OracleIndex
        from ocaml_lucene_spark.query.exec import bm25_topk_indexed
        from ocaml_lucene_spark.streaming.incremental import (
            indexed_doc_count,
            start_incremental_indexer,
        )

        src = str(tmp_path_factory.mktemp("stream_src"))
        index_dir = str(tmp_path_factory.mktemp("stream_idx"))
        shards = sorted(glob.glob(tiny_corpus + "/part-*.parquet"))
        assert len(shards) >= 4

        # batch 1: first half of shards land, indexer drains
        for s in shards[: len(shards) // 2]:
            shutil.copy(s, src)
        q = start_incremental_indexer(spark, src, index_dir, n_partitions=4)
        q.awaitTermination(300)
        n1 = indexed_doc_count(index_dir)
        assert n1 > 0

        # batch 2: remaining shards land, availableNow restarts drain them
        for s in shards[len(shards) // 2 :]:
            shutil.copy(s, src)
        q = start_incremental_indexer(spark, src, index_dir, n_partitions=4)
        q.awaitTermination(300)
        n2 = indexed_doc_count(index_dir)
        total = spark.read.parquet(tiny_corpus).count()
        assert n2 == total

        # rank-identity vs oracle over the union (ids are per-batch
        # deterministic: batch order defines the id space)
        texts = {}
        base = 0
        for group in (shards[: len(shards) // 2], shards[len(shards) // 2 :]):
            with_ids = assign_doc_ids(spark.read.parquet(*group).select("url", "text"))
            rows = with_ids.collect()
            for r in rows:
                texts[r.doc_id + base] = r.text
            base += len(rows)
        oracle = OracleIndex.from_texts(texts)
        got = [
            (r.doc_id, r.score)
            for r in bm25_topk_indexed(spark, index_dir, ["the", "and"], "or", 10).collect()
        ]
        exp = oracle.query(["the", "and"], "or", 10)
        assert [d for d, _ in got] == [d for d, _ in exp]
        for (_, gs), (_, es) in zip(got, exp):
            assert math.isclose(gs, es, rel_tol=1e-9)


def test_streaming_stateful_dedup_first_seen_wins(spark, tmp_path_factory):
    """applyInPandasWithState dedup: across 3 ordered micro-batches,
    each distinct text survives exactly once with the FIRST batch's
    min doc_id; later re-deliveries are dropped by per-key state."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocaml_lucene_spark.streaming.dedup_state import streaming_exact_dedup

    src = str(tmp_path_factory.mktemp("dedup_src"))
    out = str(tmp_path_factory.mktemp("dedup_out"))
    ckpt = str(tmp_path_factory.mktemp("dedup_ckpt"))
    batches = [
        [(0, "alpha text"), (1, "beta text"), (2, "alpha text")],   # 2 dups in-batch
        [(3, "alpha text"), (4, "gamma text")],                     # cross-batch dup
        [(5, "beta text"), (6, "delta text"), (7, "gamma text")],
    ]
    for i, rows in enumerate(batches):
        path = f"{src}/b{i}.parquet"
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            ),
            path,
        )
        # the file source orders micro-batches by modification time:
        # pin strictly increasing mtimes or fast writes tie and the
        # batch order (hence first-seen-wins) becomes nondeterministic
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.doc_id, r.text_hash)
        for r in spark.read.parquet(out).collect()
    }
    import hashlib

    def h(t):
        return hashlib.md5(t.encode()).hexdigest()

    expected = {
        (0, h("alpha text")),  # min of batch-0 dups; batch-1 redelivery dropped
        (1, h("beta text")),
        (4, h("gamma text")),
        (6, h("delta text")),
    }
    assert got == expected, got


def test_media_metadata_matches_pure_python_expected(spark):
    """The vectorized header decode equals an independent pure-Python
    struct.unpack oracle over the same blobs (incl. invalid ones)."""
    import struct

    from ocaml_lucene_spark.operators import multimodal as mm

    blobs = {}
    for i in range(24):
        blobs[i] = mm.encode_fake_image(i, 8 + i % 13, 4 + i % 7, 1 + i % 5)
    blobs[100] = b"NOTMEDIA" + b"\x01" * 40          # bad magic
    blobs[101] = mm.encode_fake_image(7, 4, 4, 1)[:-3]  # truncated pixels
    blobs[102] = b"FA"                                  # shorter than magic

    def expected_row(mid, b):
        if len(b) >= 20 and b[:8] == mm.FAKE_MAGIC:
            w, h, f = struct.unpack("<iii", b[8:20])
            if len(b) - 20 == w * h * f:
                kind = "video" if f > 1 else "image"
                return (mid, kind, w, h, f, len(b), True)
        return (mid, "unknown", 0, 0, 0, len(b), False)

    expected = sorted(expected_row(m, b) for m, b in blobs.items())
    df = spark.createDataFrame(
        [(int(m), bytearray(b)) for m, b in blobs.items()],
        "media_id long, blob binary",
    )
    got = sorted(
        (r.media_id, r.kind, r.width, r.height, r.n_frames, r.n_bytes, r.valid)
        for r in mm.media_metadata(df).collect()
    )
    assert got == expected
