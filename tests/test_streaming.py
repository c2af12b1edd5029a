"""Streaming incremental ingest: only-new-files semantics + equality with
the one-shot batch build; watermarked window agg."""

import os
import shutil

from pyspark.sql import functions as F

from information_retrieval_project_spark.corpus import generate_pdf
from information_retrieval_project_spark.index.build import tokenize_tf, with_doc_id
from information_retrieval_project_spark.streaming.incremental import (
    incremental_tf_ingest,
    windowed_event_counts,
)


def _write_chunk(spark, pdf, path):
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(path)


def test_incremental_ingest_matches_batch(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "tf")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(inp)

    p1 = generate_pdf(60, start=0)
    p2 = generate_pdf(60, start=60)
    _write_chunk(spark, p1, f"{inp}/chunk1")
    # file source needs a flat dir of files: move part files up
    for d in ["chunk1"]:
        for f in os.listdir(f"{inp}/{d}"):
            if f.endswith(".parquet"):
                shutil.move(f"{inp}/{d}/{f}", f"{inp}/{d.replace('chunk','f')}.parquet")
        shutil.rmtree(f"{inp}/{d}")

    incremental_tf_ingest(spark, inp, out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 > 0

    _write_chunk(spark, p2, f"{inp}/chunk2")
    for d in ["chunk2"]:
        for f in os.listdir(f"{inp}/{d}"):
            if f.endswith(".parquet"):
                shutil.move(f"{inp}/{d}/{f}", f"{inp}/{d.replace('chunk','f')}.parquet")
        shutil.rmtree(f"{inp}/{d}")

    incremental_tf_ingest(spark, inp, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() > n1

    # equality with the one-shot batch tokenize over the full corpus
    import pandas as pd

    full = spark.createDataFrame(pd.concat([p1, p2], ignore_index=True))
    want = tokenize_tf(with_doc_id(full))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_windowed_event_counts_batch_semantics(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = windowed_event_counts(ev, window="1 day")
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == ev.count()  # tumbling windows partition all events
    # window bounds are day-aligned and disjoint per event_type
    rows = out.collect()
    assert all(r["window_start"] < r["window_end"] for r in rows)


def test_incremental_index_update_merges_only_new_files(spark, tmp_path):
    """Stream→index lifecycle: updates incorporate only newly-arrived tf
    files (index/merge), and the maintained index equals a one-shot build
    over the full corpus — byte-identical postings."""
    import pandas as pd

    from information_retrieval_project_spark.index.build import (
        BuildConfig,
        build_postings,
    )
    from information_retrieval_project_spark.streaming.incremental import (
        incremental_index_update,
    )

    tf_dir = str(tmp_path / "tf2")
    out = str(tmp_path / "idx2")
    cfg = BuildConfig(hot_df_threshold=10_000, hot_detection_sample=1.0)
    p1 = generate_pdf(60, start=0)
    p2 = generate_pdf(60, start=60)

    tokenize_tf(with_doc_id(spark.createDataFrame(p1))).coalesce(1).write.mode(
        "append"
    ).parquet(tf_dir)
    r1 = incremental_index_update(spark, tf_dir, out, cfg)
    assert r1["mode"] == "initial" and r1["new_files"] >= 1
    assert incremental_index_update(spark, tf_dir, out, cfg)["mode"] == "noop"

    tokenize_tf(with_doc_id(spark.createDataFrame(p2))).coalesce(1).write.mode(
        "append"
    ).parquet(tf_dir)
    r2 = incremental_index_update(spark, tf_dir, out, cfg)
    assert r2["mode"] == "merged" and r2["new_files"] >= 1

    from information_retrieval_project_spark.streaming.incremental import (
        read_served_index,
    )

    m_idx, m_ds, m_cs_df = read_served_index(spark, out)
    got = {
        r["term"]: (r["df"], bytes(r["postings"])) for r in m_idx.collect()
    }
    full = spark.createDataFrame(pd.concat([p1, p2], ignore_index=True))
    want = {
        r["term"]: (r["df"], bytes(r["postings"]))
        for r in build_postings(tokenize_tf(with_doc_id(full)), cfg).collect()
    }
    assert got == want

    # the maintained out_dir is directly SERVABLE: BM25 over the maintained
    # index + stats equals serving a one-shot batch build
    from information_retrieval_project_spark.index.build import (
        collection_stats,
        doc_stats,
    )
    from information_retrieval_project_spark.queryexec.wand import (
        bm25_topk_compressed,
    )

    m_cs = m_cs_df.collect()[0]
    toks = ["def", "return", "import"]
    got_q = bm25_topk_compressed(
        spark, m_idx, m_ds, m_cs["n_docs"], m_cs["avgdl"], toks, k=10
    ).collect()
    tf_full = tokenize_tf(with_doc_id(full)).cache()
    b_ds = doc_stats(tf_full)
    b_cs = collection_stats(b_ds).collect()[0]
    want_q = bm25_topk_compressed(
        spark, build_postings(tf_full, cfg), b_ds,
        b_cs["n_docs"], b_cs["avgdl"], toks, k=10,
    ).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in got_q] == [
        (r["doc_id"], round(r["score"], 9)) for r in want_q
    ]


def test_incremental_update_crash_recovery(spark, tmp_path):
    """ADVICE r2: the additive merge must not double-apply after a crash.
    Simulate the two crash windows — (a) staging written but never published,
    (b) snapshot published but CURRENT never flipped — and assert the next
    run converges to exactly the one-shot build either way."""
    import json
    import os
    import shutil

    import pandas as pd

    from information_retrieval_project_spark.index.build import (
        BuildConfig,
        build_postings,
    )
    from information_retrieval_project_spark.streaming.incremental import (
        current_snapshot_dir,
        incremental_index_update,
        read_served_index,
    )

    tf_dir = str(tmp_path / "tf3")
    out = str(tmp_path / "idx3")
    cfg = BuildConfig(hot_df_threshold=10_000, hot_detection_sample=1.0)
    p1 = generate_pdf(50, start=0)
    p2 = generate_pdf(50, start=50)

    tokenize_tf(with_doc_id(spark.createDataFrame(p1))).coalesce(1).write.mode(
        "append"
    ).parquet(tf_dir)
    r1 = incremental_index_update(spark, tf_dir, out, cfg)
    assert r1["snapshot"] == "v000001"
    snap1 = current_snapshot_dir(out)

    tokenize_tf(with_doc_id(spark.createDataFrame(p2))).coalesce(1).write.mode(
        "append"
    ).parquet(tf_dir)

    # crash window (a): a leftover staging dir from a died update
    os.makedirs(os.path.join(out, "_staging_v000002", "index"), exist_ok=True)
    # crash window (b): a fully-published v000002 whose CURRENT flip never
    # happened — its contents are a stale double-merge hazard
    shutil.copytree(snap1, os.path.join(out, "v000002"))
    with open(os.path.join(out, "v000002", "incorporated.json"), "w") as f:
        json.dump([], f)  # poison: would re-merge EVERYTHING if trusted

    r2 = incremental_index_update(spark, tf_dir, out, cfg)
    assert r2["mode"] == "merged" and r2["snapshot"] == "v000002"
    assert not os.path.exists(os.path.join(out, "_staging_v000002"))

    m_idx, _, m_cs_df = read_served_index(spark, out)
    got = {
        r["term"]: (r["df"], bytes(r["postings"])) for r in m_idx.collect()
    }
    full = spark.createDataFrame(pd.concat([p1, p2], ignore_index=True))
    want = {
        r["term"]: (r["df"], bytes(r["postings"]))
        for r in build_postings(tokenize_tf(with_doc_id(full)), cfg).collect()
    }
    assert got == want
    assert m_cs_df.collect()[0]["n_docs"] == 100
    # idempotent after recovery: nothing left to apply
    assert incremental_index_update(spark, tf_dir, out, cfg)["mode"] == "noop"


def test_incremental_update_corrupt_pointer_raises(spark, tmp_path):
    """CURRENT naming a missing snapshot is corruption — rebuilding from only
    new files would silently drop history (ADVICE r2)."""
    import os

    import pytest

    from information_retrieval_project_spark.index.build import BuildConfig
    from information_retrieval_project_spark.streaming.incremental import (
        incremental_index_update,
    )

    out = str(tmp_path / "idx4")
    os.makedirs(out)
    with open(os.path.join(out, "CURRENT"), "w") as f:
        f.write("v000099")
    with pytest.raises(RuntimeError, match="missing snapshot"):
        incremental_index_update(
            spark, str(tmp_path), out, BuildConfig(hot_detection_sample=1.0)
        )


def test_incremental_update_legacy_layout_raises(spark, tmp_path):
    """A pre-snapshot out_dir (top-level index/, no CURRENT) must raise, not
    silently re-merge everything as a fresh start (code-review r3)."""
    import json
    import os

    import pytest

    from information_retrieval_project_spark.index.build import BuildConfig
    from information_retrieval_project_spark.streaming.incremental import (
        incremental_index_update,
    )

    out = str(tmp_path / "legacy")
    os.makedirs(os.path.join(out, "index"))
    with open(os.path.join(out, "incorporated.json"), "w") as f:
        json.dump(["part-old.parquet"], f)
    with pytest.raises(RuntimeError, match="legacy pre-snapshot layout"):
        incremental_index_update(
            spark, str(tmp_path), out, BuildConfig(hot_detection_sample=1.0)
        )


def test_incremental_update_retention_keeps_previous_snapshot(spark, tmp_path):
    """retain=2 (default): the superseded snapshot survives one update so
    in-flight readers pinned to it keep their files; older ones are GC'd."""
    import os

    from information_retrieval_project_spark.index.build import BuildConfig
    from information_retrieval_project_spark.streaming.incremental import (
        incremental_index_update,
    )

    tf_dir = str(tmp_path / "tf5")
    out = str(tmp_path / "idx5")
    cfg = BuildConfig(hot_df_threshold=10_000, hot_detection_sample=1.0)
    for i in range(3):
        pdf = generate_pdf(30, start=30 * i)
        tokenize_tf(with_doc_id(spark.createDataFrame(pdf))).coalesce(
            1
        ).write.mode("append").parquet(tf_dir)
        incremental_index_update(spark, tf_dir, out, cfg)
    snaps = sorted(e for e in os.listdir(out) if e.startswith("v"))
    assert snaps == ["v000002", "v000003"]  # current + one predecessor


def test_incremental_corpus_update_maintains_both_stores(spark, tmp_path):
    """incremental_corpus_update: ONE fused tokenize pass per batch feeds
    the merged postings index AND the appended positional store; both serve
    results identical to a full rebuild over everything ingested, a crash
    between the two commits (simulated by rolling the positions store back
    one batch) is caught up on the next run, and an unchanged corpus is a
    noop."""
    import shutil as _sh

    from information_retrieval_project_spark.index.positions import (
        build_positions,
        phrase_match_indexed,
    )
    from information_retrieval_project_spark.queryexec.bm25 import (
        bm25_scores,
        query_terms_df,
        topk,
    )
    from information_retrieval_project_spark.streaming.incremental import (
        incremental_corpus_update,
        read_served_index,
        read_served_positions,
    )

    corpus_dir = str(tmp_path / "corpus")
    out = str(tmp_path / "both")
    os.makedirs(corpus_dir)

    def _add_file(pdf, name):
        tmp = str(tmp_path / f"_chunk_{name}")
        _write_chunk(spark, pdf, tmp)
        part = next(
            f for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        _sh.move(os.path.join(tmp, part), os.path.join(corpus_dir, name))
        _sh.rmtree(tmp)

    _add_file(generate_pdf(60, start=0), "f1.parquet")
    r1 = incremental_corpus_update(spark, corpus_dir, out)
    assert r1["mode"] == "fused"
    assert r1["index"]["mode"] == "initial"
    assert r1["positions"]["mode"] == "initial"

    _add_file(generate_pdf(60, start=60), "f2.parquet")
    r2 = incremental_corpus_update(spark, corpus_dir, out)
    assert r2["mode"] == "fused"
    assert r2["index"]["mode"] == "merged"
    assert r2["positions"]["mode"] == "appended"
    assert r2["positions"]["linked_files"] > 0

    # both stores must now equal a full rebuild over ALL ingested docs
    all_docs = with_doc_id(spark.read.parquet(corpus_dir))
    tf_full = tokenize_tf(all_docs).cache()
    ds_full = tf_full.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    n_docs = ds_full.count()
    avgdl = ds_full.agg(F.avg("doc_len")).collect()[0][0]
    query = ["def", "return", "import"]

    idx, ds, cs = read_served_index(spark, os.path.join(out, "index_store"))
    from information_retrieval_project_spark.queryexec.wand import (
        bm25_topk_compressed,
    )

    cs_row = cs.collect()[0]
    assert cs_row["n_docs"] == n_docs
    served_topk = bm25_topk_compressed(
        spark, idx, ds, cs_row["n_docs"], cs_row["avgdl"], query, k=10
    ).collect()
    want_topk = topk(
        bm25_scores(
            tf_full, ds_full, n_docs, float(avgdl),
            query_terms_df(spark, query),
        ),
        10,
    ).collect()
    assert [r["doc_id"] for r in served_topk] == [
        r["doc_id"] for r in want_topk
    ]

    pos, ptb = read_served_positions(spark, out)
    full_pos = build_positions(all_docs)
    got_p = {
        (r["doc_id"], r["n_matches"])
        for r in phrase_match_indexed(
            spark, pos, ["def", "handle_request"], ptb
        ).collect()
    }
    want_p = {
        (r["doc_id"], r["n_matches"])
        for r in phrase_match_indexed(
            spark, full_pos, ["def", "handle_request"]
        ).collect()
    }
    assert got_p == want_p

    # noop when nothing new
    assert incremental_corpus_update(spark, corpus_dir, out)["mode"] == "noop"

    # crash between the two commits: index advanced, positions lagging —
    # roll the positions store back one batch and let the next run catch up
    pos_dir = os.path.join(out, "positions_store")
    backup = str(tmp_path / "pos_backup")
    _sh.copytree(pos_dir, backup)
    _add_file(generate_pdf(40, start=120), "f3.parquet")
    r3 = incremental_corpus_update(spark, corpus_dir, out)
    assert r3["mode"] == "fused"
    _sh.rmtree(pos_dir)
    _sh.copytree(backup, pos_dir)  # positions now one batch behind
    r4 = incremental_corpus_update(spark, corpus_dir, out)
    assert r4["mode"] == "catchup"
    assert "index" not in r4  # index store was already current
    pos2, ptb2 = read_served_positions(spark, out)
    all_docs2 = with_doc_id(spark.read.parquet(corpus_dir))
    assert pos2.count() == build_positions(all_docs2).count()
    # and the incorporated list caught up — a further run is a noop
    assert incremental_corpus_update(spark, corpus_dir, out)["mode"] == "noop"
    tf_full.unpersist()
