"""CLI job entry points run in-process (argparse contract + wiring):
build with admission/content-store, query + statistics via search_cli,
streaming catch-up via stream_ingest --available-now."""

from __future__ import annotations

import json

import pytest

from posik_engine_spark import corpus
from posik_engine_spark.jobs import build_index as build_job
from posik_engine_spark.jobs import search_cli
from posik_engine_spark.jobs import stream_ingest


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    src = str(root / "docs")
    corpus.synthetic_docs(spark, 80, seed=19).write.parquet(src)
    ix = str(root / "ix")
    cs = str(root / "content")
    rc = build_job.main(
        [
            "--source", src, "--out", ix, "--n-shards", "4",
            "--admit", "--content-store", cs,
        ]
    )
    assert rc == 0
    return src, ix, cs


def test_build_job_report(built, capsys):
    src, ix, cs = built
    import os

    assert os.path.exists(os.path.join(ix, "meta.json"))
    assert os.path.exists(os.path.join(cs, "_content_store.json"))


def test_search_cli_query_and_statistics(built, capsys):
    _, ix, cs = built
    rc = search_cli.main(
        ["--index", ix, "--content-store", cs, "--query", "varint merge", "--limit", "5"]
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["result"] is True and 1 <= out["count"] <= 5
    assert out["hits"][0]["relevance"] == 1.0
    assert "<b>" in out["hits"][0]["snippet"]

    rc = search_cli.main(["--index", ix, "--content-store", cs, "--statistics"])
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and st["total"]["pages"] > 0 and st["total"]["isIndexing"] is False

    # stats-only invocation needs NO content source (code-review fix)
    rc = search_cli.main(["--index", ix, "--statistics"])
    st2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and st2["total"] == st["total"]

    # nothing-found surfaces as result=False + exit 1
    rc = search_cli.main(
        ["--index", ix, "--content-store", cs, "--query", "zzznotaword"]
    )
    err = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and err["result"] is False


def test_stream_ingest_available_now(spark, tmp_path, capsys):
    arrivals = str(tmp_path / "arr")
    corpus.synthetic_docs(spark, 30, seed=23).coalesce(1).write.parquet(arrivals)
    rc = stream_ingest.main(
        [
            "--source", arrivals, "--out", str(tmp_path / "six"),
            "--checkpoint", str(tmp_path / "ckpt"), "--n-shards", "4",
            "--available-now",
        ]
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["n_docs"] > 0
    assert out["counters"]["docs_tokenized"] == out["n_docs"]


def test_ann_index_cli_build_and_query(spark, tmp_path, capsys):
    """jobs/ann_index.py: build the persisted IVF index, then probe it —
    the query result equals IVFStore.topk directly (and therefore the
    one-shot ivf_topk by the store equivalence test)."""
    from posik_engine_spark.jobs import ann_index
    from posik_engine_spark.operators import similarity

    emb_path = str(tmp_path / "emb")
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").write.parquet(
        emb_path
    )
    out = str(tmp_path / "ivf")
    rc = ann_index.main(
        ["build", "--embeddings", emb_path, "--out", out,
         "--n-centroids", "8", "--iters", "0"]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_centroids"] == 8 and rep["n_vectors"] > 0

    rc = ann_index.main(
        ["query", "--index", out, "--vec-id", "0", "--embeddings", emb_path,
         "--k", "5", "--nprobe", "2"]
    )
    assert rc == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(got["hits"]) == 5 and len(got["probed_cids"]) == 2
    assert got["hits"][0]["vec_id"] == 0 and got["hits"][0]["cosine"] == 1.0

    store = similarity.IVFStore(spark, out)
    q0 = [float(x) for x in spark.read.parquet(emb_path)
          .filter("vec_id = 0").collect()[0]["embedding"]]
    expect = [
        {"vec_id": int(r["vec_id"]), "cosine": float(r["cosine"])}
        for r in store.topk(q0, k=5, nprobe=2).collect()
    ]
    assert got["hits"] == expect
