"""Streaming curation (streaming/curation.py): the declarative step
list over a live document stream — cross-batch dedup via the signature
store, exactly-once MERGE into the curated table, checkpoint resume."""

from __future__ import annotations

import json
import os

import pytest

from hermes_spark.config import ConfigError, load_config
from hermes_spark.streaming.curation import (
    curated_table,
    start_curation_stream,
)


def _feed(spark, src, rows):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("append").parquet(src)


BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def _cfg_text(tmp_work):
    return f"""
hermes-spark:
  curation:
    input: {tmp_work}/docs
    work_dir: {tmp_work}/cwork
    steps:
      - op: pii_scrub
      - op: quality_filter
        min_tokens: 3
      - op: near_dedup
        store: {tmp_work}/sigs
        threshold: 0.8
"""


def test_stream_curation_end_to_end_with_resume(spark, tmp_work):
    src = os.path.join(tmp_work, "docs")
    cfg = load_config(_cfg_text(tmp_work))

    # batch 1: a dup pair + a unique + a too-short doc
    _feed(spark, src, [
        (1, BASE),
        (2, BASE),
        (3, "independent first-run content with several tokens"),
        (4, "too short"),
    ])
    start_curation_stream(spark, cfg, run_once=True)
    t = curated_table(spark, cfg)
    got1 = {r.doc_id for r in t.read().select("doc_id").collect()}
    assert got1 == {1, 3}

    # batch 2 arrives AFTER the stream stopped; resume picks it up:
    # 10 = re-send of doc 1's text (cross-batch drop via the store),
    # 11 = fresh, 12 = email to scrub
    _feed(spark, src, [
        (10, BASE),
        (11, "second wave entirely new material for the corpus"),
        (12, "contact me at someone@example.com for more details"),
    ])
    start_curation_stream(spark, cfg, run_once=True)
    t = curated_table(spark, cfg)
    rows = {r.doc_id: r for r in t.read().collect()}
    assert set(rows) == {1, 3, 11, 12}
    # pii_scrub ran inside the stream: the email is redacted + counted
    assert "<EMAIL>" in rows[12].text and rows[12].n_email == 1

    # resume with NOTHING new: no state change, no new target version
    v = t.current_version()
    start_curation_stream(spark, cfg, run_once=True)
    t2 = curated_table(spark, cfg)
    assert t2.current_version() == v
    assert {r.doc_id for r in t2.read().select("doc_id").collect()} == \
        {1, 3, 11, 12}


def test_stream_curation_chunk_step_keys_target(spark, tmp_work):
    src = os.path.join(tmp_work, "docs")
    _feed(spark, src, [(1, "one two three four five six seven eight")])
    cfg = load_config(f"""
hermes-spark:
  curation:
    input: {src}
    work_dir: {tmp_work}/cw2
    steps:
      - op: chunk
        size: 4
        overlap: 0
""")
    start_curation_stream(spark, cfg, run_once=True)
    t = curated_table(spark, cfg)
    assert t.key == ["doc_id", "chunk_idx"]
    got = t.read().collect()
    assert len(got) == 2
    assert {r.chunk_idx for r in got} == {0, 1}


def test_stream_curation_requires_work_dir(spark, tmp_work):
    src = os.path.join(tmp_work, "docs")
    _feed(spark, src, [(1, BASE)])
    cfg = load_config(f"""
hermes-spark:
  curation:
    input: {src}
    steps:
      - op: exact_dedup
""")
    with pytest.raises(ConfigError) as e:
        start_curation_stream(spark, cfg, run_once=True)
    assert e.value.path.endswith("work_dir")


def test_cli_curate_stream_once(spark, tmp_work):
    from hermes_spark.__main__ import main

    src = os.path.join(tmp_work, "docs")
    _feed(spark, src, [(1, BASE), (2, BASE)])
    cfg_path = os.path.join(tmp_work, "stream.yml")
    with open(cfg_path, "w") as f:
        f.write(_cfg_text(tmp_work))

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["curate", cfg_path, "--stream", "--once"], spark=spark)
    assert rc == 0
    rep = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rep["rows_curated"] == 1 and rep["target_version"] >= 1


def test_stream_curation_rejects_pack_step(spark, tmp_work):
    src = os.path.join(tmp_work, "docs")
    _feed(spark, src, [(1, BASE)])
    cfg = load_config(f"""
hermes-spark:
  curation:
    input: {src}
    work_dir: {tmp_work}/cw3
    steps:
      - op: chunk
        size: 4
        overlap: 0
      - op: pack
        capacity: 8
""")
    with pytest.raises(ConfigError) as e:
        start_curation_stream(spark, cfg, run_once=True)
    assert "micro-batch" in e.value.message


def test_cli_curate_status(spark, tmp_work):
    from hermes_spark.__main__ import main

    src = os.path.join(tmp_work, "docs")
    _feed(spark, src, [(1, BASE), (2, "some other fresh document text")])
    cfg_path = os.path.join(tmp_work, "st.yml")
    with open(cfg_path, "w") as f:
        f.write(_cfg_text(tmp_work))

    import io
    from contextlib import redirect_stdout

    with redirect_stdout(io.StringIO()):
        main(["curate", cfg_path, "--stream", "--once"], spark=spark)
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["curate", cfg_path, "--status"], spark=spark)
    assert rc == 0
    rep = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rep["rows_curated"] == 2 and rep["commits"] == 1
    assert rep["target_version"] >= 1


def test_stream_curation_over_jsonl(spark, tmp_work):
    """Streaming curation over a json: source with a declared schema —
    no parquet probe, schema comes from the config."""
    import json as _json

    srcdir = os.path.join(tmp_work, "jdocs")
    os.makedirs(srcdir)
    with open(os.path.join(srcdir, "b1.jsonl"), "w") as f:
        for i, t in enumerate([BASE, BASE, "some fresh other words here"]):
            f.write(_json.dumps({"doc_id": i, "text": t}) + "\n")
    cfg = load_config(f"""
hermes-spark:
  curation:
    input: json:{srcdir}
    schema: "doc_id long, text string"
    work_dir: {tmp_work}/cwj
    steps:
      - op: near_dedup
        store: {tmp_work}/jsigs
""")
    start_curation_stream(spark, cfg, run_once=True)
    t = curated_table(spark, cfg)
    assert {r.doc_id for r in t.read().select("doc_id").collect()} == {0, 2}

    # json stream WITHOUT schema: is rejected with the config path
    cfg2 = load_config(f"""
hermes-spark:
  curation:
    input: json:{srcdir}
    work_dir: {tmp_work}/cwj2
    steps:
      - op: exact_dedup
""")
    with pytest.raises(ConfigError) as e:
        start_curation_stream(spark, cfg2, run_once=True)
    assert e.value.path.endswith("schema")
