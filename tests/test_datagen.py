"""Transcript synthesizer: determinism, schema, grammar, skew shape."""

from __future__ import annotations

import re

from mannheimsearchjoinsengine_spark.datagen import generate_transcripts


def test_deterministic():
    a = generate_transcripts(600)
    b = generate_transcripts(600)
    assert a.equals(b)


def test_schema_and_grammar():
    t = generate_transcripts(600).to_pylist()
    assert {r["role"] for r in t} == {"user", "assistant", "tool"}
    assist = re.compile(r"^The ([a-z_]+) of (.+?) is (.+)\.$")
    for r in t:
        if r["role"] == "assistant":
            assert assist.match(r["text"]), r["text"]
            assert r["tool"] is None
        elif r["role"] == "tool":
            assert r["tool"] in ("search", "lookup", "calc")
            kvs = r["text"].split("; ")
            assert kvs[0].startswith("entity=")
            assert all("=" in kv for kv in kvs)
        else:
            assert r["text"].endswith((".", "?"))
    # turn_idx dense per conversation, ts strictly increasing globally
    by_conv = {}
    last_ts = None
    for r in t:
        by_conv.setdefault(r["conv_id"], []).append(r["turn_idx"])
        if last_ts is not None:
            assert r["ts"] > last_ts
        last_ts = r["ts"]
    for idxs in by_conv.values():
        assert idxs == list(range(len(idxs)))


def test_skew_long_conversation():
    t = generate_transcripts(2000).to_pylist()
    sizes = {}
    for r in t:
        sizes[r["conv_id"]] = sizes.get(r["conv_id"], 0) + 1
    assert max(sizes.values()) >= 60  # the designated hot conversation
