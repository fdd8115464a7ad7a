"""Adjacent-turn merging (block_merging.rs analog) vs a direct Python
reference implementation on real search results."""

from __future__ import annotations

import pytest

from probe_spark.fixtures import transcripts_df


@pytest.fixture(scope="module")
def merged_inputs(spark, tmp_index_root):
    from probe_spark.index.build import BuildConfig, IndexBuilder
    from probe_spark.search.engine import SearchEngine

    path = f"{tmp_index_root}/idx_merge"
    IndexBuilder(spark, BuildConfig(n_buckets=8)).build(
        transcripts_df(spark, 30, 5), path
    )
    eng = SearchEngine(spark, path)
    res = eng.search("error OR handling", k=40)
    return [r.asDict() for r in res.collect()]


def _python_merge(rows: list[dict], threshold: int) -> list[tuple]:
    by_conv: dict[str, list[dict]] = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)
    spans = []
    for conv, turns in by_conv.items():
        turns.sort(key=lambda r: r["turn_idx"])
        cur: list[dict] = []
        for r in turns:
            if cur and r["turn_idx"] - cur[-1]["turn_idx"] > threshold:
                spans.append((conv, cur))
                cur = []
            cur.append(r)
        if cur:
            spans.append((conv, cur))
    out = []
    for conv, members in spans:
        score = max(m["score"] for m in members)
        best = min(
            (m for m in members if m["score"] == score),
            key=lambda m: m["doc_id"],
        )
        out.append(
            (
                conv,
                members[0]["turn_idx"],
                members[-1]["turn_idx"],
                len(members),
                round(score, 9),
                best["doc_id"],
                "\n".join(m["text"] for m in members),
            )
        )
    out.sort(key=lambda t: (-t[4], t[5]))
    return out


@pytest.mark.parametrize("threshold", [1, 5])
def test_merge_matches_reference_impl(spark, merged_inputs, threshold):
    from probe_spark.search.merging import merge_adjacent_turns

    df = spark.createDataFrame(
        [
            (
                r["doc_id"], r["score"], r["conv_id"], r["turn_idx"],
                r["text"],
            )
            for r in merged_inputs
        ],
        "doc_id long, score double, conv_id string, turn_idx int, text string",
    )
    got = [
        (
            r["conv_id"], r["turn_lo"], r["turn_hi"], r["n_turns"],
            round(r["score"], 9), r["doc_id"], r["text"],
        )
        for r in merge_adjacent_turns(df, threshold).collect()
    ]
    want = _python_merge(merged_inputs, threshold)
    assert got == want


def test_merge_empty(spark):
    from probe_spark.search.merging import merge_adjacent_turns

    df = spark.createDataFrame(
        [], "doc_id long, score double, conv_id string, turn_idx int, text string"
    )
    assert merge_adjacent_turns(df).collect() == []


class TestFormatters:
    def test_all_formats_render(self):
        from probe_spark.search.output import FORMATTERS

        rows = [
            {
                "doc_id": 7, "score": 1.2345678, "conv_id": "c1",
                "turn_idx": 3, "role": "user", "tool": "bash",
                "matched_terms": ["error", "handl"],
                "text": "an <error> & a \"handler\"\nsecond line",
            },
            {"doc_id": 9, "score": 0.5, "conv_id": "c2", "turn_idx": 0,
             "text": None},
        ]
        plain = FORMATTERS["plain"](rows)
        assert "c1:3" in plain and "matched: error, handl" in plain
        md = FORMATTERS["markdown"](rows)
        assert md.startswith("## 1. c1:3") and "```" in md
        xml = FORMATTERS["xml"](rows)
        assert "<keyword>error</keyword>" in xml
        assert "<![CDATA[an <error>" in xml
        assert xml.count("<result>") == 2
        color = FORMATTERS["color"](rows)
        assert "\x1b[1m" in color and "c1:3" in color
        # matched keywords are highlighted inside the body, stem-substring
        # included ('handl' inside 'handler'), case-insensitive
        assert "\x1b[1m\x1b[36merror\x1b[0m" in color
        assert '\x1b[1m\x1b[36mhandl\x1b[0mer' in color
        # terminal is the reference's default File:/Lines:/fence layout
        # (golden-pinned in tests/test_output_golden.py)
        term = FORMATTERS["terminal"](rows)
        assert term.startswith("File: c1\nLines: 3-3\n```text")
        assert "Found 2 search results" in term

    def test_merged_span_location(self):
        from probe_spark.search.output import format_plain

        rows = [{"conv_id": "c9", "turn_lo": 2, "turn_hi": 5,
                 "score": 3.0, "doc_id": 1, "text": "t"}]
        assert "c9:2-5" in format_plain(rows)
