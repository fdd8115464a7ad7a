"""Golden-output snapshot tests for the result formatters
(search/output.py) against the reference's layouts:

  * terminal — search_output.rs:44-80,170-180; golden sample
    /root/reference/result1.txt (File:/Lines:/fence per result, then
    Found/Total bytes/Total tokens footer);
  * xml — search_output.rs:556-640 (probe_results root, per-result
    file/lines/node_type/matched_keywords/score/CDATA code, summary);
  * plain / markdown / color — the transcript analogs, snapshot-pinned
    so layout drift is visible in review.

Exact multi-line expected strings — not substring spot checks — so any
formatting change must update the snapshot deliberately.
"""

from __future__ import annotations

from probe_spark.search.output import FORMATTERS

ROWS = [
    {
        "doc_id": 7,
        "score": 1.2345678,
        "conv_id": "conv-a",
        "turn_idx": 3,
        "role": "user",
        "tool": "bash",
        "matched_terms": ["error", "handl"],
        "text": 'the <error> & "handler" path',
    },
    {
        "doc_id": 9,
        "score": 0.5,
        "conv_id": "conv-b",
        "turn_idx": 0,
        "text": None,
    },
]


class TestTerminalGolden:
    def test_layout_matches_reference_shape(self):
        # tokens under the regex stand-in:
        # the|<|error|>|&|"|handler|"|path -> the < error > & " handler " path
        # pieces: [the][<][error][>][&]["][handler]["][path] = 9
        expected = "\n".join(
            [
                "File: conv-a",
                "Lines: 3-3",
                "```text",
                'the <error> & "handler" path',
                "```",
                "File: conv-b",
                "Lines: 0-0",
                "```text",
                "",
                "```",
                "Found 2 search results",
                "Total bytes returned: 28",
                "Total tokens returned: 9",
            ]
        )
        assert FORMATTERS["terminal"](ROWS) == expected

    def test_merged_span_uses_turn_range(self):
        row = [{"conv_id": "c", "turn_lo": 2, "turn_hi": 5, "text": "x"}]
        out = FORMATTERS["terminal"](row)
        assert "Lines: 2-5" in out


class TestXmlGolden:
    def test_layout_matches_reference_shape(self):
        expected = "\n".join(
            [
                '<?xml version="1.0" encoding="UTF-8"?>',
                "<probe_results>",
                "  <result>",
                "    <file>conv-a</file>",
                "    <lines>3-3</lines>",
                "    <node_type>turn</node_type>",
                "    <matched_keywords>",
                "      <keyword>error</keyword>",
                "      <keyword>handl</keyword>",
                "    </matched_keywords>",
                "    <score>1.2346</score>",
                '    <code><![CDATA[the <error> & "handler" path]]></code>',
                "  </result>",
                "  <result>",
                "    <file>conv-b</file>",
                "    <lines>0-0</lines>",
                "    <node_type>turn</node_type>",
                "    <score>0.5000</score>",
                "    <code><![CDATA[]]></code>",
                "  </result>",
                "  <summary>",
                "    <count>2</count>",
                "    <total_bytes>28</total_bytes>",
                "    <total_tokens>9</total_tokens>",
                "  </summary>",
                "</probe_results>",
            ]
        )
        assert FORMATTERS["xml"](ROWS) == expected

    def test_cdata_close_sequence_split(self):
        out = FORMATTERS["xml"]([{"conv_id": "c", "turn_idx": 1,
                                  "text": "a]]>b"}])
        assert "<![CDATA[a]]]]><![CDATA[>b]]>" in out


class TestPlainGolden:
    def test_snapshot(self):
        expected = "\n".join(
            [
                "conv-a:3",
                "score: 1.2346",
                "matched: error, handl",
                'the <error> & "handler" path',
                "",
                "conv-b:0",
                "score: 0.5000",
            ]
        )
        assert FORMATTERS["plain"](ROWS) == expected


class TestMarkdownGolden:
    def test_snapshot(self):
        expected = "\n".join(
            [
                "## 1. conv-a:3 (score 1.2346)",
                "*matched:* `error`, `handl`",
                "```",
                'the <error> & "handler" path',
                "```",
                "",
                "## 2. conv-b:0 (score 0.5000)",
                "```",
                "",
                "```",
            ]
        )
        assert FORMATTERS["markdown"](ROWS) == expected


class TestColorGolden:
    def test_snapshot(self):
        B, D, C, R = "\x1b[1m", "\x1b[2m", "\x1b[36m", "\x1b[0m"
        expected = "\n".join(
            [
                f"{B}{C}conv-a:3{R} {D}score 1.2346{R}",
                f"{D}matched: error, handl{R}",
                f'the <{B}{C}error{R}> & "{B}{C}handl{R}er" path',
                "",
                f"{B}{C}conv-b:0{R} {D}score 0.5000{R}",
            ]
        )
        assert FORMATTERS["color"](ROWS) == expected
